package graft.ext

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Graph analytics beyond ranking ([[PageRank]]) and components
  * ([[Clustering]]): exact triangle counting and BFS hop distances —
  * the structure/reachability primitives of relationship-graph analysis
  * (community density, influence radius, link-graph diagnostics for
  * crawl corpora).
  *
  * == Triangle counting at scale ==
  *
  * The naive wedge join is Σ deg(v)² — a single hub explodes it. The
  * classic fix (degree orientation): direct every undirected edge from
  * its lower-(degree, id) endpoint to the higher one. The resulting DAG
  * has out-degree O(√m) REGARDLESS of hub in-degree, each triangle
  * survives as exactly one wedge u→v, u→w whose closing edge v→w exists
  * in the SAME direction (both larger than u, and the closing edge's own
  * orientation selects the ordered pair) — so the count is three
  * equi-joins, no OR-condition join, no double counting, wedge volume
  * O(m^1.5) worst-case instead of Σdeg².
  *
  * == BFS ==
  *
  * Frontier expansion: each level is one equi-join of the current
  * frontier with the edge table + one anti-join against the visited set,
  * localCheckpoint per level (the [[PageRank]] lineage rule). Level
  * count bounds the work; the visited set carries (node, dist) only.
  */
object GraphAlgos {

  /** Degree-ordered orientation of an undirected edge list (distinct
    * pairs; self-loops dropped). Output: (src, dst) directed
    * low-(deg, id) → high-(deg, id). */
  def orient(edges: DataFrame, xCol: String, yCol: String): DataFrame = {
    // One upstream execution (the r18 graph-tier fix): `e` feeds both the
    // degree count and the two orientation joins below — without the
    // checkpoint the caller's edge plan (q204: the full co-occurrence
    // pair count, ~4.5 s at sf0.1) executed once per reference inside the
    // single orientation job.
    val e = edges.select(col(xCol).as("x"), col(yCol).as("y"))
      .where(col("x") =!= col("y"))
      .select(least(col("x"), col("y")).as("x"),
        greatest(col("x"), col("y")).as("y"))
      .distinct()
      .localCheckpoint()
    val deg = e.select(col("x").as("n")).unionAll(e.select(col("y").as("n")))
      .groupBy("n").agg(count(lit(1)).as("d"))
    e.join(deg.select(col("n").as("x"), col("d").as("dx")), "x")
      .join(deg.select(col("n").as("y"), col("d").as("dy")), "y")
      .select(
        when(struct(col("dx"), col("x")) < struct(col("dy"), col("y")),
          col("x")).otherwise(col("y")).as("src"),
        when(struct(col("dx"), col("x")) < struct(col("dy"), col("y")),
          col("y")).otherwise(col("x")).as("dst"))
  }

  /** Exact global triangle census of an undirected edge list. Output:
    * one row (n_triangles, n_edges, n_nodes). */
  def triangleCount(edges: DataFrame, xCol: String, yCol: String): DataFrame = {
    val dir = orient(edges, xCol, yCol).localCheckpoint()
    val w1 = dir.select(col("src").as("u"), col("dst").as("v"))
    val w2 = dir.select(col("src").as("u"), col("dst").as("w"))
    val wedges = w1.join(w2, Seq("u")).where(col("v") =!= col("w"))
    val tris = wedges.join(dir,
      dir("src") === col("v") && dir("dst") === col("w"))
    val nE = dir.count()
    val nN = dir.select(col("src").as("n")).unionAll(dir.select(col("dst").as("n")))
      .distinct().count()
    tris.agg(count(lit(1)).as("n_triangles"))
      .select(col("n_triangles"), lit(nE).as("n_edges"), lit(nN).as("n_nodes"))
  }

  /** BFS hop distances from `source` over an undirected edge list,
    * levels 0..maxDepth. Output: (node, dist) — exact integers, one row
    * per reached node. */
  def bfsDistances(edges: DataFrame, xCol: String, yCol: String,
      source: Long, maxDepth: Int, assumeSymmetric: Boolean = false,
      broadcastNodeLimit: Long = 20000000L): DataFrame = {
    require(maxDepth >= 0, "maxDepth must be >= 0")
    val spark = edges.sparkSession
    import spark.implicits._
    // Union-branch duplication of the caller's plan is absorbed by
    // exchange reuse inside the one symmetrization job (r18 measured: an
    // extra eager checkpoint of `fwd` here REGRESSED q205 3.2 → 4.0 s —
    // it adds a materialization job without removing real work).
    // `assumeSymmetric` (r18): a caller whose edge list already contains
    // both directions of every edge, dedup'd (the purchase graph — its
    // two directions cannot collide by id parity), skips the union +
    // distinct re-symmetrization, which re-doubled 1.1M rows only to
    // dedup them back. The result is identical BY THE CALLER'S CONTRACT;
    // reachability semantics do not change.
    val fwd = edges.select(col(xCol).as("src"), col(yCol).as("dst"))
    val e =
      if (assumeSymmetric) fwd.localCheckpoint()
      else fwd.unionAll(fwd.select(col("dst").as("src"), col("src").as("dst")))
        .distinct().localCheckpoint()

    var visited = Seq((source, 0)).toDF("node", "dist").localCheckpoint()
    var frontier = visited.select("node")
    // Broadcast the frontier and the visited set when the graph's node
    // set is bounded (the PageRank/kCore broadcastNodeLimit pattern,
    // r18): the checkpointed edge table then never crosses an exchange
    // per level — it was being re-exchanged at every level (~43 MB per
    // gate query). Both sides are ≤ N node-id rows; beyond the limit the
    // joins degrade to the shuffle form.
    val bcast = e.select(col("src")).distinct().count() <= broadcastNodeLimit
    def side(df: DataFrame) = if (bcast) broadcast(df) else df
    // The VISITED side grows per level (unlike PageRank/LabelProp's fixed
    // N-row side) — re-check the bound against its TRACKED row count each
    // level and degrade that side to the shuffle anti-join once it
    // outgrows the limit (ADVICE r18: near the limit each level would
    // otherwise collect-and-rebroadcast a growing multi-hundred-MB set).
    // The count comes from the per-level observed metric — no extra job.
    var visitedRows = 1L
    def visitedSide(df: DataFrame) =
      if (bcast && visitedRows <= broadcastNodeLimit) broadcast(df) else df
    var d = 0
    var frontierRows = 1L // level 0: the source row
    while (d < maxDepth && frontierRows > 0) {
      d += 1
      val obs = new org.apache.spark.sql.Observation()
      val next = side(frontier).join(e, frontier("node") === e("src"))
        .select(col("dst").as("node")).distinct()
        .join(visitedSide(visited.select("node")), Seq("node"), "left_anti")
        // the frontier-emptiness check rides the eager checkpoint's own
        // job as an observed metric (VERDICT r18 #9) — one job per level
        // where a separate limit(1).count() used to add a second
        .observe(obs, count(lit(1)).as("n"))
        .localCheckpoint()
      frontierRows = obs.getAsJava.get("n").asInstanceOf[Long]
      visitedRows += frontierRows
      visited = visited.unionAll(next.withColumn("dist", lit(d)))
        .localCheckpoint(eager = false)
      frontier = next
    }
    visited
  }

  /** k-core peeling (Seidman 1983): iteratively delete every node whose
    * degree in the SURVIVING subgraph is < k; what remains after
    * convergence is the k-core — the maximal subgraph of minimum degree
    * ≥ k, the density filter of link-graph curation (link farms and
    * template rings live in dense cores; leaf/tendril pages peel away).
    * Synchronous fixed-round variant (the [[LabelProp]] determinism
    * discipline): `rounds` peel sweeps, each removing ALL current
    * sub-k-degree nodes at once — a pure function of the edge set,
    * declared semantics = "the subgraph after R sweeps" (identical to
    * the true k-core once a sweep removes nothing; KCoreSpec pins the
    * fixpoint against an independent reference, the gate picks R past
    * the gate graph's convergence point).
    *
    * Scale shape — iterate the NODE set, never a shrinking edge copy:
    * the surviving subgraph is always e₀ ∩ (alive × alive), so the only
    * per-sweep state is the slim alive-id set; the symmetric edge table
    * checkpoints ONCE and each sweep filters it with two endpoint
    * semi-joins + one map-side-combined degree count. (A first draft
    * checkpointed the restricted edge table per sweep — six cached
    * ~edge-sized generations thrashed the 100×-scale run into memory-
    * manager contention; node-set iteration holds per-sweep state at
    * O(N).) When the alive set is bounded (`broadcastNodeLimit`,
    * default 2·10⁷ ids ≈ 160 MB) the semi-joins broadcast — map-only,
    * so the edge table is never shuffled at all, only the slim
    * partial-aggregated (node, count) stream; beyond the limit they
    * degrade to shuffle semi-joins. Output: (id, degree) of surviving
    * nodes with their final in-core degree. */
  def kCore(edges: DataFrame, xCol: String, yCol: String, k: Int,
      rounds: Int, broadcastNodeLimit: Long = 20000000L): DataFrame = {
    require(k >= 1 && rounds >= 1, "k and rounds must be >= 1")
    val fwd = edges.select(col(xCol).as("x"), col(yCol).as("y"))
      .where(col("x") =!= col("y"))
      .select(least(col("x"), col("y")).as("x"),
        greatest(col("x"), col("y")).as("y"))
      .distinct()
    // symmetric edge table: degree = out-degree over both directions;
    // checkpointed once, filtered per sweep, never re-cached (the union
    // branches share fwd's distinct exchange — reuse absorbs the apparent
    // double execution; an extra fwd checkpoint measured slower, r18)
    val e = fwd.unionAll(fwd.select(col("y").as("x"), col("x").as("y")))
      .localCheckpoint()
    var alive = e.select(col("x").as("id")).distinct().localCheckpoint()
    val bcast = alive.count() <= broadcastNodeLimit
    def side(name: String) = {
      val a = alive.withColumnRenamed("id", name)
      if (bcast) broadcast(a) else a
    }
    // x-partitioned edge blocks in the broadcast regime (r19, the
    // LabelProp move): the broadcast semi-joins preserve the stored
    // partitioning, so the per-sweep degree groupBy(x) runs exchange-free
    // — one edge-sized head exchange replaces one slim exchange stage per
    // sweep. Integer counts; partitioning cannot change them.
    val eW =
      if (bcast) org.apache.spark.sql.graft.CheckpointOps
        .repartitionCheckpoint(e, "x")
      else e
    def survivingDegrees = eW
      .join(side("x"), Seq("x"), "left_semi")
      .join(side("y"), Seq("y"), "left_semi")
      .groupBy(col("x").as("id")).agg(count(lit(1)).as("deg"))
    for (_ <- 1 to rounds) {
      alive = survivingDegrees.where(col("deg") >= k).select("id")
        .localCheckpoint(eager = false)
    }
    survivingDegrees.withColumnRenamed("deg", "degree")
  }
}
