package graft.ext

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** PageRank by power iteration — the second graph operator next to
  * [[Clustering]]'s connected components: importance scoring over a
  * derived relationship graph (site/link graphs drive crawl
  * prioritization and per-domain quality priors in a training-data
  * pipeline; the gate derives a customer↔part purchase graph from the
  * reference's TPC-H-shaped tables).
  *
  * Un-normalized formulation (rank mass ≈ N, each rank O(1)):
  *
  *   r⁰(v)   = 1
  *   rᵏ⁺¹(v) = teleport + damping · ( Σ_{u→v} rᵏ(u)/outdeg(u)
  *                                    + danglingShareᵏ )
  *
  * == Exact integer arithmetic (stronger than the q181 decimal rule) ==
  *
  * Ranks live in integer MICRO-UNITS (r = 1.0 ⇒ 1 000 000): the per-edge
  * split is half-up integer division `(2·r + deg) div (2·deg)`, the
  * contribution sum is a BIGINT sum, and the damped update is
  * `150000 + (85·m + 50) div 100` — every iteration is pure 64-bit
  * integer arithmetic, so the result is bit-identical across engines,
  * partitionings, and platforms BY CONSTRUCTION, with no rounding-
  * boundary cases at all (a first draft that damped in `double` and
  * re-rounded to 6 places tripped exactly that: 0.85 × a 6-dp value
  * terminates at the 8th decimal and lands ON the half-way boundary,
  * where Spark's BigDecimal HALF_UP and the oracle's float-multiply
  * rounding disagree by 1e-6). The only float op is the final display
  * cast micro-units → double. Overflow headroom: total mass ≈ N·10⁶
  * micro-units, times 85 ≈ 10²⁰ only past N ≈ 10¹¹ nodes — two orders
  * above the 10⁹-node graphs this targets; shard the scale factor before
  * then.
  *
  * == 100 TB design ==
  *
  * The plain (src, dst) edge table is the working set, materialized ONCE
  * (localCheckpoint; on a cluster: persist DISK_ONLY); out-degree rides
  * the N-row NODE table, where a per-node fact belongs. When the node
  * set fits `broadcastNodeLimit` (default 2·10⁷ ids — the kCore bound),
  * each iteration broadcasts the rank table into the src join and the
  * contribution table into the update join, so the edge table NEVER
  * crosses an exchange and the only shuffle is the (dst, BIGINT)
  * partial-aggregated contribution exchange; beyond the limit both joins
  * degrade to the shuffle form. An N-row lazy localCheckpoint truncates
  * lineage per iteration (the BpeTrainer/KMeans per-round discipline;
  * without it the plan doubles every iteration). Driver state is zero
  * rows — the one exception is the dangling-mass term, a 1-row integer
  * aggregate per iteration, read only when the graph actually has sinks
  * (the k-row-centroid bounded-read class). Skewed in-degree (a hub
  * page) concentrates one aggregation key; the partial aggregation
  * absorbs it map-side before the exchange.
  */
object PageRank {

  /** Rank every node of `edges` (directed (src, dst) pairs, pre-deduped
    * by the caller) over `iters` power iterations with damping 0.85 /
    * teleport 0.15 (micro-unit constants 85/100 and 150 000 — see the
    * arithmetic contract above). Output: (id, r) with r the rank in
    * units of 1.0 (micro-units ÷ 10⁶, the one display-only float op).
    *
    * Nodes appearing only as dst (sinks) are ranked; their outbound mass
    * redistributes uniformly when `handleDangling` (Brin/Page
    * dangling-node convention). */
  def run(edges: DataFrame, srcCol: String, dstCol: String, iters: Int,
      handleDangling: Boolean = true,
      broadcastNodeLimit: Long = 20000000L): DataFrame = {
    require(iters >= 1, "iters must be >= 1")

    // Materialize the caller's edge plan ONCE. Everything below (nodes,
    // outdeg, edgesW, dangling) re-reads `e`; without this checkpoint each
    // eager materialization re-executed the arbitrarily expensive upstream
    // (the gate graph's join+distinct build) — 4 full executions measured
    // at ~2 s each on the sf0.1 purchase graph (r18 GraphProbe: iters=1 ≈
    // iters=5 ≈ 9 s, all prefix). One execution, cached blocks after.
    val e = edges.select(col(srcCol).as("src"), col(dstCol).as("dst"))
      .localCheckpoint()
    // The out-degree rides the N-row NODE table, not an edge-table copy
    // (r18): the old (src, dst, outdeg) edge working set cost a second
    // edge-sized checkpoint job and 50% more cached bytes for a column
    // that is a per-NODE fact. Sinks are simply the outdeg-NULL rows —
    // the separate anti-join + checkpoint is gone too.
    val outdeg = e.groupBy("src").agg(count(lit(1)).as("outdeg"))
    val nodes = e.select(col("src").as("id"))
      .union(e.select(col("dst").as("id")))
      .distinct()
      .join(outdeg.withColumnRenamed("src", "id"), Seq("id"), "left")
      .localCheckpoint()
    val nNodes = nodes.count()
    val danglingNodes = nodes.where(col("outdeg").isNull).select("id")
    val hasDangling = handleDangling && danglingNodes.limit(1).count() > 0

    var ranks = nodes.withColumn("ri", lit(1000000L))
      .select("id", "outdeg", "ri").localCheckpoint()
    // Broadcast the N-row side of both per-iteration joins when the node
    // set is bounded (the kCore broadcastNodeLimit pattern, r18): the
    // checkpointed edge working set then never crosses an exchange at all
    // — measured 115 MB of per-query shuffle at sf0.1 was edgesW being
    // RE-EXCHANGED every iteration because AQE-coalesced checkpoint
    // partitioning does not satisfy the join's requirement. The exact
    // integer arithmetic is partitioning-independent, so the result is
    // unchanged by construction. Beyond the limit the joins degrade to
    // the shuffle form.
    val bcastRanks = nNodes <= broadcastNodeLimit
    def side(df: DataFrame) = if (bcastRanks) broadcast(df) else df
    // In the broadcast regime, store the edge blocks hash-partitioned by
    // dst (r19, the LabelProp move): the broadcast src-join preserves the
    // stored partitioning and the per-iteration contribution groupBy(dst)
    // then needs NO exchange at all — one edge-sized head exchange
    // replaces one (slim, partial-aggregated) exchange stage per
    // iteration. Exact integer arithmetic; partitioning cannot change it.
    val eW =
      if (bcastRanks) org.apache.spark.sql.graft.CheckpointOps
        .repartitionCheckpoint(e, "dst")
      else e
    for (_ <- 1 to iters) {
      val danglingShare: Long =
        if (!hasDangling) 0L
        else {
          // Exact integer sum; half-up share per node. 1-row bounded read.
          val row = danglingNodes.join(ranks, "id")
            .agg(coalesce(sum(col("ri")), lit(0L)).as("s")).collect()(0)
          val s = row.getLong(0)
          (2L * s + nNodes) / (2L * nNodes)
        }
      val contribs = eW
        .join(side(ranks.withColumnRenamed("id", "src")), "src")
        .select(col("dst"),
          expr("(2 * ri + outdeg) div (2 * outdeg)").as("c"))
        .groupBy("dst").agg(sum(col("c")).as("m"))
        .withColumnRenamed("dst", "id")
      // Lazy checkpoint: truncates lineage per iteration (the plan stays
      // two-joins deep) without paying an eager materialization JOB per
      // iteration — the terminal action materializes the chain once,
      // iteration k reading k−1's checkpointed blocks. With sinks present
      // the dangling aggregate forces materialization anyway (eager ≡ lazy
      // there).
      ranks = nodes.join(side(contribs), Seq("id"), "left")
        .select(col("id"), col("outdeg"),
          (lit(150000L) +
            expr(s"(85 * (coalesce(m, 0) + ${danglingShare}L) + 50) div 100"))
            .as("ri"))
        .localCheckpoint(eager = false)
    }
    ranks.select(col("id"),
      (col("ri").cast("double") / lit(1000000.0)).as("r"))
  }

  /** Personalized PageRank (PPR): teleport mass concentrated on a seed
    * set instead of spread uniformly — THE seed-expansion primitive of
    * graph-based data selection (rank pages/documents by random-walk
    * proximity to a trusted seed corpus, the quality-propagation move of
    * the crawl literature).
    *
    * Same exact micro-unit integer arithmetic as [[run]]; the per-node
    * teleport base is `(150000·N) div |S|` for seeds and 0 otherwise
    * (mass ≈ N as in the uniform case, so ranks stay O(1)-scaled), the
    * initial distribution IS the teleport vector, and dangling mass
    * returns to the SEEDS (the standard PPR convention — a walk that
    * falls off the graph restarts at a seed). `seeds` is a driver-side
    * list (bounded, broadcast into the plan); ids absent from the graph
    * are ignored after a `require` that at least one seed is present. */
  def personalized(edges: DataFrame, srcCol: String, dstCol: String,
      seeds: Seq[Long], iters: Int,
      handleDangling: Boolean = true,
      broadcastNodeLimit: Long = 20000000L): DataFrame = {
    require(iters >= 1, "iters must be >= 1")
    require(seeds.nonEmpty, "seed set must be non-empty")

    // One upstream execution; out-degree rides the node table (see run()).
    val e = edges.select(col(srcCol).as("src"), col(dstCol).as("dst"))
      .localCheckpoint()
    val outdeg = e.groupBy("src").agg(count(lit(1)).as("outdeg"))
    val nodes = e.select(col("src").as("id"))
      .union(e.select(col("dst").as("id")))
      .distinct()
      .withColumn("is_seed", col("id").isin(seeds: _*))
      .join(outdeg.withColumnRenamed("src", "id"), Seq("id"), "left")
      .localCheckpoint()
    val nNodes = nodes.count()
    val nSeeds = nodes.where(col("is_seed")).count()
    require(nSeeds > 0, "no seed id exists in the graph")
    val seedBase = (150000L * nNodes) / nSeeds

    val danglingNodes = nodes.where(col("outdeg").isNull).select("id")
    val hasDangling = handleDangling && danglingNodes.limit(1).count() > 0

    var ranks = nodes
      .withColumn("ri", when(col("is_seed"), lit(seedBase)).otherwise(lit(0L)))
      .select("id", "outdeg", "ri").localCheckpoint()
    // broadcast the bounded N-row join sides — see run()
    val bcastRanks = nNodes <= broadcastNodeLimit
    def side(df: DataFrame) = if (bcastRanks) broadcast(df) else df
    // dst-partitioned edge blocks: exchange-free contribution groupBy per
    // iteration in the broadcast regime — see run()
    val eW =
      if (bcastRanks) org.apache.spark.sql.graft.CheckpointOps
        .repartitionCheckpoint(e, "dst")
      else e
    for (_ <- 1 to iters) {
      val danglingShare: Long =
        if (!hasDangling) 0L
        else {
          val row = danglingNodes.join(ranks, "id")
            .agg(coalesce(sum(col("ri")), lit(0L)).as("s")).collect()(0)
          val s = row.getLong(0)
          (2L * s + nSeeds) / (2L * nSeeds) // restart at a seed
        }
      val contribs = eW
        .join(side(ranks.withColumnRenamed("id", "src")), "src")
        .select(col("dst"),
          expr("(2 * ri + outdeg) div (2 * outdeg)").as("c"))
        .groupBy("dst").agg(sum(col("c")).as("m"))
        .withColumnRenamed("dst", "id")
      ranks = nodes.join(side(contribs), Seq("id"), "left")
        .select(col("id"), col("outdeg"),
          (when(col("is_seed"), lit(seedBase)).otherwise(lit(0L)) +
            expr("(85 * (coalesce(m, 0) + " +
              s"CASE WHEN is_seed THEN ${danglingShare}L ELSE 0L END) + 50)" +
              " div 100"))
            .as("ri"))
        .localCheckpoint(eager = false)
    }
    ranks.select(col("id"),
      (col("ri").cast("double") / lit(1000000.0)).as("r"))
  }

  /** The gate graph: the bidirectional customer↔part purchase graph from
    * `orders` ⋈ `lineitem` (distinct (custkey, partkey) pairs, both
    * directions, node ids disambiguated as 2·custkey / 2·partkey+1).
    * Symmetric by construction, so it exercises the dangling-free path;
    * dangling semantics are spec-held on synthetic graphs. */
  def purchaseGraph(orders: DataFrame, lineitem: DataFrame): DataFrame = {
    // repartition-by-key + dropDuplicates ≡ distinct (same one exchange —
    // the aggregate's distribution requirement is already satisfied), but
    // the dedup hash aggregate runs AFTER the exchange on every core
    // instead of fusing into the scan task as a map-side partial
    // aggregate. On the gate's one-row-group inputs the scan stage is a
    // single task, so the pre-exchange partial agg serialized the whole
    // build; mostly-unique pairs make it near-useless anyway (r18).
    val cp = orders.join(lineitem,
        orders("o_orderkey") === lineitem("l_orderkey"))
      .select((col("o_custkey") * 2).as("src"),
        (col("l_partkey") * 2 + 1).as("dst"))
      .repartition(col("src"), col("dst"))
      .dropDuplicates()
    // The two directions cannot collide (even vs odd ids), so a plain
    // union-all suffices — no second distinct shuffle.
    cp.union(cp.select(col("dst").as("src"), col("src").as("dst")))
  }
}
