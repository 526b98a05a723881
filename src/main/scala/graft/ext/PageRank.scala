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
  * The edge table is the working set: joined with out-degrees ONCE and
  * localCheckpoint'd (on a cluster: persist DISK_ONLY), it never
  * re-shuffles. Each iteration is exactly two slim exchanges — the N-row
  * rank table hashing to the edge partitioning for the src join, and the
  * (dst, BIGINT) partial-aggregated contribution shuffle — plus an N-row
  * localCheckpoint that truncates the lineage (the BpeTrainer/KMeans
  * per-round discipline; without it the plan doubles every iteration).
  * Driver state is zero rows — the one exception is the dangling-mass
  * term, a 1-row integer aggregate per iteration, read only when the
  * graph actually has sinks (the k-row-centroid bounded-read class).
  * Skewed in-degree (a hub page) concentrates one aggregation key; the
  * partial aggregation absorbs it map-side before the exchange.
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
      handleDangling: Boolean = true): DataFrame = {
    require(iters >= 1, "iters must be >= 1")

    // Materialize the caller's edge plan ONCE. Everything below (nodes,
    // outdeg, edgesW, dangling) re-reads `e`; without this checkpoint each
    // eager materialization re-executed the arbitrarily expensive upstream
    // (the gate graph's join+distinct build) — 4 full executions measured
    // at ~2 s each on the sf0.1 purchase graph (r18 GraphProbe: iters=1 ≈
    // iters=5 ≈ 9 s, all prefix). One execution, cached blocks after.
    val e = edges.select(col(srcCol).as("src"), col(dstCol).as("dst"))
      .localCheckpoint()
    val nodes = e.select(col("src").as("id"))
      .union(e.select(col("dst").as("id")))
      .distinct()
      .localCheckpoint()
    val nNodes = nodes.count()

    val outdeg = e.groupBy("src").agg(count(lit(1)).as("outdeg"))
    // Edge working set, built once: (src, dst, outdeg).
    val edgesW = e.join(outdeg, "src").localCheckpoint()

    // Sinks: nodes with no out-edges. Resolved once; the per-iteration
    // dangling read only happens when they exist (zero on the gate graph,
    // whose union-of-both-directions construction has none).
    val danglingNodes = nodes.join(
      outdeg.select(col("src").as("id")), Seq("id"), "left_anti")
      .localCheckpoint()
    val hasDangling = handleDangling && danglingNodes.limit(1).count() > 0

    var ranks = nodes.withColumn("ri", lit(1000000L)).localCheckpoint()
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
      val contribs = edgesW
        .join(ranks.withColumnRenamed("id", "src"), "src")
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
      ranks = nodes.join(contribs, Seq("id"), "left")
        .select(col("id"),
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
      handleDangling: Boolean = true): DataFrame = {
    require(iters >= 1, "iters must be >= 1")
    require(seeds.nonEmpty, "seed set must be non-empty")

    // One upstream execution (see run()).
    val e = edges.select(col(srcCol).as("src"), col(dstCol).as("dst"))
      .localCheckpoint()
    val nodes = e.select(col("src").as("id"))
      .union(e.select(col("dst").as("id")))
      .distinct()
      .withColumn("is_seed", col("id").isin(seeds: _*))
      .localCheckpoint()
    val nNodes = nodes.count()
    val nSeeds = nodes.where(col("is_seed")).count()
    require(nSeeds > 0, "no seed id exists in the graph")
    val seedBase = (150000L * nNodes) / nSeeds

    val outdeg = e.groupBy("src").agg(count(lit(1)).as("outdeg"))
    val edgesW = e.join(outdeg, "src").localCheckpoint()
    val danglingNodes = nodes.select("id").join(
      outdeg.select(col("src").as("id")), Seq("id"), "left_anti")
      .localCheckpoint()
    val hasDangling = handleDangling && danglingNodes.limit(1).count() > 0

    var ranks = nodes
      .withColumn("ri", when(col("is_seed"), lit(seedBase)).otherwise(lit(0L)))
      .select("id", "ri").localCheckpoint()
    for (_ <- 1 to iters) {
      val danglingShare: Long =
        if (!hasDangling) 0L
        else {
          val row = danglingNodes.join(ranks, "id")
            .agg(coalesce(sum(col("ri")), lit(0L)).as("s")).collect()(0)
          val s = row.getLong(0)
          (2L * s + nSeeds) / (2L * nSeeds) // restart at a seed
        }
      val contribs = edgesW
        .join(ranks.withColumnRenamed("id", "src"), "src")
        .select(col("dst"),
          expr("(2 * ri + outdeg) div (2 * outdeg)").as("c"))
        .groupBy("dst").agg(sum(col("c")).as("m"))
        .withColumnRenamed("dst", "id")
      ranks = nodes.join(contribs, Seq("id"), "left")
        .select(col("id"),
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
    val cp = orders.join(lineitem,
        orders("o_orderkey") === lineitem("l_orderkey"))
      .select((col("o_custkey") * 2).as("src"),
        (col("l_partkey") * 2 + 1).as("dst"))
      .distinct()
    // The two directions cannot collide (even vs odd ids), so a plain
    // union-all suffices — no second distinct shuffle.
    cp.union(cp.select(col("dst").as("src"), col("src").as("dst")))
  }
}
