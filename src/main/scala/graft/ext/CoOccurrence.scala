package graft.ext

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Item–item co-occurrence mining over (basket, item) membership — the
  * support-counting primitive behind co-purchase recommendations,
  * PMI-style association scoring, and "documents citing the same
  * entities" analyses.
  *
  * == 100 TB design ==
  *
  * The naive within-basket self-join is quadratic in basket size: one
  * pathological basket of 10⁵ items mints 5·10⁹ pairs and dominates the
  * whole job (the promiscuous-key problem — same failure mode as an
  * unblocked ER join). `maxBasketSize` makes that explicit: basket sizes
  * are resolved with one partial-aggregated count, and baskets over the
  * cap are DROPPED before the pair join (the standard practice — a
  * basket containing everything carries no association signal; its
  * within-basket pairs are ~independent). With the cap, pair volume is
  * ≤ Σ min(|b|, cap)² /2 — linear in baskets — and the pair aggregation
  * is a map-side-combined count keyed by the pair. Everything else is
  * equi-joins on the basket key.
  */
object CoOccurrence {

  /** Distinct co-occurring item pairs with their support (number of
    * baskets containing both), from a (basket, item) membership table.
    * Pairs are canonical (`item_a < item_b`); baskets larger than
    * `maxBasketSize` distinct items are dropped (see above). Output:
    * (item_a, item_b, support). */
  def pairCounts(membership: DataFrame, basketCol: String, itemCol: String,
      maxBasketSize: Int): DataFrame = {
    require(maxBasketSize >= 2, "maxBasketSize must be >= 2")
    // ONE explicit-width exchange feeds the whole basket plane (r19).
    // Hash by BASKET at the session parallelism with an explicit count —
    // REPARTITION_BY_NUM, so AQE cannot coalesce it: the downstream
    // per-basket pair generation EXPANDS ~16× (1.4M memberships → 10.4M
    // pairs at sf0.1), and AQE — which sizes stages by their INPUT bytes,
    // blind to the fan-out — had coalesced that generation stage to 8
    // tasks, the dominant serial span of q200/q204 (22 s of task time on
    // a quarter of the cores). HashPartitioning(__b) then satisfies
    // EVERY downstream step at once: the (b, i) dedup, the basket-size
    // count, the size-cap join, and the pair self-join all run with NO
    // further exchange (subset-clustering; the r18 dedup note still
    // holds — the dedup agg runs post-exchange on every core). The only
    // other exchange left is the unavoidable pair-count aggregation.
    val w = math.max(2, membership.sparkSession.sparkContext.defaultParallelism / 2)
    val m = membership
      .select(col(basketCol).as("__b"), col(itemCol).as("__i"))
      .where(col("__b").isNotNull && col("__i").isNotNull)
      .repartition(w, col("__b"))
      .dropDuplicates()
    val sized = m.groupBy("__b").agg(count(lit(1)).as("__sz"))
      .where(col("__sz") <= maxBasketSize)
      .select("__b")
    val capped = m.join(sized, "__b")
    val a = capped.select(col("__b"), col("__i").as("item_a"))
    val b = capped.select(col("__b"), col("__i").as("item_b"))
    a.join(b, Seq("__b")).where(col("item_a") < col("item_b"))
      .groupBy("item_a", "item_b").agg(count(lit(1)).as("support"))
  }

  /** Top-`topK` pairs by (support desc, item_a, item_b) — a TakeOrdered,
    * never a global sort. */
  def topPairs(membership: DataFrame, basketCol: String, itemCol: String,
      maxBasketSize: Int, topK: Int): DataFrame =
    pairCounts(membership, basketCol, itemCol, maxBasketSize)
      .orderBy(col("support").desc, col("item_a"), col("item_b"))
      .limit(topK)
}
