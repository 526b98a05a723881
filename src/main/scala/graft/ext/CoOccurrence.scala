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
    // repartition-by-key + dropDuplicates ≡ distinct with the same single
    // exchange, but the dedup aggregate runs post-exchange on every core
    // instead of fusing into the (single-task, one-row-group) scan stage
    // as a near-useless partial agg over mostly-unique pairs (r18, the
    // purchaseGraph note).
    val m = membership
      .select(col(basketCol).as("__b"), col(itemCol).as("__i"))
      .where(col("__b").isNotNull && col("__i").isNotNull)
      .repartition(col("__b"), col("__i"))
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
