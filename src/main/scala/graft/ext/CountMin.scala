package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Count–min sketch (Cormode & Muthukrishnan 2005) — approximate
  * frequencies for EVERY item in d·w counters, complementing A21's
  * Misra–Gries ([[HeavyHitters]]), which is exact but only answers "the
  * frequent set": CMS answers point queries for any key, merges
  * cell-wise across streams/partitions/days (the property that matters
  * for a 100 TB corpus counted shard by shard), and its error is
  * one-sided — estimates never undercount, and overshoot is bounded by
  * εN with ε = e/w at confidence 1 − e^−d.
  *
  * Hash family: the repo's portable draw ([[Splits.md5Prefix]]
  * discipline) salted by the row index — bucket_r(x) = md5("r|x")[0,8)
  * as int64 mod w — so the DuckDB oracle recomputes the identical cells
  * and the gate compares EXACT sketch contents, not just the contract.
  *
  * Scale shape: [[sketch]] first collapses the stream to (distinct key,
  * count) through a map-side-combined exchange — on a Zipf token stream
  * the duplication factor is the win: the d salted-md5 hashes are paid
  * per DISTINCT key (vocabulary-bound, sublinear in corpus size), not
  * per occurrence (round 7 shipped the per-occurrence form; its honest
  * e₁ ≈ 1.0 at sf1 was exactly this term). The d-fold explode then
  * carries the count as a weight and collapses through one ≤ d·w-row
  * exchange; cell values are identical to the per-occurrence parse
  * (Σ counts per cell — the oracle recomputes the same cells verbatim).
  * Sketch state is d·w rows at ANY stream size. [[estimate]] hashes
  * only the query keys and broadcasts the d·w-row sketch onto them.
  */
object CountMin {

  /** bucket_r(key): md5 salted with the row index, mod width. */
  private def bucket(row: Column, key: Column, width: Int): Column =
    conv(substring(md5(concat(row.cast("string"), lit("|"),
      key.cast("string"))), 1, 8), 16, 10).cast("long") % width

  /** Build the sketch: (row_id, bucket, cnt), ≤ d·w rows. */
  def sketch(items: DataFrame, keyCol: String, depth: Int = 4,
      width: Int = 1024): DataFrame = {
    require(depth >= 1 && width >= 1, "depth and width must be positive")
    items
      .groupBy(col(keyCol).cast("string").as("__k"))
      .agg(count(lit(1)).as("__c"))
      .select(col("__k"), col("__c"),
        explode(sequence(lit(0), lit(depth - 1))).as("row_id"))
      .select(col("row_id"),
        bucket(col("row_id"), col("__k"), width).as("bucket"), col("__c"))
      .groupBy("row_id", "bucket").agg(sum(col("__c")).as("cnt"))
  }

  /** Point estimates for `queries(keyCol)`: min over the key's d cells,
    * absent cells counting 0. Never undercounts. */
  def estimate(sk: DataFrame, queries: DataFrame, keyCol: String,
      depth: Int = 4, width: Int = 1024): DataFrame = {
    val cells = queries
      .select(col(keyCol), col(keyCol).cast("string").as("__k"))
      .select(col(keyCol), explode(sequence(lit(0), lit(depth - 1))).as("row_id"),
        col("__k"))
      .select(col(keyCol), col("row_id"),
        bucket(col("row_id"), col("__k"), width).as("bucket"))
    cells
      .join(broadcast(sk), Seq("row_id", "bucket"), "left")
      .groupBy(col(keyCol))
      .agg(min(coalesce(col("cnt"), lit(0L))).as("est_cnt"))
  }

  /** Cell-wise sum — sketches of disjoint streams merge exactly. */
  def merge(a: DataFrame, b: DataFrame): DataFrame =
    a.unionAll(b).groupBy("row_id", "bucket").agg(sum(col("cnt")).as("cnt"))
}
