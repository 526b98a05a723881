package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Distributed per-group running totals — the primitive under sequence
  * packing ([[Pack.chunkAssign]]) and budget cuts ([[Splits.budgetSample]]).
  *
  * A plain `sum().over(Window.partitionBy(group).orderBy(order))` puts an
  * entire group in ONE task — fine when groups are plentiful, a
  * single-task sort of the biggest stratum when they are few and fat
  * (5 languages over a 100 TB corpus). `shards > 0` switches to the
  * classic two-level scan:
  *
  *   1. range-repartition rows by (group, order) into `shards` parts, so
  *      each part holds a contiguous slice of every group's order;
  *   2. per-(group, shard) totals — a tiny aggregate (groups × shards
  *      rows) partial-agg'd map-side;
  *   3. exclusive prefix over the tiny per-shard totals (a window over
  *      shards-per-group rows) → each shard's group offset, broadcast
  *      back;
  *   4. within-(group, shard) window cumsum + offset.
  *
  * Every stage is bounded by shard size, never group size; parallelism is
  * `shards`, not #groups. Output values are IDENTICAL to the plain window
  * (prefix sums don't depend on where the cuts land), which is what
  * [[PackSpec]] asserts and q69/q73's DuckDB oracles re-check end-to-end.
  */
object PrefixSum {

  /** Adds `out` = exclusive running total of `sizeCol` (sum of strictly
    * preceding rows) within each `groupCol` group, ordered by `orderCols`
    * (must be a unique order per group). `shards = 0` = plain window.
    *
    * `assertUniqueOrder = true` ENFORCES the unique-order precondition
    * inside the returned plan: the same window pass additionally computes
    * `rank()` and `row_number()`, which diverge exactly on order ties —
    * independent of the size values (a ROWS-vs-RANGE running-total
    * comparison misses ties among zero-size rows and spuriously fails on
    * NULL sizes) — and an `assert_true` filter fails the job loudly on
    * the first tied row. Zero extra shuffles — every window expression
    * evaluates in the one WindowExec (same partition/order spec) — and
    * the plan stays lazy: no job runs at construction time. */
  def exclusive(df: DataFrame, groupCol: String, orderCols: Seq[String],
      sizeCol: String, out: String, shards: Int = 0,
      assertUniqueOrder: Boolean = false): DataFrame = {
    val order: Seq[Column] = orderCols.map(col)
    val size = col(sizeCol).cast("long")
    val tieMsg = lit("PrefixSum.exclusive requires a unique (" +
      orderCols.mkString(", ") + ") order per group: tied rows detected " +
      "(duplicate ids?)")
    // the assert filter references window outputs so it cannot be pushed
    // below the WindowExec, and assert_true's null result keeps every row
    // when the precondition holds
    def guarded(d: DataFrame,
        w: org.apache.spark.sql.expressions.WindowSpec): DataFrame =
      if (!assertUniqueOrder) d
      else d.withColumn("__rkchk", rank().over(w))
        .withColumn("__rnchk", row_number().over(w))
        .where(assert_true(col("__rkchk") === col("__rnchk"), tieMsg).isNull)
        .drop("__rkchk", "__rnchk")
    if (shards <= 0) {
      val w = Window.partitionBy(col(groupCol)).orderBy(order: _*)
      guarded(df.withColumn(out, sum(size).over(w) - size), w)
    } else {
      // localCheckpoint is load-bearing, not an optimization: `keyed`
      // feeds BOTH the offsets aggregate and the final join, and
      // `repartitionByRange` picks its boundaries by reservoir SAMPLING
      // seeded per evaluation. If AQE compiles the two consumers as
      // separate stages without exchange reuse (column pruning gives the
      // two exchanges different outputs, defeating canonical-plan
      // matching), the branches see DIFFERENT shard assignments and the
      // joined offsets are wrong — ranks can exceed n (caught at sf0.1
      // by q181's tercile bound). Materializing the assignment once
      // makes both reads see the same partitioning; at scale this is the
      // same work the second pass would have spent recomputing the
      // upstream pipeline (callers pass slim projections; a cluster
      // deployment would use a reliable checkpoint dir instead of
      // executor-local blocks).
      val keyed = df
        .repartitionByRange(shards, col(groupCol) +: order: _*)
        .withColumn("__shard", spark_partition_id())
        .localCheckpoint()
      val wOff = Window.partitionBy(col(groupCol)).orderBy(col("__shard"))
      val offsets = keyed.groupBy(col(groupCol), col("__shard"))
        .agg(sum(size).as("__ssum"))
        .withColumn("__off", sum(col("__ssum")).over(wOff) - col("__ssum"))
        .select(col(groupCol), col("__shard"), col("__off"))
      val wIn = Window.partitionBy(col(groupCol), col("__shard")).orderBy(order: _*)
      // ties always co-shard (range partitioning assigns equal keys to one
      // partition), so the per-shard rank/row_number comparison sees every tie
      guarded(keyed.join(broadcast(offsets), Seq(groupCol, "__shard"))
          .withColumn(out, col("__off") + sum(size).over(wIn) - size), wIn)
        .drop("__shard", "__off")
    }
  }
}
