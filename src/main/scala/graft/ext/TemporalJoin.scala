package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Temporal join operators the built-in join strategies don't express
  * directly: as-of (point-in-time) join, tolerance/proximity range join,
  * and bounded-interval event pairing.
  *
  * All three are composed from equi-shuffles + in-partition sorts — never a
  * broadcast-nested-loop or cartesian — so each survives a 100× scale-up:
  *
  *   - [[asOfJoin]]: union both inputs, ONE hash shuffle on the key, one
  *     in-partition sort by (time, side), then a running `last(non-null)`
  *     carry-forward window. This is the merge-join formulation of as-of —
  *     O(n log n) per key group, zero row amplification, vs. the naive
  *     per-left-row range scan which is O(n·m) per key.
  *   - [[proximityCount]]: time is bucketed to the tolerance width, each
  *     probe row expands to 3 bucket keys (b-1, b, b+1), and the join is a
  *     plain equi-join on the bucket — candidate pairs are only ever drawn
  *     from adjacent buckets (≤3× row expansion), then the exact predicate
  *     filters. The standard banded range-join lowering.
  *   - [[intervalPairs]]: an equi-join on the entity key with the interval
  *     bound as a residual predicate — per-key groups are small, the range
  *     never leaves the hash-join's residual filter.
  */
object TemporalJoin {

  /** Point-in-time (as-of) join: for each `left` row, the single most
    * recent `right` row with the same key and `rightTime <= leftTime`.
    *
    * Semantics: backward as-of with inclusive match (a right row at exactly
    * the left row's time matches); among right rows sharing the latest
    * time, the one with the greatest `rightTieBreak` wins — fully
    * deterministic (DuckDB twin: `LEFT JOIN LATERAL ... ORDER BY time DESC,
    * tiebreak DESC LIMIT 1`).
    *
    * Output: all `left` columns + all `right` columns (null when no match).
    * `left` and `right` column sets must be disjoint. Right columns are
    * carried through ONE struct, so the matched row is atomic — per-column
    * carry-forward could mix columns from different right rows if the right
    * payload itself contained nulls.
    */
  def asOfJoin(left: DataFrame, right: DataFrame,
      leftKey: String, rightKey: String,
      leftTime: String, rightTime: String,
      rightTieBreak: String): DataFrame = {
    val lCols = left.columns.toSeq
    val rCols = right.columns.toSeq
    require(lCols.intersect(rCols).isEmpty,
      s"left/right column names must be disjoint, both have: ${lCols.intersect(rCols)}")

    // the tie-break keeps ITS OWN type (casting to long would null out a
    // string id and silently lose the deterministic max-tiebreak pick);
    // the left side's null twin just matches that type for the union
    val tbType = right.schema(rightTieBreak).dataType
    val l2 = left
      .withColumn("__k", col(leftKey))
      .withColumn("__t", col(leftTime))
      .withColumn("__side", lit(1))
      .withColumn("__tb", lit(null).cast(tbType))
    val r2 = right
      .select(col(rightKey).as("__k"), col(rightTime).as("__t"),
        lit(0).as("__side"), col(rightTieBreak).as("__tb"),
        struct(rCols.map(col): _*).as("__r"))

    val unioned = l2.unionByName(r2, allowMissingColumns = true)
    // Frame = everything up to this row in (time, side, tiebreak) order.
    // side 0 (right) sorts before side 1 (left) at equal times, so an
    // exactly-simultaneous right row is visible to the left row (<= match);
    // ascending tiebreak makes `last` pick the max-tiebreak right row.
    val w = Window.partitionBy(col("__k"))
      .orderBy(col("__t"), col("__side"), col("__tb"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val carried = unioned.withColumn("__match", last(col("__r"), ignoreNulls = true).over(w))
    carried.filter(col("__side") === 1)
      .select(lCols.map(col) ++ rCols.map(c => col(s"__match.$c").as(c)): _*)
  }

  /** Per-row count of OTHER rows within ±`toleranceSec` of its timestamp —
    * the tolerance-band range join, banded to an equi-join (doc above).
    * Output: (idCol, n_near) for every input row, zero-count rows kept. */
  def proximityCount(df: DataFrame, idCol: String, tsCol: String,
      toleranceSec: Long): DataFrame = {
    val tolUs = toleranceSec * 1000000L
    val base = df.select(col(idCol), unix_micros(col(tsCol)).as("__us"))
      .withColumn("__b", floor(col("__us") / tolUs))
    val probes = base.select(col(idCol).as("__pid"), col("__us").as("__pus"),
        explode(array(col("__b") - 1, col("__b"), col("__b") + 1)).as("__b"))
    val matches = probes.join(base, "__b")
      .where(abs(col("__pus") - col("__us")) <= tolUs && col(idCol) =!= col("__pid"))
      .groupBy(col("__pid")).agg(count(lit(1)).as("n_near"))
    base.select(col(idCol))
      .join(matches.withColumnRenamed("__pid", idCol), Seq(idCol), "left")
      .select(col(idCol), coalesce(col("n_near"), lit(0L)).as("n_near"))
  }

  /** Event pairing within a bounded forward window: for each `fromType` row,
    * every `toType` row of the SAME key with `ts` in
    * (fromTs, fromTs + windowSec] — strict ">" on the left edge so an
    * exactly-simultaneous pair isn't a self-causal artifact.
    * Output: (key, from_id, to_id, gap_us). The batch twin of the
    * stream-stream interval join ([[graft.streaming.StreamJoin]]). */
  def intervalPairs(df: DataFrame, keyCol: String, tsCol: String, idCol: String,
      typeCol: String, fromType: String, toType: String, windowSec: Long): DataFrame = {
    val winUs = windowSec * 1000000L
    val from = df.filter(col(typeCol) === fromType)
      .select(col(keyCol).as("key"), col(idCol).as("from_id"),
        unix_micros(col(tsCol)).as("__fus"))
    val to = df.filter(col(typeCol) === toType)
      .select(col(keyCol).as("key"), col(idCol).as("to_id"),
        unix_micros(col(tsCol)).as("__tus"))
    from.join(to, Seq("key"))
      .where(col("__tus") > col("__fus") && col("__tus") - col("__fus") <= winUs)
      .select(col("key"), col("from_id"), col("to_id"),
        (col("__tus") - col("__fus")).as("gap_us"))
  }
}
