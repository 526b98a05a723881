package graft.ext

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Time-series regularization: gap-fill a per-key daily series onto a dense
  * date spine and impute missing days — the resample/interpolate step every
  * activity-metric or training-curriculum pipeline needs before windowed
  * features (a lag over a gappy series silently reads the wrong day).
  *
  * Plan shape: the spine comes from ONE small per-key (min,max) aggregate
  * exploded through `sequence` — O(keys) agg rows, never a driver loop or a
  * cross join against a global calendar; the join back to observations is a
  * plain equi-join on (key, day); forward-fill is one in-partition
  * `last(ignoreNulls)` running window per key. Two key shuffles total, both
  * reusable by downstream per-key windows.
  */
object TimeSeries {

  /** Dense (key, day) spine covering each key's [min(day), max(day)]. */
  def dailySpine(df: DataFrame, keyCol: String, dayCol: String): DataFrame =
    df.groupBy(col(keyCol))
      .agg(min(col(dayCol)).as("__d0"), max(col(dayCol)).as("__d1"))
      .select(col(keyCol),
        explode(sequence(col("__d0"), col("__d1"), expr("INTERVAL 1 DAY")))
          .as(dayCol))

  /** Gap-fill `valueCol` of a per-(key, day) series onto the dense spine:
    * missing days materialize with the last seen value carried forward
    * (zero before the first observation — a key's leading edge has nothing
    * to carry). Input must be unique per (key, day); output is dense. */
  def gapFillDaily(df: DataFrame, keyCol: String, dayCol: String,
      valueCol: String): DataFrame = {
    val w = Window.partitionBy(col(keyCol)).orderBy(col(dayCol))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    dailySpine(df, keyCol, dayCol)
      .join(df.select(col(keyCol), col(dayCol), col(valueCol)),
        Seq(keyCol, dayCol), "left")
      .select(col(keyCol), col(dayCol),
        coalesce(last(col(valueCol), ignoreNulls = true).over(w), lit(0.0))
          .as(valueCol))
  }
}
