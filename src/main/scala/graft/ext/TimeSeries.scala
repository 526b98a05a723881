package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
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

  /** floor(x / 2^k) as an arithmetic right shift — exact pure-Int64 floor
    * division for either sign of x across the FULL long range (the earlier
    * (x − pmod(x,d))/d form went through a double and was only exact below
    * 2^52). The portable floor-div both engines agree on — truncating
    * `div` disagrees on negatives; >> floors by construction. The Holt
    * divisors are 2 and 4, so the power-of-two restriction costs nothing. */
  private def fdiv(x: Column, d: Long): Column = {
    require(d > 0 && (d & (d - 1)) == 0,
      s"fdiv divisor must be a power of two, got $d")
    shiftright(x.cast("long"), java.lang.Long.numberOfTrailingZeros(d))
  }

  /** Deterministic Holt linear-trend forecast — the chart "Forecast"
    * advanced-analytics surface (Superset ships one behind its trend
    * panels) as an ENGINE-STABLE operator: double exponential smoothing
    * (Holt 1957) with α = 1/2, β = 1/4 over integer value units, every
    * step a floor-divided integer recurrence —
    *
    *   level_t = ⌊(y_t + level_{t−1} + trend_{t−1}) / 2⌋
    *   trend_t = ⌊((level_t − level_{t−1}) + 3·trend_{t−1}) / 4⌋
    *   ŷ_{T+h} = level_T + h·trend_T
    *
    * so the whole fit is pure 64-bit integer arithmetic, bit-identical
    * across engines and partitionings BY CONSTRUCTION (the q195 PageRank
    * rule: halves and quarters have no rounding boundaries to disagree
    * on). Init: (level, trend) = (y₂, y₂ − y₁) — the state the recurrence
    * itself produces at t = 2, so folding starts at t = 3. Series shorter
    * than 2 points are dropped (nothing to fit a trend to).
    *
    * Plan shape: one key-partitioned aggregate collects each series into
    * an in-row array (chart series are PERIODS × KEYS rows — bounded by
    * the time horizon, the q83/q146 discipline: forecasting always runs
    * over the already-grouped result, never raw facts), the recurrence is
    * one codegen-friendly `aggregate` HOF fold per row, and the horizon
    * explodes to h rows. No window, no second shuffle, no driver state.
    *
    * @param series   one row per (keys, period) — the grouped chart result
    * @param keyCols  series identity columns
    * @param orderCol period column (any ordered type)
    * @param valueCol integer metric (cents/micros — the caller scales)
    * @param horizon  steps ahead to emit (h = 1..horizon)
    * @return keys..., level, trend, h, yhat — `horizon` rows per series */
  def holtForecast(series: DataFrame, keyCols: Seq[String], orderCol: String,
      valueCol: String, horizon: Int): DataFrame = {
    require(horizon >= 1, s"horizon must be >= 1, got $horizon")
    val ks = keyCols.map(col)
    val grouped = series
      .groupBy(ks: _*)
      .agg(sort_array(collect_list(struct(
        col(orderCol).as("t"), col(valueCol).cast("long").as("y"))))
        .as("__s"))
      .where(size(col("__s")) >= 2)
    val ys = transform(col("__s"), e => e.getField("y"))
    val init = struct(
      element_at(ys, 2).as("level"),
      (element_at(ys, 2) - element_at(ys, 1)).as("trend"))
    val folded = aggregate(
      slice(ys, lit(3), greatest(size(ys) - 2, lit(0))),
      init,
      (acc, y) => {
        val lv = fdiv(y + acc.getField("level") + acc.getField("trend"), 2L)
        struct(lv.as("level"),
          fdiv(lv - acc.getField("level") + lit(3L) * acc.getField("trend"),
            4L).as("trend"))
      })
    grouped
      .withColumn("__f", folded)
      .select(ks ++ Seq(
        col("__f.level").as("level"), col("__f.trend").as("trend"),
        explode(sequence(lit(1L), lit(horizon.toLong))).as("h")): _*)
      .withColumn("yhat", col("level") + col("h") * col("trend"))
  }
}
