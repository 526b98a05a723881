package graft.bi

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Streaming twin of [[ChartCompiler]] (ST10): the dashboard auto-refresh
  * query maintained CONTINUOUSLY instead of re-run per refresh.
  *
  * An aggregate-mode [[ChartSpec]] with a time grain compiles onto a
  * watermarked windowed aggregation: `groupBy(window(ts, grain), dims)` +
  * the same metric lowering the batch compiler uses. Emission is
  * append-mode on window close, so the sink receives each (grain, dims)
  * row exactly once, when its result is final — at scale this replaces
  * "Superset re-scans the fact table every 30 s" with "the cluster
  * maintains grain × dims state" (state bounded by watermark horizon ×
  * series, never stream history).
  *
  * Raw mode, percent metrics, contribution, rolling and time_compare are
  * deliberately batch-side: each needs the full result set (or its
  * totals), which is exactly what the streaming feed's OUTPUT table is —
  * run the batch postprocessing over the continuously-maintained summary.
  */
object ChartStream {

  private val grains = Map(
    "minute" -> "1 minute", "hour" -> "1 hour", "day" -> "1 day",
    "week" -> "7 days")

  def feed(spec: ChartSpec, stream: DataFrame, watermark: String): DataFrame = {
    require(spec.queryMode == "aggregate",
      "streaming charts are aggregate-mode only")
    val tc = spec.timeColumn.getOrElse(
      throw new IllegalArgumentException("streaming chart needs timeColumn"))
    val grain = spec.timeGrain.flatMap(grains.get).getOrElse(
      throw new IllegalArgumentException(
        s"streaming chart needs a supported timeGrain (${grains.keys.mkString("/")})"))
    var df = stream
    for ((from, to) <- spec.timeRange)
      df = df.filter(col(tc) >= lit(from).cast("timestamp") &&
        col(tc) < lit(to).cast("timestamp"))
    spec.filters.foreach(f => df = df.filter(ChartCompiler.filterColumn(f)))
    // Week windows must match the batch compiler's date_trunc('week')
    // (Monday-aligned ISO weeks). window()'s buckets anchor at the epoch,
    // and 1970-01-01 was a THURSDAY — so a bare 7-day window would bucket
    // Thursday→Thursday and silently drift from the batch twin. The
    // 4-day startTime offset shifts the anchor to Monday 1970-01-05.
    val win =
      if (spec.timeGrain.contains("week")) window(col(tc), grain, grain, "4 days")
      else window(col(tc), grain)
    val keys = win +: spec.groupby.map(col)
    val aggs = spec.metrics.map(ChartCompiler.metricColumn)
    df.withWatermark(tc, watermark)
      .groupBy(keys: _*)
      .agg(aggs.head, aggs.tail: _*)
      .select(col("window.start").as("__timestamp") +:
        (spec.groupby.map(col) ++ spec.metrics.map(m => col(m.alias))): _*)
  }
}
