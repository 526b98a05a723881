package graft.bi

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** BI query-generation surface: the Spark-native equivalent of Superset's
  * chart `form_data` → SQL compilation
  * (/root/reference/compose/superset/init_db.py:140-157).
  *
  * A [[ChartSpec]] mirrors the form_data fields the reference exercises:
  * datasource table, viz type, raw-mode column list (`all_columns`),
  * agg-mode `groupby` + `metrics` + `percent_metrics`, time column + range
  * + grain (`granularity_sqla` / `time_range` / `time_grain_sqla`,
  * init_db.py:145-147), simple adhoc filters, `order_by` [(metric, asc)],
  * `row_limit` (init_db.py:154). [[ChartCompiler.compile]] lowers it onto a
  * DataFrame plan — the same Catalyst path ad-hoc SQL takes — so every
  * chart inherits pushdown/pruning/limit fusion for free.
  */
final case class Metric(fn: String, column: Option[String], alias: String)

/** One Superset SIMPLE adhoc-filter clause: col op value. */
final case class SimpleFilter(column: String, op: String, value: Any)

final case class ChartSpec(
    datasource: String,
    vizType: String = "table",
    queryMode: String = "raw",                       // "raw" | "aggregate"
    allColumns: Seq[String] = Nil,                   // raw mode projection
    groupby: Seq[String] = Nil,                      // agg mode keys
    metrics: Seq[Metric] = Nil,                      // agg mode measures
    percentMetrics: Seq[Metric] = Nil,               // percent-of-total twins
    filters: Seq[SimpleFilter] = Nil,                // adhoc_filters (SIMPLE)
    timeColumn: Option[String] = None,               // granularity_sqla
    timeRange: Option[(String, String)] = None,      // [from, to) literals
    timeGrain: Option[String] = None,                // time_grain_sqla (e.g. "day")
    timeCompare: Option[String] = None,              // time_compare offset (e.g. "1 day")
    contribution: Boolean = false,                   // contribution mode (share per timestamp)
    rollingWindow: Option[Int] = None,               // rolling mean over N grain periods
    seriesLimit: Option[Int] = None,                 // series_limit (top-N series)
    seriesLimitMetric: Option[String] = None,        // defaults to first metric
    seriesOthers: Boolean = false,                   // lump non-top series into "Others"
    orderBy: Seq[(String, Boolean)] = Nil,           // (column, ascending)
    rowLimit: Int = 100)                             // init_db.py:154

object ChartCompiler {

  /** Shared with [[ChartStream]]: one metric / filter lowering for the
    * batch and streaming compilers, so the two surfaces cannot drift. */
  private[bi] def metricColumn(m: Metric): Column = metricCol(m)
  private[bi] def filterColumn(f: SimpleFilter): Column = filterCol(f)

  private def metricCol(m: Metric): Column = {
    val c = m.fn.toLowerCase match {
      case "count" => count(m.column.map(col).getOrElse(lit(1)))
      case "count_distinct" => countDistinct(col(m.column.get))
      case "sum" => sum(col(m.column.get))
      case "avg" => avg(col(m.column.get))
      case "min" => min(col(m.column.get))
      case "max" => max(col(m.column.get))
      case other => throw new IllegalArgumentException(s"unsupported metric fn: $other")
    }
    c.as(m.alias)
  }

  private def filterCol(f: SimpleFilter): Column = {
    val c = col(f.column)
    f.op.toUpperCase match {
      case "=" | "==" => c === lit(f.value)
      case "!=" | "<>" => c =!= lit(f.value)
      case ">" => c > lit(f.value)
      case ">=" => c >= lit(f.value)
      case "<" => c < lit(f.value)
      case "<=" => c <= lit(f.value)
      case "IN" => c.isin(f.value.asInstanceOf[Seq[Any]]: _*)
      case "LIKE" => c.like(f.value.toString)
      case other => throw new IllegalArgumentException(s"unsupported filter op: $other")
    }
  }

  /** form_data → DataFrame. Filters first (they push to the scan), then raw
    * projection or groupBy/agg (with the time-grain bucket as an extra
    * dimension), percent-of-total windows, then order + limit (fuses to
    * top-k). */
  def compile(spark: SparkSession, spec: ChartSpec, table: String => DataFrame): DataFrame = {
    require(spec.timeCompare.isEmpty ||
      (spec.queryMode == "aggregate" && spec.timeGrain.nonEmpty && spec.timeColumn.nonEmpty),
      "time_compare requires aggregate mode with timeColumn + timeGrain")
    var df = table(spec.datasource)
    for ((from, to) <- spec.timeRange; tc <- spec.timeColumn)
      df = df.filter(col(tc) >= lit(from).cast("timestamp") && col(tc) < lit(to).cast("timestamp"))
    spec.filters.foreach(f => df = df.filter(filterCol(f)))
    df = spec.queryMode match {
      case "raw" =>
        if (spec.allColumns.nonEmpty) df.select(spec.allColumns.map(col): _*) else df
      case "aggregate" =>
        val grainKey = for (g <- spec.timeGrain; tc <- spec.timeColumn)
          yield date_trunc(g, col(tc)).as(s"__timestamp") // Superset's grain alias
        val keys = grainKey.toSeq ++ spec.groupby.map(col)
        val aggs = spec.metrics.map(metricCol)
        val grouped =
          if (keys.nonEmpty) df.groupBy(keys: _*).agg(aggs.head, aggs.tail: _*)
          else df.agg(aggs.head, aggs.tail: _*)
        // series_limit: keep only the top-N series (groupby-key tuples) by
        // total of the limit metric — Superset's guard against unbounded
        // series counts on timeseries charts. The ranking aggregate runs
        // over the ALREADY-GROUPED result (bounded: series × grain rows),
        // its top-N is a TakeOrdered with a deterministic tie-break, and
        // membership comes back as a broadcast semi join — never a window
        // over the full result. Applied before percent metrics, so
        // percents are of the limited set (Superset's series-query order).
        val limited = spec.seriesLimit match {
          case Some(n) if spec.groupby.nonEmpty =>
            val metric = spec.seriesLimitMetric.getOrElse(spec.metrics.head.alias)
            val topSeries = grouped
              .groupBy(spec.groupby.map(col): _*)
              .agg(sum(col(metric)).as("__series_total"))
              .orderBy(col("__series_total").desc +: spec.groupby.map(col(_).asc): _*)
              .limit(n)
              .select(spec.groupby.map(col): _*)
            if (!spec.seriesOthers)
              grouped.join(broadcast(topSeries), spec.groupby, "left_semi")
            else {
              require(spec.metrics.forall(m =>
                Set("count", "sum").contains(m.fn.toLowerCase)),
                "series 'Others' re-merges grouped rows — only additive " +
                  "metrics (count/sum) are exact under re-aggregation")
              // "Group others" (Superset's contribution-preserving variant
              // of series_limit): non-top series are RELABELED "Others"
              // and re-aggregated per timestamp instead of dropped, so
              // totals — and therefore percent/contribution stages — stay
              // whole. Membership is a broadcast join marker; metric
              // re-merge is a SUM over the already-grouped rows, which is
              // exact for count/sum metrics (Superset's constraint too).
              val marked = grouped.join(
                broadcast(topSeries.withColumn("__keep", lit(1))),
                spec.groupby, "left")
              val relabeled = spec.groupby.foldLeft(marked) { (acc, g) =>
                acc.withColumn(g,
                  when(col("__keep").isNull, lit("Others")).otherwise(col(g)))
              }.drop("__keep")
              val keys = grainKey.map(_ => col("__timestamp")).toSeq ++
                spec.groupby.map(col)
              val remerged = spec.metrics.map(m => sum(col(m.alias)).as(m.alias))
              relabeled.groupBy(keys: _*).agg(remerged.head, remerged.tail: _*)
            }
          case _ => grouped
        }
        // percent metrics: metric / total(metric). The total is a 1-row
        // aggregate broadcast-cross-joined back — NOT a partition-less
        // window, which would serialize the whole grouped result through a
        // single task at a high-cardinality groupby (the one scale-killer
        // flagged in round 1). Cost note: when the planner doesn't dedupe
        // the shared grouped subtree (static planning does via
        // ReuseExchange; AQE's stage cache currently misses this shape) the
        // aggregation runs twice — bounded 2×, fully parallel, asserted
        // in PlanQualitySpec.
        val withPct =
          if (spec.percentMetrics.isEmpty) limited
          else {
            val totals = limited.agg(
              spec.percentMetrics.map(m => sum(col(m.alias)).as(s"__total_${m.alias}")).head,
              spec.percentMetrics.tail.map(m => sum(col(m.alias)).as(s"__total_${m.alias}")): _*)
            val withTotals = limited.crossJoin(broadcast(totals))
            spec.percentMetrics.foldLeft(withTotals) { (acc, m) =>
              acc.withColumn(s"pct_${m.alias}", col(m.alias) / col(s"__total_${m.alias}"))
            }.drop(spec.percentMetrics.map(m => s"__total_${m.alias}"): _*)
          }
        // contribution mode: each series' metric becomes its share of the
        // per-timestamp total — Superset's "contribution" postprocessing
        // (series stacking as percentages). The window partitions by the
        // grain timestamp, so each partition holds one timestamp's series
        // rows (bounded by series count) — high grain cardinality means
        // MORE parallelism, never a global window.
        val withContrib =
          if (!spec.contribution) withPct
          else {
            require(grainKey.nonEmpty && spec.groupby.nonEmpty,
              "contribution requires timeColumn + timeGrain and a groupby")
            val w = org.apache.spark.sql.expressions.Window
              .partitionBy(col("__timestamp"))
            spec.metrics.foldLeft(withPct) { (acc, m) =>
              acc.withColumn(s"contrib_${m.alias}",
                col(m.alias).cast("double") / sum(col(m.alias).cast("double")).over(w))
            }
          }
        // rolling window: Superset's "rolling mean" postprocessing — each
        // metric gains a `<alias>__rolling` mean over the last N grain
        // periods of ITS series. Partitioned by the series dims (or, for a
        // single global series, by nothing but still bounded: rows = grain
        // periods, not raw data). Row-frame over the grouped result only.
        val withRolling = spec.rollingWindow match {
          case Some(n) =>
            require(grainKey.nonEmpty, "rolling window requires timeColumn + timeGrain")
            val w = org.apache.spark.sql.expressions.Window
              .partitionBy(spec.groupby.map(col): _*)
              .orderBy(col("__timestamp"))
              .rowsBetween(-(n - 1).toLong, 0)
            spec.metrics.foldLeft(withContrib) { (acc, m) =>
              acc.withColumn(s"${m.alias}__rolling",
                avg(col(m.alias).cast("double")).over(w))
            }
          case None => withContrib
        }
        // time_compare: each metric gets a `<alias>__prev` twin from the
        // period `offset` earlier — Superset runs a second shifted query;
        // the single-plan equivalent is a left self-join of the grouped
        // result on (shifted grain, dims). Series with no history keep
        // null twins, exactly like Superset's gap rendering. Scale: both
        // join sides are the SAME grouped subtree (ReuseExchange dedupes
        // under static planning), keyed on (grain, dims) — an aggregated,
        // bounded input, never the raw fact table.
        spec.timeCompare match {
          case Some(offset) if grainKey.nonEmpty =>
            val dims = spec.groupby
            val shifted = withRolling.select(
              (col("__timestamp") + expr(s"INTERVAL $offset")).as("__timestamp") +:
                (dims.map(col) ++
                  spec.metrics.map(m => col(m.alias).as(s"${m.alias}__prev"))): _*)
            withRolling.join(shifted, Seq("__timestamp") ++ dims, "left")
          case Some(_) =>
            throw new IllegalArgumentException(
              "time_compare requires timeColumn + timeGrain")
          case None => withRolling
        }
      case other => throw new IllegalArgumentException(s"unsupported query_mode: $other")
    }
    if (spec.orderBy.nonEmpty)
      df = df.orderBy(spec.orderBy.map { case (c, asc) => if (asc) col(c).asc else col(c).desc }: _*)
    df.limit(spec.rowLimit)
  }
}

/** Dataset registry: Superset's SqlaTable + column-sync equivalent
  * (init_db.py:63-88) via the session catalog. */
object Datasets {
  final case class ColumnDef(name: String, dataType: String)
  final case class DatasetDef(database: String, table: String, columns: Seq[ColumnDef])

  /** Introspect (not infer) column metadata, like SQLAlchemy's inspector. */
  def describe(spark: SparkSession, database: String, table: String): DatasetDef =
    DatasetDef(database, table,
      spark.catalog.listColumns(s"$database.$table").collect().toSeq
        .map(c => ColumnDef(c.name, c.dataType)))

  def listAll(spark: SparkSession, database: String): Seq[DatasetDef] =
    spark.catalog.listTables(database).collect().toSeq
      .map(t => describe(spark, database, t.name))
}

/** Dashboard: layout-only metadata, the reference's v2 grid JSON
  * (init_db.py:273-307) — two charts per row, width 6, height 50. No
  * computation happens at this layer; each chart's query is its ChartSpec. */
object Dashboard {
  final case class ChartCell(id: String, chartName: String, row: Int, colOffset: Int,
      width: Int = 6, height: Int = 50, chartId: Int = 0)
  final case class DashboardDef(title: String, cells: Seq[ChartCell])

  /** Grid placement exactly as the reference: 2 per row, each 6 wide;
    * `chartId` is the 1-based slice id a fresh init assigns in insertion
    * order (init_db.py `chart.id` on a clean metadata DB). */
  def grid(title: String, chartNames: Seq[String]): DashboardDef =
    DashboardDef(title, chartNames.zipWithIndex.map { case (name, idx) =>
      ChartCell(s"CHART-${idx + 1}", name, row = idx / 2,
        colOffset = (idx % 2) * 6, chartId = idx + 1)
    })

  /** The v2 `position_json` structure BYTE-compatible with what the
    * reference writes (init_db.py:272-307 → `json.dumps(dashboard_json)`):
    * same node set (DASHBOARD_VERSION_KEY, ROOT_ID → GRID_ID → CHART-i),
    * same per-node field order (python dict insertion order), same meta
    * fields (chartId, height 50, sliceName, width 6), and python's
    * default `", "` / `": "` separators — so a reference Superset
    * instance ingests it unmodified. */
  def toJson(d: DashboardDef): String = {
    def str(s: String) = "\"" + s.replace("\\", "\\\\").replace("\"", "\\\"") + "\""
    def obj(fields: (String, String)*) =
      fields.map { case (k, v) => s"${str(k)}: $v" }.mkString("{", ", ", "}")
    def arr(xs: Seq[String]) = xs.mkString("[", ", ", "]")
    val cells = d.cells.map { c =>
      c.id -> obj(
        "children" -> arr(Nil),
        "id" -> str(c.id),
        "meta" -> obj(
          "chartId" -> c.chartId.toString,
          "height" -> c.height.toString,
          "sliceName" -> str(c.chartName),
          "width" -> c.width.toString),
        "type" -> str("CHART"),
        "parents" -> arr(Seq(str("ROOT_ID"), str("GRID_ID"))))
    }
    obj((Seq(
      "DASHBOARD_VERSION_KEY" -> str("v2"),
      "ROOT_ID" -> obj(
        "children" -> arr(Seq(str("GRID_ID"))),
        "id" -> str("ROOT_ID"),
        "type" -> str("ROOT")),
      "GRID_ID" -> obj(
        "children" -> arr(d.cells.map(c => str(c.id))),
        "id" -> str("GRID_ID"),
        "parents" -> arr(Seq(str("ROOT_ID"))),
        "type" -> str("GRID"))) ++ cells): _*)
  }
}
