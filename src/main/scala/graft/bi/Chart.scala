package graft.bi

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** BI query-generation surface: the Spark-native equivalent of Superset's
  * chart `form_data` → SQL compilation
  * (/root/reference/compose/superset/init_db.py:140-157).
  *
  * A [[ChartSpec]] mirrors the form_data fields the reference exercises:
  * datasource table, viz type, raw-mode column list (`all_columns`),
  * agg-mode `groupby` + `metrics`, time column + range
  * (`granularity_sqla` / `time_range`), `order_by` [(metric, asc)],
  * `row_limit`. [[ChartCompiler.compile]] lowers it onto a DataFrame plan —
  * the same Catalyst path ad-hoc SQL takes — so every chart inherits
  * pushdown/pruning/limit fusion for free.
  */
final case class Metric(fn: String, column: Option[String], alias: String)

final case class ChartSpec(
    datasource: String,
    vizType: String = "table",
    queryMode: String = "raw",                       // "raw" | "aggregate"
    allColumns: Seq[String] = Nil,                   // raw mode projection
    groupby: Seq[String] = Nil,                      // agg mode keys
    metrics: Seq[Metric] = Nil,                      // agg mode measures
    timeColumn: Option[String] = None,               // granularity_sqla
    timeRange: Option[(String, String)] = None,      // [from, to) literals
    orderBy: Seq[(String, Boolean)] = Nil,           // (column, ascending)
    rowLimit: Int = 100)                             // init_db.py:154

object ChartCompiler {

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

  /** form_data → DataFrame. Time filter first (pushes to the scan), then
    * raw projection or groupBy/agg, then order + limit (fuses to top-k). */
  def compile(spark: SparkSession, spec: ChartSpec, table: String => DataFrame): DataFrame = {
    var df = table(spec.datasource)
    for ((from, to) <- spec.timeRange; tc <- spec.timeColumn)
      df = df.filter(col(tc) >= lit(from).cast("timestamp") && col(tc) < lit(to).cast("timestamp"))
    df = spec.queryMode match {
      case "raw" =>
        if (spec.allColumns.nonEmpty) df.select(spec.allColumns.map(col): _*) else df
      case "aggregate" =>
        val aggs = spec.metrics.map(metricCol)
        if (spec.groupby.nonEmpty)
          df.groupBy(spec.groupby.map(col): _*).agg(aggs.head, aggs.tail: _*)
        else df.agg(aggs.head, aggs.tail: _*)
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
