package graft.engine

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Trino's `SHOW STATS FOR <table>` — the statement SQL-Lab users (and
  * Superset's cost estimator) issue to see column statistics. Output is
  * Trino's exact shape: one row per column — column_name, data_size
  * (string/binary byte totals; NULL otherwise, like Trino on
  * non-varlen types), distinct_values_count (approx — HLL, the same
  * sketch family Trino serves from its stats), nulls_fraction,
  * low_value / high_value (rendered as strings; NULL for types without
  * an ordering worth printing) — plus the summary row carrying
  * row_count.
  *
  * Computed LIVE in ONE aggregate pass over the table (~4 expressions
  * per column, all codegen'd — `approx_count_distinct`, null counter,
  * min, max), then a driver-side unpivot of the single result row into
  * the per-column relation. One scan regardless of column count; at
  * 100 TB this is the same price as any full-column profile — and the
  * honest alternative to serving STALE catalog stats as if they were
  * the table (ANALYZE-backed serving can sit behind it when freshness
  * contracts allow). Complex columns (arrays/maps/structs) appear with
  * NULL stats rather than erroring — Trino's own rendering for
  * unstatted columns. */
object ShowStats {

  private val Rx =
    "(?is)^SHOW\\s+STATS\\s+FOR\\s+(`[^`]+`|[A-Za-z_][\\w.]*)\\s*;?\\s*$".r
  // Trino's subquery form: SHOW STATS FOR (SELECT ... ) — stats of the
  // filtered relation, what the cost estimator actually asks
  private val RxQuery =
    "(?is)^SHOW\\s+STATS\\s+FOR\\s*\\((.+)\\)\\s*;?\\s*$".r

  private def unquote(t: String): String =
    if (t.startsWith("`") && t.endsWith("`")) t.substring(1, t.length - 1) else t

  def maybeExecute(spark: SparkSession, sql: String): Option[DataFrame] =
    sql.trim match {
      case Rx(tableRaw) => Some(stats(spark, unquote(tableRaw)))
      case RxQuery(inner) =>
        // the inner text takes the FULL statement surface (time travel,
        // info schema, ...) — route it back through Lakehouse.sql
        Some(statsOf(spark, Lakehouse.sql(spark, inner.trim)))
      case _ => None
    }

  private def simple(dt: DataType): Boolean = dt match {
    case _: NumericType | StringType | BooleanType | DateType |
        _: TimestampType => true
    case _ => false
  }

  def stats(spark: SparkSession, table: String): DataFrame =
    statsOf(spark, spark.table(table))

  def statsOf(spark: SparkSession, df: DataFrame): DataFrame = {
    val fields = df.schema.fields.toSeq
    val aggs = Seq(count(lit(1)).as("__n")) ++ fields.flatMap { f =>
      val c = col(s"`${f.name}`")
      if (!simple(f.dataType)) Nil
      else {
        val base = Seq(
          approx_count_distinct(c).as(s"__d_${f.name}"),
          sum(when(c.isNull, 1L).otherwise(0L)).as(s"__u_${f.name}"),
          min(c).cast("string").as(s"__lo_${f.name}"),
          max(c).cast("string").as(s"__hi_${f.name}"))
        val size = f.dataType match {
          case StringType =>
            Seq(sum(length(c).cast("long")).as(s"__s_${f.name}"))
          case _ => Nil
        }
        base ++ size
      }
    }
    val row: Row = df.agg(aggs.head, aggs.tail: _*).collect().head
    def get[T](name: String): Option[T] = {
      val i = row.fieldIndex(name)
      if (row.isNullAt(i)) None else Some(row.getAs[T](i))
    }
    val n = row.getAs[Long]("__n")
    import spark.implicits._
    val perCol = fields.map { f =>
      if (!simple(f.dataType))
        (f.name, None: Option[Double], None: Option[Double],
          None: Option[Double], None: Option[Double],
          None: Option[String], None: Option[String])
      else {
        val nulls = get[Long](s"__u_${f.name}").getOrElse(0L)
        val distinct = get[Long](s"__d_${f.name}").getOrElse(0L)
        val dataSize = f.dataType match {
          case StringType => get[Long](s"__s_${f.name}").map(_.toDouble)
          case _ => None
        }
        (f.name, dataSize, Some(distinct.toDouble),
          Some(if (n == 0) 0.0 else nulls.toDouble / n),
          None: Option[Double],
          get[String](s"__lo_${f.name}"), get[String](s"__hi_${f.name}"))
      }
    }
    val summary = (null: String, None: Option[Double], None: Option[Double],
      None: Option[Double], Some(n.toDouble), None: Option[String],
      None: Option[String])
    (perCol :+ summary).toDF("column_name", "data_size",
      "distinct_values_count", "nulls_fraction", "row_count",
      "low_value", "high_value")
  }
}
