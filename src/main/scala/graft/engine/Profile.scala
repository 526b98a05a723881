package graft.engine

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Dataset profiling — the `ANALYZE`/data-quality pass a pipeline runs
  * before training on a new corpus drop: per-column row/null/distinct
  * counts, lexicographic min/max, and mean rendered length, long-form
  * (one output row per column) so downstream checks are data, not schema.
  *
  * == Scale shape ==
  *
  * ONE pass over the table for all columns. Everything except exact
  * distinct counts partial-aggregates map-side to a single reducer row.
  * Exact multi-column distincts lower to a single Expand (one duplicated
  * scan-side row per profiled column) feeding one shuffle — exact is the
  * oracle-checkable default here; at corpus scale pass `exact = false`
  * to swap in `approx_count_distinct` (HLL++, no Expand, pure partial
  * agg), the same exact→sketch dial as q13/q52.
  *
  * min/max/avg_len profile the *string rendering* so the output schema is
  * column-type-independent; numeric-order min/max of a numeric column is
  * a plain `agg` away and not this operator's job.
  */
object Profile {

  /** One row per column of `cols`:
    * (column, n_rows, n_null, n_distinct, min_val, max_val, avg_len). */
  def profile(df: DataFrame, cols: Seq[String], exact: Boolean = true): DataFrame = {
    require(cols.nonEmpty, "cols must be non-empty")
    val aggs = cols.flatMap { c =>
      val s = col(c).cast("string")
      Seq(
        coalesce(sum(when(col(c).isNull, 1L).otherwise(0L)), lit(0L)).as(s"__null_$c"),
        (if (exact) countDistinct(col(c)) else approx_count_distinct(col(c)))
          .as(s"__dist_$c"),
        min(s).as(s"__min_$c"),
        max(s).as(s"__max_$c"),
        avg(length(s)).as(s"__len_$c"))
    }
    val one = df.agg(count(lit(1)).as("__rows"), aggs: _*)
    val rows = cols.map { c =>
      struct(lit(c).as("column"), col("__rows").as("n_rows"),
        col(s"__null_$c").as("n_null"), col(s"__dist_$c").as("n_distinct"),
        col(s"__min_$c").as("min_val"), col(s"__max_$c").as("max_val"),
        round(col(s"__len_$c"), 6).as("avg_len"))
    }
    one.select(explode(array(rows: _*)).as("__p")).select(col("__p.*"))
  }
}
