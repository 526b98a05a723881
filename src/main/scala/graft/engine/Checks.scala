package graft.engine

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Data-quality validation — the expectations pass (Deequ /
  * Great-Expectations shape) an ingest runs before a corpus drop is
  * allowed near training: each rule produces (rule, violations, pass),
  * long-form, so downstream gating is data, not code.
  *
  * Scale shape: every intra-table rule is an AGGREGATE over one scan —
  * not-null and range are `sum(when(...))`, unique-key is
  * `count - count_distinct` (one Expand column) — all partial-aggregable.
  * Referential integrity is a left join against the (broadcastable)
  * dimension key set + a null count: one pass over the fact, never a
  * driver-side collect. Rules on the same table share the scan via one
  * combined aggregate where possible ([[validate]] unions per-rule
  * 1-row results; Catalyst reuses the cached scan).
  */
object Checks {

  sealed trait Rule { def name: String }
  /** `col` must never be null. */
  final case class NotNull(col: String) extends Rule {
    val name = s"not_null($col)"
  }
  /** `col` must be unique across the table (nulls count as violations). */
  final case class UniqueKey(col: String) extends Rule {
    val name = s"unique($col)"
  }
  /** `col` must lie in [lo, hi]. */
  final case class InRange(col: String, lo: Double, hi: Double) extends Rule {
    val name = s"range($col,$lo,$hi)"
  }
  /** Every non-null `col` must exist in `dimKey` of `dim`. */
  final case class RefIntegrity(col: String, dimName: String, dim: DataFrame,
      dimKey: String) extends Rule {
    val name = s"ref($col->$dimName.$dimKey)"
  }

  /** One row per rule: (rule, violations, pass) — pass = zero violations. */
  def validate(df: DataFrame, rules: Seq[Rule]): DataFrame = {
    require(rules.nonEmpty, "rules must be non-empty")
    val results = rules.map {
      case r: NotNull =>
        df.agg(sum(when(col(r.col).isNull, 1L).otherwise(0L)).as("violations"))
          .select(lit(r.name).as("rule"),
            coalesce(col("violations"), lit(0L)).as("violations"))
      case r: UniqueKey =>
        df.agg((count(lit(1)) - count_distinct(col(r.col))).as("violations"))
          .select(lit(r.name).as("rule"), col("violations"))
      case r: InRange =>
        df.agg(sum(when(col(r.col).isNull ||
            col(r.col) < r.lo || col(r.col) > r.hi, 1L).otherwise(0L))
            .as("violations"))
          .select(lit(r.name).as("rule"),
            coalesce(col("violations"), lit(0L)).as("violations"))
      case r: RefIntegrity =>
        df.select(col(r.col).as("__k")).where(col("__k").isNotNull)
          .join(broadcast(r.dim.select(col(r.dimKey).as("__k"),
            lit(1L).as("__hit")).distinct()), Seq("__k"), "left")
          .agg(sum(when(col("__hit").isNull, 1L).otherwise(0L)).as("violations"))
          .select(lit(r.name).as("rule"),
            coalesce(col("violations"), lit(0L)).as("violations"))
    }
    results.reduce(_ unionByName _)
      .withColumn("pass", col("violations") === 0L)
  }

  /** ROW-level rule evaluation — the quarantine/dead-letter primitive:
    * adds a `violations` array column naming every rule the row fails
    * (empty array = clean row). Only row-scoped rules apply —
    * [[UniqueKey]] is a table property, not a row property, and is
    * refused (use [[validate]] for it). RefIntegrity becomes a broadcast
    * left-join hit marker; everything else is a narrow predicate, so
    * flagging a 100 TB batch costs one pass + tiny dim broadcasts. */
  def flagRows(df: DataFrame, rules: Seq[Rule]): DataFrame = {
    require(rules.nonEmpty, "rules must be non-empty")
    rules.foreach {
      case u: UniqueKey => throw new IllegalArgumentException(
        s"${u.name} is table-scoped; row-level flagging supports not_null/range/ref")
      case _ => ()
    }
    val withHits = rules.zipWithIndex.foldLeft(df) {
      case (acc, (r: RefIntegrity, i)) =>
        acc.join(
          broadcast(r.dim.select(col(r.dimKey).as(s"__refk_$i"),
            lit(1L).as(s"__hit_$i")).distinct()),
          acc(r.col) === col(s"__refk_$i"), "left")
          .drop(s"__refk_$i")
      case (acc, _) => acc
    }
    val flags = rules.zipWithIndex.map {
      case (r: NotNull, _) => when(col(r.col).isNull, lit(r.name))
      case (r: InRange, _) => when(col(r.col).isNull ||
        col(r.col) < r.lo || col(r.col) > r.hi, lit(r.name))
      case (r: RefIntegrity, i) =>
        when(col(r.col).isNotNull && col(s"__hit_$i").isNull, lit(r.name))
      case (u: UniqueKey, _) => throw new IllegalStateException(u.name) // unreachable
    }
    withHits
      .withColumn("violations", filter(array(flags: _*), x => x.isNotNull))
      .drop(rules.zipWithIndex.collect {
        case (_: RefIntegrity, i) => s"__hit_$i"
      }: _*)
  }
}
