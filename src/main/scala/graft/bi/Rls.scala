package graft.bi

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Row-level security (Superset's RLS filters): per-(role, datasource)
  * predicate clauses ANDed into every chart a role compiles — the
  * mechanism Superset applies to the generated SQL before it reaches the
  * engine. Here the policy clauses merge into the spec's adhoc filters,
  * so they ride the SAME lowering path (pushed to the scan, eligible for
  * partition pruning) and run BEFORE any aggregation — a role can never
  * see another tenant's rows reflected in a total.
  *
  * Policies are passed explicitly (no mutable global registry): the
  * caller owns where policy definitions live, the compiler owns only
  * their enforcement point.
  */
object Rls {

  /** One policy: rows of `datasource` visible to `role` must satisfy ALL
    * `filters` (Superset's "regular" RLS filter type). */
  final case class Policy(role: String, datasource: String,
      filters: Seq[SimpleFilter])

  /** Compile `spec` as `role`: every matching policy's clauses are ANDed
    * into the spec's filters. A role with no policy on the datasource
    * sees everything — same default as Superset. */
  def compileAs(spark: SparkSession, spec: ChartSpec, role: String,
      policies: Seq[Policy], table: String => DataFrame): DataFrame = {
    val extra = policies
      .filter(p => p.role == role && p.datasource == spec.datasource)
      .flatMap(p => p.filters)
    ChartCompiler.compile(spark, spec.copy(filters = spec.filters ++ extra), table)
  }
}
