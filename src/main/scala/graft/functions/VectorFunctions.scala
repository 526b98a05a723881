package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Vector math over `ARRAY<FLOAT>`/`ARRAY<DOUBLE>` embedding columns, built
  * from Catalyst higher-order functions (`zip_with`, `aggregate`,
  * `transform`) — codegen-friendly expression trees, no UDF serialization,
  * fully distributed.
  *
  * Accumulation is a strict left fold in element order, so results are
  * bit-reproducible across engines (matters for the DuckDB oracle and for
  * deterministic re-runs at scale).
  */
object VectorFunctions {

  /** Elementwise dot product; cast inputs to ARRAY<DOUBLE> first for
    * full-precision accumulation. */
  def dot(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => x * y), lit(0.0), (acc, x) => acc + x)

  def norm(a: Column): Column = sqrt(dot(a, a))

  /** Cosine similarity = dot(a,b) / (|a| * |b|). */
  def cosine(a: Column, b: Column): Column = dot(a, b) / (norm(a) * norm(b))

  /** Squared L2 distance. */
  def l2Sq(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => (x - y) * (x - y)), lit(0.0), (acc, x) => acc + x)
}
