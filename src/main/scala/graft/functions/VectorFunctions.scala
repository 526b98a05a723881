package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.graft.VectorExprs
import org.apache.spark.sql.functions._

/** Vector math over `ARRAY<FLOAT>`/`ARRAY<DOUBLE>` embedding columns.
  *
  * The public API is backed by native codegen'd Catalyst expressions
  * ([[VectorFold]]): a tight primitive loop inside whole-stage codegen,
  * ~50× the throughput of the higher-order-function formulation on the
  * all-pairs hot path. The `*Hof` twins keep the pure-built-in versions
  * alive as a semantics cross-check (VectorFunctionsSpec asserts bit
  * equality) and as the reference implementation.
  *
  * Accumulation is a strict left fold in element order in both versions,
  * so results are bit-reproducible across engines (matters for the DuckDB
  * oracle and for deterministic re-runs at scale).
  */
object VectorFunctions {

  private def toDouble(c: Column): Column = c.cast("array<double>")

  /** Elementwise dot product (native codegen). */
  def dot(a: Column, b: Column): Column = VectorExprs.dot(toDouble(a), toDouble(b))

  def norm(a: Column): Column = sqrt(dot(a, a))

  /** Cosine similarity = dot(a,b) / (|a| * |b|), one array pass. */
  def cosine(a: Column, b: Column): Column = VectorExprs.cosine(toDouble(a), toDouble(b))

  /** Squared L2 distance (native codegen). */
  def l2Sq(a: Column, b: Column): Column = VectorExprs.l2Sq(toDouble(a), toDouble(b))

  // --- pure higher-order-function reference implementations (cross-check) --

  def dotHof(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => x * y), lit(0.0), (acc, x) => acc + x)

  def cosineHof(a: Column, b: Column): Column =
    dotHof(a, b) / (sqrt(dotHof(a, a)) * sqrt(dotHof(b, b)))

  def l2SqHof(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => (x - y) * (x - y)), lit(0.0), (acc, x) => acc + x)
}
