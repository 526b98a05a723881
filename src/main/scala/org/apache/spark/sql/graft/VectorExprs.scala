package org.apache.spark.sql.graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.classic.ExpressionUtils

import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, ImplicitCastInputTypes}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/** Native Catalyst expressions for the embedding hot path.
  *
  * The higher-order-function formulation (`aggregate(zip_with(...))`)
  * evaluates its lambda interpreted, per element, and breaks whole-stage
  * codegen around it — at q29 scale (millions of candidate pairs × 64 dims
  * × 3 accumulators) that interpretation overhead dominated the whole
  * benchmark. These expressions generate a tight primitive `double` loop
  * inside whole-stage codegen (and a matching interpreted `eval` for
  * non-codegen paths).
  *
  * Numeric parity: accumulation is the same strict left fold in element
  * order as the HOF versions and the DuckDB oracle (`list_inner_product`),
  * so results are bit-identical and hash-stable. See
  * VectorFunctionsSpec for the cross-check.
  *
  * Precondition: dense vectors (no null elements) — the contract of every
  * embedding column in the engine. Top-level nulls propagate as usual.
  */
abstract class VectorFold extends BinaryExpression with ImplicitCastInputTypes
    with Serializable {
  override def inputTypes: Seq[AbstractDataType] =
    Seq(ArrayType(DoubleType), ArrayType(DoubleType))
  override def dataType: DataType = DoubleType

  /** Java statements: given array vars `x`,`y` and length `n`, fold into
    * `double` accumulators and assign the result to `result`. */
  protected def javaLoop(x: String, y: String, n: String, result: String): String
  protected def scalaFold(x: ArrayData, y: ArrayData, n: Int): Double

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    scalaFold(x, y, math.min(x.numElements(), y.numElements()))
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (x, y) => {
      val n = ctx.freshName("n")
      s"""
         |int $n = java.lang.Math.min($x.numElements(), $y.numElements());
         |${javaLoop(x, y, n, ev.value.toString)}
       """.stripMargin
    })
}

/** dot(a, b) = Σ a_i·b_i — DuckDB twin: `list_inner_product(a, b)`. */
case class DotProduct(left: Expression, right: Expression) extends VectorFold {
  override def prettyName: String = "vec_dot"
  override protected def javaLoop(x: String, y: String, n: String, result: String): String =
    s"""
       |double acc = 0.0;
       |for (int i = 0; i < $n; i++) { acc += $x.getDouble(i) * $y.getDouble(i); }
       |$result = acc;
     """.stripMargin
  override protected def scalaFold(x: ArrayData, y: ArrayData, n: Int): Double = {
    var acc = 0.0; var i = 0
    while (i < n) { acc += x.getDouble(i) * y.getDouble(i); i += 1 }
    acc
  }
  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
    copy(left = l, right = r)
}

/** cosine(a, b) = dot/(√(a·a)·√(b·b)) in ONE array pass (three accumulators).
  * Same formula shape as the HOF version and the oracle
  * (`x/(sqrt(xx)*sqrt(yy))`, not `x/sqrt(xx*yy)`) so ulps line up. */
case class CosineSim(left: Expression, right: Expression) extends VectorFold {
  override def prettyName: String = "vec_cosine"
  override protected def javaLoop(x: String, y: String, n: String, result: String): String =
    s"""
       |double xy = 0.0, xx = 0.0, yy = 0.0;
       |for (int i = 0; i < $n; i++) {
       |  double xv = $x.getDouble(i); double yv = $y.getDouble(i);
       |  xy += xv * yv; xx += xv * xv; yy += yv * yv;
       |}
       |$result = xy / (java.lang.Math.sqrt(xx) * java.lang.Math.sqrt(yy));
     """.stripMargin
  override protected def scalaFold(x: ArrayData, y: ArrayData, n: Int): Double = {
    var xy = 0.0; var xx = 0.0; var yy = 0.0; var i = 0
    while (i < n) {
      val xv = x.getDouble(i); val yv = y.getDouble(i)
      xy += xv * yv; xx += xv * xv; yy += yv * yv; i += 1
    }
    xy / (math.sqrt(xx) * math.sqrt(yy))
  }
  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
    copy(left = l, right = r)
}

/** l2sq(a, b) = Σ (a_i−b_i)² — squared Euclidean distance. */
case class L2Squared(left: Expression, right: Expression) extends VectorFold {
  override def prettyName: String = "vec_l2sq"
  override protected def javaLoop(x: String, y: String, n: String, result: String): String =
    s"""
       |double acc = 0.0;
       |for (int i = 0; i < $n; i++) {
       |  double d = $x.getDouble(i) - $y.getDouble(i); acc += d * d;
       |}
       |$result = acc;
     """.stripMargin
  override protected def scalaFold(x: ArrayData, y: ArrayData, n: Int): Double = {
    var acc = 0.0; var i = 0
    while (i < n) { val d = x.getDouble(i) - y.getDouble(i); acc += d * d; i += 1 }
    acc
  }
  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
    copy(left = l, right = r)
}

/** Column-level factories — the only API the rest of the engine touches.
  * Lives in this package for `private[sql]` access to the Column↔Expression
  * bridge and the abstract type-coercion traits. */
object VectorExprs {
  private def e(c: Column) = ExpressionUtils.expression(c)
  def dot(a: Column, b: Column): Column = ExpressionUtils.column(DotProduct(e(a), e(b)))
  def cosine(a: Column, b: Column): Column = ExpressionUtils.column(CosineSim(e(a), e(b)))
  def l2Sq(a: Column, b: Column): Column = ExpressionUtils.column(L2Squared(e(a), e(b)))
}
