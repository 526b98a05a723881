package org.apache.spark.sql.graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.classic.ExpressionUtils

import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, ImplicitCastInputTypes, UnaryExpression}
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

/** All `tables` LSH bucket ids of one vector in ONE expression — the
  * hyperplane-signature hot path that the composed-`Column` form could
  * not keep JIT-compiled. The original `Similarity.lshBucketArray`
  * built tables × bits separate [[DotProduct]] sub-expressions (128 at
  * auto-bits 16); whole-stage codegen inlines them all into a single
  * generated method whose bytecode blows past the JVM's
  * huge-method compile limit (~8 KB), so the ENTIRE consume path runs
  * interpreted — caught live at the gsf100 scaling probe, where the
  * 2M-vector signature pass pinned 32 cores at ~26 ms/row (BASELINE
  * §Round 13; ~200× off a compiled loop). This expression generates the
  * same arithmetic as ACTUAL LOOPS over a plane-matrix reference —
  * bytecode size is constant in tables × bits, so it always JITs.
  *
  * Bit-compatibility contract (SimilaritySpec pins native ≡ composed
  * bucket-for-bucket): planes are drawn by the identical
  * `Random(seed)` sequence in (table, bit, dim) order as
  * `Similarity.hyperplanes`; each dot folds elements in ascending
  * index order with double adds (the [[DotProduct]] fold); the sign
  * rule is strictly-greater-than-zero; bits OR in as `1L << b` —
  * exactly the composed form's sum of distinct powers of two.
  *
  * Output: ARRAY<LONG>, one bucket per table (index = table_id) —
  * consumers `posexplode` (corpus/probe hashing) or wrap into the
  * legacy struct form (`Similarity.lshBucketArray`). */
case class LshSignatures(child: Expression, tables: Int, bits: Int,
    dim: Int, seed: Long) extends UnaryExpression
    with ImplicitCastInputTypes with Serializable {
  require(tables >= 1 && bits >= 1 && bits <= 63 && dim >= 1,
    s"bad LSH signature shape: tables=$tables bits=$bits dim=$dim")
  override def inputTypes: Seq[AbstractDataType] = Seq(ArrayType(DoubleType))
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "lsh_signatures"

  // flattened (table, bit, dim)-major plane matrix; @transient lazy —
  // regenerated per executor from the deterministic seed
  @transient private lazy val planes: Array[Double] =
    LshSignatures.flatPlanes(tables, bits, dim, seed)

  override def nullSafeEval(input: Any): Any = {
    val v = input.asInstanceOf[ArrayData]
    val n = math.min(dim, v.numElements())
    val out = new Array[Long](tables)
    var t = 0
    while (t < tables) {
      var bucket = 0L
      var b = 0
      while (b < bits) {
        val base = (t * bits + b) * dim
        var s = 0.0
        var i = 0
        while (i < n) { s += v.getDouble(i) * planes(base + i); i += 1 }
        if (s > 0) bucket |= (1L << b)
        b += 1
      }
      out(t) = bucket
      t += 1
    }
    org.apache.spark.sql.catalyst.expressions.UnsafeArrayData
      .fromPrimitiveArray(out)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, v => {
      val p = ctx.addReferenceObj("lshPlanes", planes, "double[]")
      val out = ctx.freshName("out")
      val n = ctx.freshName("n")
      val t = ctx.freshName("t")
      val b = ctx.freshName("b")
      val i = ctx.freshName("i")
      val s = ctx.freshName("s")
      val base = ctx.freshName("base")
      val bucket = ctx.freshName("bucket")
      s"""
         |long[] $out = new long[$tables];
         |int $n = java.lang.Math.min($dim, $v.numElements());
         |for (int $t = 0; $t < $tables; $t++) {
         |  long $bucket = 0L;
         |  for (int $b = 0; $b < $bits; $b++) {
         |    int $base = ($t * $bits + $b) * $dim;
         |    double $s = 0.0;
         |    for (int $i = 0; $i < $n; $i++) {
         |      $s += $v.getDouble($i) * $p[$base + $i];
         |    }
         |    if ($s > 0) $bucket |= (1L << $b);
         |  }
         |  $out[$t] = $bucket;
         |}
         |${ev.value} = org.apache.spark.sql.catalyst.expressions
         |  .UnsafeArrayData.fromPrimitiveArray($out);
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object LshSignatures {
  /** The exact `Similarity.hyperplanes` draw, flattened (t, b, d)-major:
    * one `Random(seed)` Gaussian stream consumed in the same order, so
    * plane values are bit-identical to the composed form's literals. */
  private[graft] def flatPlanes(tables: Int, bits: Int, dim: Int,
      seed: Long): Array[Double] = {
    val rnd = new scala.util.Random(seed)
    Array.fill(tables * bits * dim)(rnd.nextGaussian())
  }
}

/** Column-level factories — the only API the rest of the engine touches.
  * Lives in this package for `private[sql]` access to the Column↔Expression
  * bridge and the abstract type-coercion traits. */
object VectorExprs {
  private def e(c: Column) = ExpressionUtils.expression(c)
  def dot(a: Column, b: Column): Column = ExpressionUtils.column(DotProduct(e(a), e(b)))
  def cosine(a: Column, b: Column): Column = ExpressionUtils.column(CosineSim(e(a), e(b)))
  def l2Sq(a: Column, b: Column): Column = ExpressionUtils.column(L2Squared(e(a), e(b)))
  def lshSignatures(vec: Column, tables: Int, bits: Int, dim: Int,
      seed: Long = 42L): Column =
    ExpressionUtils.column(LshSignatures(e(vec), tables, bits, dim, seed))
}
