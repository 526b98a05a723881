package org.apache.spark.sql.graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.classic.ExpressionUtils

import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, ImplicitCastInputTypes}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Jaro–Winkler string similarity as a native Catalyst expression.
  *
  * Spark ships `levenshtein` but no Jaro–Winkler, the standard measure for
  * entity-resolution name matching (short attribute strings, transposition
  * tolerant, prefix weighted). Implemented as a [[BinaryExpression]] whose
  * codegen emits ONE static call — the same shape as Spark's own
  * `Levenshtein` (which calls `UTF8String.levenshteinDistance`) — so the
  * surrounding whole-stage-codegen span stays intact; the O(|a|·|b|)
  * matching loop lives in [[JaroWinklerImpl]], shared bit-for-bit by the
  * interpreted `eval` path.
  *
  * Semantics mirror the DuckDB oracle's `jaro_winkler_similarity`
  * (rapidfuzz formulation), verified against probe vectors in
  * StringSimSpec:
  *   - match window = max(|a|,|b|)/2 − 1, clamped at 0;
  *   - greedy left-to-right first-unflagged matching;
  *   - transpositions = (mismatched matched-order pairs) / 2, INTEGER
  *     division (the rapidfuzz convention);
  *   - jaro = (m/|a| + m/|b| + (m−t)/m) / 3;
  *   - Winkler boost ONLY when jaro > 0.7: jw = j + ℓ·0.1·(1−j) with ℓ the
  *     common prefix capped at 4;
  *   - either side empty → 0.0 (DuckDB's convention, including both-empty —
  *     NOT rapidfuzz's 1.0).
  *
  * Operates on UTF-16 code units; identical to the oracle's byte semantics
  * on ASCII, which is the contract of every name column it gates on
  * (part/customer/supplier names). Float discipline: small-integer
  * rationals combined in a fixed op order, so both engines compute the
  * same double; gates round to 6 places as usual.
  */
case class JaroWinkler(left: Expression, right: Expression)
    extends BinaryExpression with ImplicitCastInputTypes with Serializable {

  override def prettyName: String = "jaro_winkler"
  override def inputTypes: Seq[AbstractDataType] = Seq(StringType, StringType)
  override def dataType: DataType = DoubleType

  override def nullSafeEval(a: Any, b: Any): Any =
    JaroWinklerImpl.sim(a.asInstanceOf[UTF8String].toString,
      b.asInstanceOf[UTF8String].toString)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) =>
      s"${ev.value} = org.apache.spark.sql.graft.JaroWinklerImpl.sim(" +
        s"$a.toString(), $b.toString());")

  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
    copy(left = l, right = r)
}

object JaroWinklerImpl {

  /** Jaro–Winkler similarity in [0, 1]; see [[JaroWinkler]] for the exact
    * convention set (rapidfuzz/DuckDB). */
  def sim(a: String, b: String): Double = {
    val la = a.length
    val lb = b.length
    if (la == 0 || lb == 0) return 0.0
    // Match window: max/2 - 1, clamped at 0 (so equal-length-2 anagrams
    // like "xz"/"zx" score 0 — the DuckDB probe vector).
    val bound = {
      val w = math.max(la, lb) / 2
      if (w > 0) w - 1 else 0
    }
    val flagsA = new Array[Boolean](la)
    val flagsB = new Array[Boolean](lb)
    var m = 0
    var i = 0
    while (i < la) {
      val lo = math.max(0, i - bound)
      val hi = math.min(lb - 1, i + bound)
      var j = lo
      var found = false
      while (j <= hi && !found) {
        if (!flagsB(j) && b.charAt(j) == a.charAt(i)) {
          flagsA(i) = true
          flagsB(j) = true
          m += 1
          found = true
        }
        j += 1
      }
      i += 1
    }
    if (m == 0) return 0.0
    // Transpositions: walk both flagged sequences in order, count
    // mismatches, halve with INTEGER division (rapidfuzz convention).
    var mismatches = 0
    var k = 0
    i = 0
    while (i < la) {
      if (flagsA(i)) {
        while (!flagsB(k)) k += 1
        if (a.charAt(i) != b.charAt(k)) mismatches += 1
        k += 1
      }
      i += 1
    }
    val t = mismatches / 2
    val md = m.toDouble
    val jaro = (md / la + md / lb + (md - t) / md) / 3.0
    if (jaro > 0.7) {
      val maxPrefix = math.min(math.min(la, lb), 4)
      var p = 0
      while (p < maxPrefix && a.charAt(p) == b.charAt(p)) p += 1
      jaro + p.toDouble * 0.1 * (1.0 - jaro)
    } else jaro
  }
}

object StringSimExprs {
  private def e(c: Column) = ExpressionUtils.expression(c)

  /** DuckDB twin: `jaro_winkler_similarity(a, b)`. */
  def jaroWinkler(a: Column, b: Column): Column =
    ExpressionUtils.column(JaroWinkler(e(a), e(b)))
}
