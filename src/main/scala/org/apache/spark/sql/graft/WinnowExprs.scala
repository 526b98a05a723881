package org.apache.spark.sql.graft

import java.security.MessageDigest

import org.apache.spark.sql.Column
import org.apache.spark.sql.classic.ExpressionUtils

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpectsInputTypes, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._

/** Winnowing fingerprint selection (Schleimer, Wilkerson & Aiken 2003) as a
  * native Catalyst expression: token array in, the document's selected
  * `(fp_pos, fp_hash)` fingerprints out, in ONE O(n·k) pass per row.
  *
  * Why a native expression and not the higher-order-function pipeline it
  * replaces (round-7 `Winnowing.fingerprints`): the HOF form staged a k-gram
  * md5 array and then sliced it per window inside `transform` lambdas.
  * Optimizer rules are free to substitute an aliased producer into every
  * reference site — `InferFiltersFromGenerate` + filter pushdown did exactly
  * that, inlining the tokenize+md5 pipeline into a per-window-element filter
  * condition and turning O(n·w) array ops into O(n²·w) full-pipeline
  * re-evaluations (210 s for 50 documents at sf0.001; killed the sf1 bench).
  * A single expression node cannot be split or partially inlined: the k-gram
  * hashing and the sliding-window min run together inside one `eval`, the
  * hash array lives in a local, and the window minimum comes from a
  * monotonic deque — O(n) total, not O(n·w).
  *
  * Semantics — bit-identical to the relational DuckDB oracle
  * (`Round7bQueries.scala` q213) and the round-7 HOF form:
  *   - k-gram hash = first 4 bytes of md5(tokens joined by " ") read as an
  *     unsigned 32-bit big-endian value (the portable
  *     `conv(substring(md5(s),1,8),16,10)` draw);
  *   - fewer than k tokens → no k-grams → empty result;
  *   - n = (#k-grams) ≥ w → windows start at 1..n−w+1; 0 < n < w → the whole
  *     hash array is one window;
  *   - each window selects its minimum hash, rightmost position on ties;
  *   - duplicate selections across overlapping windows are emitted once
  *     (selected positions are non-decreasing as the window slides, so
  *     consecutive-dedup IS global distinct).
  *
  * Codegen emits one static call (the [[JaroWinkler]] shape), keeping the
  * surrounding whole-stage-codegen span intact.
  */
case class WinnowFingerprints(child: Expression, k: Int, w: Int)
    extends UnaryExpression with ExpectsInputTypes with Serializable {

  override def prettyName: String = "winnow_fingerprints"
  override def inputTypes: Seq[AbstractDataType] = Seq(ArrayType(StringType))
  override def dataType: DataType = WinnowingImpl.resultType

  override def nullSafeEval(toks: Any): Any =
    WinnowingImpl.fingerprints(toks.asInstanceOf[ArrayData], k, w)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a =>
      s"${ev.value} = org.apache.spark.sql.graft.WinnowingImpl.fingerprints(" +
        s"$a, $k, $w);")

  override protected def withNewChildInternal(c: Expression): Expression =
    copy(child = c)
}

object WinnowingImpl {

  val resultType: DataType = ArrayType(
    StructType(Seq(
      StructField("fp_pos", IntegerType, nullable = false),
      StructField("fp_hash", LongType, nullable = false))),
    containsNull = false)

  private val empty = new GenericArrayData(Array.empty[Any])

  /** All selected fingerprints of one document's token array. O(n·k) md5
    * work + O(n) window selection; allocation is two primitive arrays and
    * the output rows. */
  def fingerprints(toks: ArrayData, k: Int, w: Int): ArrayData = {
    val nt = toks.numElements()
    if (nt < k) return empty
    val n = nt - k + 1
    val hs = new Array[Long](n)
    val md = MessageDigest.getInstance("MD5")
    var i = 0
    while (i < n) {
      md.reset()
      var j = 0
      while (j < k) {
        if (j > 0) md.update(' '.toByte)
        val t = toks.getUTF8String(i + j)
        if (t != null) md.update(t.getBytes)
        j += 1
      }
      val d = md.digest()
      hs(i) = ((d(0) & 0xffL) << 24) | ((d(1) & 0xffL) << 16) |
        ((d(2) & 0xffL) << 8) | (d(3) & 0xffL)
      i += 1
    }
    val out = new java.util.ArrayList[Any]()
    if (n < w) {
      // single whole-array window: rightmost minimum
      var best = 0
      var j = 1
      while (j < n) { if (hs(j) <= hs(best)) best = j; j += 1 }
      out.add(InternalRow(best + 1, hs(best)))
    } else {
      // monotonic deque of indices, values strictly increasing front→back;
      // >= pop on insert makes the front the RIGHTMOST occurrence of the
      // window minimum (the tie rule both the oracle and the spec pin).
      val dq = new Array[Int](n)
      var head = 0
      var tail = 0
      var last = -1
      var j = 0
      while (j < n) {
        while (tail > head && hs(dq(tail - 1)) >= hs(j)) tail -= 1
        dq(tail) = j
        tail += 1
        val start = j - w + 1
        if (start >= 0) {
          while (dq(head) < start) head += 1
          val sel = dq(head)
          if (sel != last) {
            out.add(InternalRow(sel + 1, hs(sel)))
            last = sel
          }
        }
        j += 1
      }
    }
    new GenericArrayData(out.toArray)
  }
}

object WinnowExprs {
  /** Fingerprint array column; see [[WinnowFingerprints]] for semantics. */
  def winnowFingerprints(tokens: Column, k: Int, w: Int): Column =
    ExpressionUtils.column(
      WinnowFingerprints(ExpressionUtils.expression(tokens), k, w))
}
