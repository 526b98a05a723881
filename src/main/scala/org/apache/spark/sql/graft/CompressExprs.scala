package org.apache.spark.sql.graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.classic.ExpressionUtils

import org.apache.spark.sql.catalyst.expressions.{ExpectsInputTypes, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** LZ78 incremental-parse phrase count (Ziv & Lempel 1978, "Compression
  * of individual sequences via variable-rate coding") as a native
  * Catalyst expression — the compressibility signal of a document.
  *
  * Why this operator: compression ratio is a standard corpus-quality
  * signal (near-random byte soup parses into ~n phrases; templated/
  * repeated boilerplate parses into very few) and LZ78's phrase count
  * c(n) is ITS textbook-exact form: c(n)·(log c(n)+O(1)) bits is the
  * code length, and c(n)/n estimates the entropy rate. Unlike
  * gzip/Deflate (whose output depends on the zlib build, window tuning
  * and match heuristics), the LZ78 parse is a pure function of the
  * string — one canonical answer, reproducible across engines and
  * JVMs, so the spec can pin it against an independently-written
  * reference and any re-implementation agrees exactly.
  *
  * Definition (the one both this and the spec reference implement):
  * scan UTF-16 code units left to right, growing the current phrase
  * while (current-node, next-unit) exists in the dictionary trie; on
  * the first unseen extension, count one phrase, add the extension to
  * the trie, and restart at the root. A non-empty tail at end-of-input
  * counts as one final (possibly duplicate) phrase. Empty string → 0.
  *
  * Scale shape: single pass, O(n) expected (hash trie), bounded by the
  * document — a map-only projection like every TextAnalysis feature;
  * codegen emits one static call so the surrounding whole-stage span
  * stays intact.
  */
case class Lz78Phrases(child: Expression)
    extends UnaryExpression with ExpectsInputTypes with Serializable {

  override def prettyName: String = "lz78_phrases"
  override def inputTypes: Seq[AbstractDataType] = Seq(StringType)
  override def dataType: DataType = IntegerType

  override def nullSafeEval(s: Any): Any =
    Lz78Impl.phrases(s.asInstanceOf[UTF8String].toString)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a =>
      s"${ev.value} = org.apache.spark.sql.graft.Lz78Impl.phrases($a.toString());")

  override protected def withNewChildInternal(c: Expression): Expression =
    copy(child = c)
}

object Lz78Impl {

  /** Number of phrases in the LZ78 incremental parse of `s` (UTF-16
    * code units). Trie nodes are ints; edges live in one primitive-keyed
    * map under key (node << 16 | unit) — node ids stay below 2^47 for
    * any realistic document, far past the point the parse would have
    * exhausted memory anyway. */
  def phrases(s: String): Int = {
    val n = s.length
    if (n == 0) return 0
    val edges = new java.util.HashMap[java.lang.Long, Integer](64)
    var nextId = 1 // 0 = root
    var cur = 0
    var count = 0
    var i = 0
    while (i < n) {
      val key = java.lang.Long.valueOf((cur.toLong << 16) | s.charAt(i).toLong)
      val hit = edges.get(key)
      if (hit != null) {
        cur = hit.intValue()
      } else {
        count += 1
        edges.put(key, Integer.valueOf(nextId))
        nextId += 1
        cur = 0
      }
      i += 1
    }
    if (cur != 0) count += 1 // unterminated tail phrase
    count
  }
}

object CompressExprs {
  /** LZ78 phrase count of a string column; see [[Lz78Phrases]]. */
  def lz78Phrases(text: Column): Column =
    ExpressionUtils.column(Lz78Phrases(ExpressionUtils.expression(text)))
}
