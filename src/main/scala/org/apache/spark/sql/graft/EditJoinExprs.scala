package org.apache.spark.sql.graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression, XXH64}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.classic.ExpressionUtils
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Deletion neighborhood of a string: the XXH64 hashes of every variant
  * obtained by deleting at most `d` characters (0 deletions = the string
  * itself), deduplicated. The candidate-generation key family for EXACT
  * edit-distance joins (Mor & Fraenkel 1982; FastSS, Bocek et al. 2007;
  * the SymSpell spell-checker index): if lev(s, t) ≤ d then an optimal
  * alignment's matched positions form a common subsequence reachable from
  * BOTH strings by ≤ d deletions (each edit op consumes ≤ 1 position of
  * each side), so two strings within distance d ALWAYS share a variant —
  * candidate generation has zero false negatives, and false positives
  * (including the vanishingly rare 64-bit hash collision) are removed by
  * the exact `levenshtein` verify that follows. Variant count is
  * Σ_{i≤d} C(len, i) — quadratic in length at d=2 — so the operator's
  * documented domain is SHORT ATTRIBUTE STRINGS (names, titles, codes),
  * the entity-resolution case, never document bodies.
  *
  * Character-level (code-point) deletions, matching `levenshtein`'s
  * code-point semantics. Hashes, not variant strings, leave the
  * expression: 8 bytes per key regardless of attribute length.
  */
case class DeletionNeighborhood(child: Expression, d: Int) extends UnaryExpression {
  require(d >= 0 && d <= 3, "deletion distance must be in [0, 3]")
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "deletion_neighborhood"

  override def nullSafeEval(input: Any): Any =
    DeletionNeighborhood.variants(input.asInstanceOf[UTF8String], d)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"org.apache.spark.sql.graft.DeletionNeighborhood.variants($c, $d)")

  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}

object DeletionNeighborhood {
  private val SEED = 42L

  /** All ≤d-deletion variants of `s`, hashed and deduped. Recursion depth
    * ≤ d ≤ 3; at each level one code point is removed. Work buffer is a
    * code-point array so supplementary-plane text deletes whole characters.
    */
  def variants(s: UTF8String, d: Int): GenericArrayData = {
    val str = s.toString
    val cps = str.codePoints().toArray
    val seen = new java.util.HashSet[Long]()
    val out = new java.util.ArrayList[java.lang.Long]()
    def emit(arr: Array[Int]): Unit = {
      val v = UTF8String.fromString(new String(arr, 0, arr.length))
      val h = XXH64.hashUTF8String(v, SEED)
      if (seen.add(h)) out.add(h)
    }
    def rec(arr: Array[Int], remaining: Int, from: Int): Unit = {
      emit(arr)
      if (remaining > 0) {
        var i = from
        while (i < arr.length) {
          val nxt = new Array[Int](arr.length - 1)
          System.arraycopy(arr, 0, nxt, 0, i)
          System.arraycopy(arr, i + 1, nxt, i, arr.length - 1 - i)
          // deleting positions in nondecreasing index order visits each
          // subsequence once per distinct deletion SET (dedup by hash
          // handles equal-variant collisions from repeated characters)
          rec(nxt, remaining - 1, i)
          i += 1
        }
      }
    }
    rec(cps, d, 0)
    val res = new Array[Long](out.size())
    var i = 0
    while (i < res.length) { res(i) = out.get(i); i += 1 }
    new GenericArrayData(res)
  }

  def apply(c: Column, d: Int): Column =
    ExpressionUtils.column(DeletionNeighborhood(ExpressionUtils.expression(c), d))
}
