package graft.ext

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Aho–Corasick multi-pattern substring search (Aho & Corasick 1975) —
  * the badword-list primitive behind C4's "remove any page containing a
  * word on the list" rule ([[C4Filters]] documents the hook) and every
  * PII/blocklist scan: P patterns found in ONE pass over the text,
  * O(n + matches) per document, vs O(P·n) for P stacked `contains`
  * columns. At a 10⁴-entry blocklist over 100 TB the difference is the
  * whole job.
  *
  * Semantics: case-insensitive SUBSTRING match (exactly P per-pattern
  * `instr(lower(text), p) > 0` conjunctions — which is what the DuckDB
  * oracle recomputes); emits each matched pattern once per document.
  *
  * Scale shape: the automaton builds ONCE on the driver (pattern lists
  * are bounded — a blocklist is thousands of entries, never
  * corpus-sized), ships to executors as a broadcast-sized task binary,
  * and `matches` is a NARROW mapPartitions over the scan — no shuffle,
  * no per-row automaton rebuild, no row amplification beyond actual
  * matches. mapPartitions is justified here by the per-document stateful
  * scan loop (the Multimodal/BpeTrainer-encoder class: a JDK-level
  * algorithm no Column expression expresses).
  */
object MultiPattern {

  /** Immutable Aho–Corasick automaton over lowercased patterns. */
  final class Automaton private[MultiPattern] (
      gotoMaps: Array[scala.collection.immutable.Map[Char, Int]],
      fail: Array[Int],
      out: Array[Array[Int]],
      val patterns: IndexedSeq[String]) extends Serializable {

    /** Distinct indices of patterns occurring in `text` (caller
      * lowercases). */
    def findDistinct(text: String): Array[Int] = {
      val seen = new java.util.BitSet(patterns.size)
      var s = 0
      var i = 0
      while (i < text.length) {
        val c = text.charAt(i)
        while (s != 0 && !gotoMaps(s).contains(c)) s = fail(s)
        s = gotoMaps(s).getOrElse(c, 0)
        val o = out(s)
        var j = 0
        while (j < o.length) { seen.set(o(j)); j += 1 }
        i += 1
      }
      val res = new Array[Int](seen.cardinality())
      var k = 0; var b = seen.nextSetBit(0)
      while (b >= 0) { res(k) = b; k += 1; b = seen.nextSetBit(b + 1) }
      res
    }
  }

  /** ASCII-range-only case fold: 'A'..'Z' -> 'a'..'z', every other char
    * untouched. Java's locale fold and SQL `lower()` disagree on
    * length-changing/special folds (dotted-I, sharp-s), which would let
    * the automaton diverge from the `instr(lower(text), p)` oracle twin
    * outside ASCII; folding BOTH patterns and text with the same ASCII
    * map makes match semantics engine-identical by construction —
    * case-insensitive over ASCII letters, case-SENSITIVE (literal)
    * beyond, deterministic everywhere. */
  private[ext] def asciiLower(s: String): String = {
    var i = 0
    var same = true
    while (same && i < s.length) {
      val c = s.charAt(i)
      if (c >= 'A' && c <= 'Z') same = false else i += 1
    }
    if (same) s
    else {
      val a = s.toCharArray
      var j = i
      while (j < a.length) {
        val c = a(j)
        if (c >= 'A' && c <= 'Z') a(j) = (c + 32).toChar
        j += 1
      }
      new String(a)
    }
  }

  /** Build the automaton: trie + BFS failure links with merged outputs
    * (the textbook construction). Patterns are ASCII-lowercased
    * ([[asciiLower]]), must be non-empty, and must be distinct after
    * folding. */
  def automaton(rawPatterns: Seq[String]): Automaton = {
    val patterns = rawPatterns.map(asciiLower).toIndexedSeq
    require(patterns.nonEmpty, "pattern list must be non-empty")
    require(patterns.forall(_.nonEmpty), "patterns must be non-empty strings")
    require(patterns.distinct.size == patterns.size,
      "patterns must be distinct after ASCII case folding")

    val gotoB = scala.collection.mutable.ArrayBuffer(
      scala.collection.mutable.Map.empty[Char, Int])
    val outB = scala.collection.mutable.ArrayBuffer(
      scala.collection.mutable.Set.empty[Int])
    patterns.zipWithIndex.foreach { case (p, pi) =>
      var s = 0
      p.foreach { c =>
        s = gotoB(s).getOrElseUpdate(c, {
          gotoB += scala.collection.mutable.Map.empty[Char, Int]
          outB += scala.collection.mutable.Set.empty[Int]
          gotoB.size - 1
        })
      }
      outB(s) += pi
    }
    val n = gotoB.size
    val fail = new Array[Int](n)
    val queue = scala.collection.mutable.Queue.empty[Int]
    gotoB(0).values.foreach { v => fail(v) = 0; queue += v }
    while (queue.nonEmpty) {
      val u = queue.dequeue()
      gotoB(u).foreach { case (c, v) =>
        var f = fail(u)
        while (f != 0 && !gotoB(f).contains(c)) f = fail(f)
        fail(v) = if (gotoB(f).contains(c) && gotoB(f)(c) != v) gotoB(f)(c) else 0
        outB(v) ++= outB(fail(v))
        queue += v
      }
    }
    new Automaton(gotoB.map(_.toMap).toArray, fail,
      outB.map(_.toArray.sorted).toArray, patterns)
  }

  /** (idCol, pattern) rows: each pattern matched by each document, once.
    * One narrow pass; the id column must be integral (cast to long). */
  def matches(docs: DataFrame, idCol: String, textCol: String,
      patterns: Seq[String]): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    val ac = automaton(patterns)
    docs.select(col(idCol).cast("long"), col(textCol))
      .as[(Long, String)]
      .mapPartitions { rows =>
        rows.flatMap { case (id, text) =>
          if (text == null) Iterator.empty
          else ac.findDistinct(MultiPattern.asciiLower(text))
            .iterator.map(pi => (id, ac.patterns(pi)))
        }
      }
      .toDF(idCol, "pattern")
  }
}
