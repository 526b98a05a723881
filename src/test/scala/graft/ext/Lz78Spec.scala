package graft.ext

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Contracts for the LZ78 compressibility signal
  * ([[org.apache.spark.sql.graft.Lz78Phrases]]): equality against an
  * independently-written reference parser (nested-map trie walking
  * explicit phrase strings, vs the expression's flat long-keyed edge
  * map), closed-form families where the phrase count is provable, the
  * band-signal direction, and null/empty edges. */
class Lz78Spec extends SparkSpec {

  /** Independent single-node LZ78 parse — same definition, different
    * structure: a trie of nested maps, phrases collected explicitly. */
  private def refPhrases(s: String): Int = {
    final class Node { val kids = scala.collection.mutable.Map.empty[Char, Node] }
    val root = new Node
    var cur = root
    var count = 0
    for (c <- s) {
      cur.kids.get(c) match {
        case Some(n) => cur = n
        case None =>
          count += 1
          cur.kids(c) = new Node
          cur = root
      }
    }
    if (cur ne root) count += 1
    count
  }

  private def run(texts: Seq[String]): Seq[Int] = {
    val s = spark; import s.implicits._
    texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }
      .toDF("id", "text")
      .select(col("id"), TextAnalysis.lz78Phrases(col("text")).as("p"))
      .orderBy("id").collect().map(_.getInt(1)).toSeq
  }

  test("expression == independent reference across text families") {
    val rnd = new scala.util.Random(7)
    val texts = Seq(
      "", "a", "aa", "ab", "abab", "to be or not to be",
      "the the the the the the",
      ("na" * 64) + " batman",
      (1 to 40).map(i => s"line $i of a template").mkString("\n")) ++
      // random small-alphabet strings stress duplicate-phrase tails
      (1 to 40).map(_ => (0 until rnd.nextInt(200))
        .map(_ => "abc".charAt(rnd.nextInt(3))).mkString) ++
      // unicode: UTF-16 units are the parse alphabet on both sides
      Seq("héllo héllo héllo", "的是了在的是了在的是了在")
    assert(run(texts) == texts.map(refPhrases))
  }

  test("closed forms: a^n parses into ~sqrt(2n) phrases, distinct chars into n") {
    // a^n: phrases a, aa, aaa, ... -> k full phrases cover k(k+1)/2 chars
    val n = 5050 // = 100*101/2, exactly 100 full phrases
    assert(refPhrases("a" * n) == 100)
    assert(run(Seq("a" * n)).head == 100)
    // all-distinct characters: every char is its own phrase
    val distinct = (0 until 500).map(i => (0x4e00 + i).toChar).mkString
    assert(run(Seq(distinct)).head == 500)
  }

  test("band signal direction: repetition compresses, noise does not") {
    val s = spark; import s.implicits._
    val rnd = new scala.util.Random(11)
    val repetitive = "click here to subscribe " * 50
    val noise = (0 until 1200).map(_ => (33 + rnd.nextInt(90)).toChar).mkString
    val prose = "it was the best of times it was the worst of times it was " +
      "the age of wisdom it was the age of foolishness it was the epoch " +
      "of belief it was the epoch of incredulity " * 4
    val out = Seq((1L, repetitive), (2L, noise), (3L, prose))
      .toDF("id", "text")
      .select(col("id"), TextAnalysis.lz78Ratio(col("text")).as("r"))
      .orderBy("id").collect().map(_.getDouble(1))
    assert(out(0) < out(2) && out(2) < out(1),
      s"expected repetition < prose < noise, got ${out.toSeq}")
    // LZ78 phrase growth keeps even random printable ASCII near ~0.5 at
    // this length (phrases lengthen as the trie fills); the separation,
    // not an absolute ceiling, is the signal.
    assert(out(0) < 0.2 && out(1) > 0.45, s"tails not separated: ${out.toSeq}")
  }

  test("the feature pass is map-only: no exchange in the plan") {
    val s = spark; import s.implicits._
    val plan = Seq((1L, "some text")).toDF("id", "text")
      .select(col("id"), TextAnalysis.lz78Phrases(col("text")).as("p"),
        TextAnalysis.lz78Ratio(col("text")).as("r"))
      .queryExecution.executedPlan
    val exchanges = plan.collect {
      case e: org.apache.spark.sql.execution.exchange.ShuffleExchangeExec => e
    }
    assert(exchanges.isEmpty, "compressibility features must not shuffle")
  }

  test("nulls propagate; empty string is 0 phrases, ratio 0") {
    val s = spark; import s.implicits._
    val out = Seq((1L, null: String), (2L, ""))
      .toDF("id", "text")
      .select(col("id"), TextAnalysis.lz78Phrases(col("text")).as("p"),
        TextAnalysis.lz78Ratio(col("text")).as("r"))
      .orderBy("id").collect()
    assert(out(0).isNullAt(1) && out(0).isNullAt(2))
    assert(out(1).getInt(1) == 0 && out(1).getDouble(2) == 0.0)
  }
}
