package graft.ext

import org.apache.spark.sql.execution.exchange.ShuffleExchangeExec

import graft.SparkSpec

/** Contracts for [[MultiPattern]] — Aho–Corasick ≡ naive contains. */
class MultiPatternSpec extends SparkSpec {

  private def naive(text: String, patterns: Seq[String]): Set[String] = {
    val t = MultiPattern.asciiLower(text)
    patterns.map(MultiPattern.asciiLower).filter(t.contains).toSet
  }

  private def run(docs: Seq[(Long, String)], patterns: Seq[String],
      parts: Int = 1): Map[Long, Set[String]] = {
    val s = spark; import s.implicits._
    val df0 = docs.toDF("doc_id", "text")
    val df = if (parts > 1) df0.repartition(parts) else df0
    MultiPattern.matches(df, "doc_id", "text", patterns)
      .collect()
      .map(r => r.getLong(0) -> r.getString(1))
      .groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
      .withDefaultValue(Set.empty)
  }

  test("matches == naive contains, incl the classic he/she/his/hers overlap") {
    val patterns = Seq("he", "she", "his", "hers")
    val docs = Seq(
      1L -> "ushers gather",     // "ushers" contains she, he, hers
      2L -> "this history",      // his twice -> once
      3L -> "HERS and HIS",      // case-insensitive
      4L -> "nothing matching",  // "nothing" contains... no: n-o-t-h-i-n-g -> no
      5L -> "")
    for ((id, text) <- docs) {
      val got = run(docs, patterns)(id)
      assert(got == naive(text, patterns), s"doc $id")
    }
  }

  test("ASCII fold contract: A-Z fold, non-ASCII letters match literally") {
    // ASCII letters fold on both sides; é is untouched, É never equals é —
    // the engine-identical contract that keeps the automaton in lockstep
    // with the `instr(lower(text), p)` oracle on ASCII corpora and
    // deterministic (case-sensitive) beyond.
    val patterns = Seq("caf\u00e9")
    val got = run(Seq(1L -> "Caf\u00e9 culture", 2L -> "CAF\u00c9 culture"), patterns)
    assert(got(1L) == Set("caf\u00e9"), "ASCII-prefix fold must still match")
    assert(got(2L) == Set.empty, "non-ASCII uppercase must NOT fold")
  }

  test("substring semantics cross word boundaries, phrases match exactly") {
    val patterns = Seq("tab", "data table", "end.start")
    val docs = Seq(
      1L -> "the data table is big",  // tab (inside table), data table
      2L -> "database stability",     // tab twice (database? no - d-a-t-a-b: 'tab' at pos 3; stability has 'tab') -> once
      3L -> "end.start of line")
    for ((id, text) <- docs)
      assert(run(docs, patterns)(id) == naive(text, patterns), s"doc $id")
  }

  test("property sweep: random small-alphabet docs vs naive, multi-partition") {
    val rnd = new scala.util.Random(42)
    val patterns = Seq("ab", "aba", "bab", "bb", "abba", "c")
    val docs = (1L to 60L).map { i =>
      i -> (0 until 3 + rnd.nextInt(20)).map(_ => "ab" (rnd.nextInt(2))).mkString
    }
    val got = run(docs, patterns, parts = 7)
    for ((id, text) <- docs)
      assert(got(id) == naive(text, patterns), s"doc $id: $text")
  }

  test("automaton construction refuses empty and duplicate patterns") {
    intercept[IllegalArgumentException](MultiPattern.automaton(Seq.empty))
    intercept[IllegalArgumentException](MultiPattern.automaton(Seq("a", "")))
    intercept[IllegalArgumentException](MultiPattern.automaton(Seq("A", "a")))
  }

  test("the scan is narrow: no shuffle in the matches plan") {
    val s = spark; import s.implicits._
    val df = Seq(1L -> "a").toDF("doc_id", "text")
    val plan = MultiPattern.matches(df, "doc_id", "text", Seq("a"))
      .queryExecution.executedPlan
    assert(plan.collect { case e: ShuffleExchangeExec => e }.isEmpty)
  }
}
