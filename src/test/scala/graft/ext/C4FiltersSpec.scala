package graft.ext

import org.apache.spark.sql.execution.exchange.ShuffleExchangeExec
import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Contracts for [[C4Filters]] — the C4 line-level cleaning battery. */
class C4FiltersSpec extends SparkSpec {

  private def run(rows: Seq[(Long, String)], minWords: Int = 5,
      minKept: Int = 3): Map[Long, (Int, Int, Boolean, String)] = {
    val s = spark; import s.implicits._
    C4Filters.c4Filter(rows.toDF("doc_id", "text"), "doc_id", "text",
        minWords, minKept)
      .collect()
      .map(r => r.getLong(0) ->
        ((r.getInt(1), r.getInt(2), r.getBoolean(3), r.getString(4))))
      .toMap
  }

  test("line rules: terminal punctuation, word count, javascript") {
    val doc = Seq(
      "one two three four five.",     // kept: 5 words, period
      "one two three four five!",     // kept: bang
      "one two three four five?",     // kept: question
      "he said \"one two three four\"", // kept: closing quote, 6 words
      "one two three four five",      // dropped: no terminal punct
      "one two three four.",          // dropped: 4 words < 5
      "enable JavaScript to view.",   // dropped: javascript (ci)
      "",                             // dropped: empty
      "trailing spaces count here too.   " // kept: rtrim before punct check
    ).mkString("\n")
    val got = run(Seq(1L -> doc))
    val (nLines, nKept, keep, filtered) = got(1L)
    assert(nLines == 9)
    assert(nKept == 5)
    assert(keep)
    assert(filtered == Seq(
      "one two three four five.",
      "one two three four five!",
      "one two three four five?",
      "he said \"one two three four\"",
      "trailing spaces count here too.   ").mkString("\n"))
  }

  test("page rules: min surviving lines, lorem ipsum, curly brace") {
    val three = Seq.fill(3)("one two three four five.").mkString("\n")
    val two = Seq.fill(2)("one two three four five.").mkString("\n")
    val got = run(Seq(
      1L -> three,
      2L -> two,
      3L -> (three + "\nsome Lorem Ipsum filler"),
      4L -> (three + "\nvar f = function() {")))
    assert(got(1L)._3)
    assert(!got(2L)._3, "fewer than 3 surviving lines")
    assert(!got(3L)._3, "lorem ipsum page drop (case-insensitive)")
    assert(!got(4L)._3, "curly brace page drop")
    // the dropped pages still report their edited text + counts
    assert(got(3L)._2 == 3 && got(4L)._2 == 3)
  }

  test("minWords and minKeptLines are real knobs") {
    val doc = "one two three.\none two three four five."
    assert(run(Seq(1L -> doc), minWords = 3, minKept = 2)(1L)._3)
    assert(!run(Seq(1L -> doc), minWords = 5, minKept = 2)(1L)._3)
    assert(!run(Seq(1L -> doc), minWords = 3, minKept = 3)(1L)._3)
  }

  test("whole operator is one exchange-free codegen projection") {
    val s = spark; import s.implicits._
    val df = C4Filters.c4Filter(
      Seq(1L -> "a b c d e.").toDF("doc_id", "text"), "doc_id", "text")
    val shuffles = df.queryExecution.executedPlan.collect {
      case e: ShuffleExchangeExec => e
    }
    assert(shuffles.isEmpty, "c4Filter must not shuffle")
  }
}
