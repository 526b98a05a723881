package graft.ext

import org.apache.spark.sql.functions._

import graft.SparkSpec

class TextQualitySpec extends SparkSpec {
  import spark.implicits._

  // One doc per rule violation + one clean doc (27 words, stop words,
  // normal lengths, no symbols/bullets/ellipses).
  private val clean =
    "the quick brown fox jumps over a lazy dog and then runs far away " +
      "to the old green hill where a small bird sings of summer days"
  private def docs = Seq(
    (1L, clean),                                             // keep
    (2L, "too short to pass"),                               // r_words (4)
    (3L, clean + " ## ## ## ## ## ## ## ## ## ## ## ##"),    // r_symbols
    (4L, "- one\n- two\n- three\n- four\n- five\n- six"),    // r_bullets (+words)
    (5L, clean.replace(" days", " days...\nmore...\nyet more...")), // r_ellipsis
    (6L, Seq.fill(30)("word").mkString(" "))                 // r_stops (0 stop words)
  ).toDF("doc_id", "text")

  test("gopher rules flag each violation class and keep the clean doc") {
    val got = TextQuality.gopherFilter(docs, "doc_id", "text")
      .select("doc_id", "r_words", "r_symbols", "r_bullets", "r_ellipsis",
        "r_stops", "keep")
      .as[(Long, Boolean, Boolean, Boolean, Boolean, Boolean, Boolean)]
      .collect().map(r => r._1 -> r).toMap

    assert(got(1L) === ((1L, true, true, true, true, true, true)))
    assert(!got(2L)._2 && !got(2L)._7)           // word count
    assert(!got(3L)._3 && !got(3L)._7)           // symbol ratio
    assert(!got(4L)._4 && !got(4L)._7)           // bullet lines
    assert(!got(5L)._5 && !got(5L)._7)           // ellipsis lines
    assert(!got(6L)._6 && !got(6L)._7)           // stop-word floor
  }

  test("gopher features are computed, not defaulted") {
    val row = TextQuality.gopherFilter(docs, "doc_id", "text")
      .filter(col("doc_id") === 1L).head()
    assert(row.getAs[Long]("word_count") === 27L)
    assert(row.getAs[Long]("stop_word_count") >= 4L)
    assert(row.getAs[Double]("alpha_word_frac") === 1.0)
    assert(row.getAs[Double]("symbol_ratio") === 0.0)
  }

  // Perplexity: a corpus where doc 1 is the repeated modal phrase (its
  // bigrams dominate the LM → low perplexity) and doc 3 is made of
  // bigrams seen only once (high perplexity).
  private def pplDocs = Seq(
    (1L, "a b a b a b a b a b"),
    (2L, "a b a b c d c d c d"),
    (3L, "e f g h i j k l m n")
  ).toDF("doc_id", "text")

  test("perplexity orders modal phrasing below one-off phrasing") {
    val got = TextQuality.perplexityBuckets(pplDocs, "doc_id", "text")
      .select("doc_id", "n_bigrams", "ppl", "bucket")
      .as[(Long, Long, Double, String)].collect().map(r => r._1 -> r).toMap
    assert(got.values.forall(_._2 === 9L))
    assert(got(1L)._3 < got(3L)._3)
    assert(got(1L)._4 === "head" && got(3L)._4 === "tail")
    assert(got(2L)._4 === "middle")
  }

  test("terciles cover all docs and are deterministic") {
    val a = TextQuality.perplexityBuckets(
      graft.Tables.documents(spark, sf0001).limit(60), "doc_id", "text")
    val rows = a.collect()
    assert(rows.length === 60)
    val sizes = rows.groupBy(_.getAs[String]("bucket")).view.mapValues(_.length)
    assert(sizes("head") === 20 && sizes("middle") === 20 && sizes("tail") === 20)
    val b = TextQuality.perplexityBuckets(
      graft.Tables.documents(spark, sf0001).limit(60), "doc_id", "text")
    assert(b.collect().map(_.toString).sorted.toSeq ===
      rows.map(_.toString).sorted.toSeq)
  }
}
