package graft.ext

import org.apache.spark.sql.functions._

import graft.{SparkSpec, Tables}

/** The indexed BM25 must equal the per-query scan operator exactly, and
  * the stored form must serve queries through a term-pruned scan. */
class InvertedIndexSpec extends SparkSpec {

  private lazy val docs = Tables.documents(spark, sf0001)
    .select(col("doc_id"), col("text"))
  private val terms = Seq("spark", "window", "hash")

  test("indexed bm25 ≡ Relevance.bm25TopK, row for row") {
    val idx = InvertedIndex.build(docs, "doc_id", "text")
    try {
      val got = InvertedIndex.bm25(idx, terms, topK = 20)
      val want = Relevance.bm25TopK(docs, "doc_id", "text", terms, topK = 20)
      assert(got.collect().toSeq === want.collect().toSeq,
        "index path must be the same scorer with the corpus pass hoisted")
      // different terms exercise a different postings slice
      val g2 = InvertedIndex.bm25(idx, Seq("join", "filter"), topK = 10)
      val w2 = Relevance.bm25TopK(docs, "doc_id", "text",
        Seq("join", "filter"), topK = 10)
      assert(g2.collect().toSeq === w2.collect().toSeq)
    } finally InvertedIndex.drop(idx)
  }

  test("stored index round-trips and the query term predicate reaches the scan") {
    val built = InvertedIndex.build(docs, "doc_id", "text")
    val dir = java.nio.file.Files.createTempDirectory("graft-inv").toString
    try {
      IndexStore.writeInverted(built, dir)
      val loaded = IndexStore.loadInverted(spark, dir)
      assert(loaded.nDocs === built.nDocs)
      assert(math.abs(loaded.avgdl - built.avgdl) < 1e-12)
      val a = InvertedIndex.bm25(loaded, terms, topK = 20)
      val b = InvertedIndex.bm25(built, terms, topK = 20)
      assert(a.collect().toSeq === b.collect().toSeq)
      // the literal IN must be pushed into the postings parquet scan
      val explained = a.queryExecution.explainString(
        org.apache.spark.sql.execution.ExplainMode.fromString("formatted"))
      val pushed = explained.linesIterator
        .filter(_.contains("PushedFilters")).mkString("\n")
      assert(pushed.contains("In(term"), s"term predicate not pushed:\n$pushed")
    } finally InvertedIndex.drop(built)
  }

  test("kind mismatch refused for the new kinds") {
    val built = InvertedIndex.build(docs, "doc_id", "text")
    val dir = java.nio.file.Files.createTempDirectory("graft-inv2").toString
    try {
      IndexStore.writeInverted(built, dir)
      val e = intercept[IllegalArgumentException] {
        IndexStore.loadMinhash(spark, dir)
      }
      assert(e.getMessage.contains("inverted") && e.getMessage.contains("minhash"))
    } finally InvertedIndex.drop(built)
  }

  test("appendInverted ≡ rebuild: postings, df, scalars, and scores bit-equal") {
    val base = docs.where(col("doc_id") < 40)
    val inc1 = docs.where(col("doc_id") >= 40 && col("doc_id") < 48)
    val inc2 = docs.where(col("doc_id") >= 48)
    val built = InvertedIndex.build(base, "doc_id", "text")
    val dir = java.nio.file.Files.createTempDirectory("graft-invapp").toString
    val rebuilt = InvertedIndex.build(docs, "doc_id", "text")
    try {
      IndexStore.writeInverted(built, dir)
      // two chained appends — the steady-state cadence, not one lucky fold
      IndexStore.appendInverted(inc1, "doc_id", "text", dir)
      IndexStore.appendInverted(inc2, "doc_id", "text", dir)
      val appended = IndexStore.loadInverted(spark, dir)
      assert(appended.nDocs === rebuilt.nDocs)
      assert(appended.sumDl === rebuilt.sumDl)
      assert(appended.avgdl === rebuilt.avgdl,
        "avgdl must fold exactly (sumDl counting), not approximately")
      // df table: per-increment rows re-aggregate to the rebuild's df
      val dfGot = appended.docFreq.collect()
        .map(r => r.getString(0) -> r.getLong(1)).toMap
      val dfWant = rebuilt.docFreq.collect()
        .map(r => r.getString(0) -> r.getLong(1)).toMap
      assert(dfGot === dfWant)
      // scores through the reloaded bundle are bit-identical to rebuild
      for (ts <- Seq(terms, Seq("join", "filter"))) {
        val a = InvertedIndex.bm25(appended, ts, topK = 20).collect().toSeq
        val b = InvertedIndex.bm25(rebuilt, ts, topK = 20).collect().toSeq
        assert(a === b, s"terms $ts diverged after append")
      }
    } finally { InvertedIndex.drop(built); InvertedIndex.drop(rebuilt) }
  }

  // ---- positional phrase search -------------------------------------

  /** Brute-force phrase occurrence counter over raw token sequences. */
  private def bruteCount(rows: Seq[(Long, String)],
      phrase: Seq[String]): Map[Long, Long] =
    rows.flatMap { case (id, text) =>
      val ts = text.trim.toLowerCase.split("\\s+").toSeq
      val n = ts.sliding(phrase.size).count(_ == phrase)
      if (n > 0) Some(id -> n.toLong) else None
    }.toMap

  private val phraseDocs = Seq(
    1L -> "a b c a b c a b",   // "a b": 3, "a b c": 2
    2L -> "a a a a",           // overlapping "a a": 3
    3L -> "a b a b a",         // "a b a": 2 (overlapping, duplicate term)
    4L -> "c c c b",           // no "a b"
    5L -> "b a")               // reversed: no "a b"

  private def phraseDf = {
    val s = spark; import s.implicits._
    phraseDocs.toDF("doc_id", "text")
  }

  test("phraseCount ≡ brute-force sliding window, incl overlaps and duplicate terms") {
    val pos = InvertedIndex.buildPositional(phraseDf, "doc_id", "text")
    for (p <- Seq(Seq("a", "b"), Seq("a", "b", "c"), Seq("a", "a"),
        Seq("a", "b", "a"), Seq("c"), Seq("z", "b"))) {
      val got = InvertedIndex.phraseCount(pos, p)
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      assert(got == bruteCount(phraseDocs, p), s"phrase $p")
    }
  }

  test("stored positional postings serve phrases through a term-pruned scan") {
    val pos = InvertedIndex.buildPositional(phraseDf, "doc_id", "text")
    val dir = java.nio.file.Files.createTempDirectory("graft-pos").toString
    IndexStore.writePositional(pos, dir)
    val loaded = IndexStore.loadPositional(spark, dir)
    val q = InvertedIndex.phraseCount(loaded, Seq("a", "b", "c"))
    assert(q.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap ==
      bruteCount(phraseDocs, Seq("a", "b", "c")))
    val explained = q.queryExecution.explainString(
      org.apache.spark.sql.execution.ExplainMode.fromString("formatted"))
    val pushed = explained.linesIterator
      .filter(_.contains("PushedFilters")).mkString("\n")
    assert(pushed.contains("In(term"), s"term predicate not pushed:\n$pushed")
    // cross-kind refusal
    val e = intercept[IllegalArgumentException] {
      IndexStore.loadInverted(spark, dir)
    }
    assert(e.getMessage.contains("positional"))
  }

  test("appendPositional ≡ rebuild: phrase counts equal over base + increments") {
    val s = spark; import s.implicits._
    val baseRows = phraseDocs.take(3)
    val incRows = phraseDocs.drop(3)
    val dir = java.nio.file.Files.createTempDirectory("graft-posapp").toString
    IndexStore.writePositional(
      InvertedIndex.buildPositional(baseRows.toDF("doc_id", "text"),
        "doc_id", "text"), dir)
    IndexStore.appendPositional(incRows.take(1).toDF("doc_id", "text"),
      "doc_id", "text", dir)
    IndexStore.appendPositional(incRows.drop(1).toDF("doc_id", "text"),
      "doc_id", "text", dir)
    val loaded = IndexStore.loadPositional(spark, dir)
    for (p <- Seq(Seq("a", "b"), Seq("a", "b", "c"), Seq("a", "a"),
        Seq("c"), Seq("z", "b"))) {
      val got = InvertedIndex.phraseCount(loaded, p)
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      assert(got == bruteCount(phraseDocs, p), s"phrase $p after append")
    }
    // row-set union: appended postings ≡ full rebuild's postings
    val rebuilt = InvertedIndex.buildPositional(phraseDf, "doc_id", "text")
      .collect().map(r => (r.getString(0), r.getLong(1), r.getInt(2))).sorted
    val gotRows = loaded
      .collect().map(r => (r.getString(0), r.getLong(1), r.getInt(2))).sorted
    assert(gotRows.toSeq === rebuilt.toSeq)
  }
}
