package graft.ext

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** CorpusStats + Dedup.incrementalNew: boilerplate detection, vocabulary
  * ids, OOV accounting, and the incremental-ingest dedup contract. */
class CorpusStatsSpec extends SparkSpec {
  import spark.implicits._

  test("boilerplateFraction flags k-grams shared by >= minDocs docs") {
    // "a b c d e" appears in 3 docs → boilerplate at minDocs=3;
    // each doc's unique tail 5-grams are not.
    val docs = Seq(
      (1L, "a b c d e x1 y1 z1 w1 v1"),
      (2L, "a b c d e x2 y2 z2 w2 v2"),
      (3L, "a b c d e x3 y3 z3 w3 v3"),
      (4L, "p q r s t u4 v4 w4 x4 y4")).toDF("doc_id", "text")
    val out = CorpusStats.boilerplateFraction(docs, "doc_id", "text", 5, 3)
      .orderBy("doc_id")
      .select("doc_id", "n_shingles", "n_boiler").as[(Long, Long, Long)].collect()
    // each doc has 6 distinct 5-grams; docs 1-3 share exactly one
    assert(out === Array((1L, 6L, 1L), (2L, 6L, 1L), (3L, 6L, 1L), (4L, 6L, 0L)))
  }

  test("buildVocab ids are contiguous, ordered by (count desc, token)") {
    val docs = Seq((1L, "b b b a a c"), (2L, "a c c")).toDF("doc_id", "text")
    val v = CorpusStats.buildVocab(docs, "text", 2)
      .select("token_id", "token", "cnt").as[(Int, String, Long)].collect().sorted
    // counts: a=3, b=3, c=3 → tie broken by token asc, cut to 2
    assert(v === Array((1, "a", 3L), (2, "b", 3L)))
  }

  test("oovRate counts tokens outside the vocabulary") {
    val docs = Seq(("en", "a b c d"), ("de", "a a x y")).toDF("lang", "text")
    val vocab = Seq("a", "b").toDF("token")
    val out = CorpusStats.oovRate(docs, "lang", "text", vocab)
      .select("lang", "n_tokens", "n_oov").as[(String, Long, Long)].collect().sorted
    assert(out === Array(("de", 4L, 2L), ("en", 4L, 2L)))
  }

  test("incrementalNew: unseen AND first-in-batch wins; rest flagged") {
    val seen = Seq((10L, "known text")).toDF("doc_id", "text")
    val incoming = Seq(
      (1L, "known text"),   // dup vs corpus
      (2L, "fresh text"),   // new
      (3L, "fresh text"),   // in-batch dup of 2
      (4L, "other text")    // new
    ).toDF("doc_id", "text")
    val out = Dedup.incrementalNew(incoming, seen, "doc_id", "text")
      .select("doc_id", "is_new").as[(Long, Boolean)].collect().sorted
    assert(out === Array((1L, false), (2L, true), (3L, false), (4L, true)))
  }

  test("incrementalNew is idempotent: re-ingesting survivors yields none new") {
    val docs = spark.read.parquet(s"$sf0001/documents.parquet")
      .select($"doc_id", $"text")
    val first = Dedup.incrementalNew(docs, docs.limit(0), "doc_id", "text")
      .filter($"is_new").drop("is_new", "__key")
    val second = Dedup.incrementalNew(first, first, "doc_id", "text")
    assert(second.filter($"is_new").count() === 0)
  }
}
