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
}
