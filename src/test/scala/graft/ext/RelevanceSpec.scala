package graft.ext

import graft.SparkSpec

class RelevanceSpec extends SparkSpec {
  import spark.implicits._

  // tiny corpus with hand-checkable BM25 structure
  private def corpus = Seq(
    (1L, "spark spark spark engine"),  // high tf for 'spark'
    (2L, "spark engine"),              // one hit, short doc
    (3L, "engine room"),               // no hit
    (4L, "spark spark engine engine engine engine engine engine") // high tf, long doc
  ).toDF("doc_id", "text")

  test("bm25TopK ranks by tf with length normalization and skips no-hit docs") {
    val got = Relevance.bm25TopK(corpus, "doc_id", "text", Seq("spark"), topK = 10)
      .as[(Long, Double)].collect()
    val ids = got.map(_._1)
    assert(ids.toSet === Set(1L, 2L, 4L)) // doc 3 has no query term
    // doc1 (tf=3, dl=4) must outrank doc2 (tf=1, dl=2) and doc4 (tf=2, dl=8)
    assert(ids.head === 1L)
    // scores strictly positive and non-increasing
    assert(got.forall(_._2 > 0))
    assert(got.map(_._2).sliding(2).forall(p => p.length < 2 || p(0) >= p(1)))
  }

  test("bm25TopK matches the closed-form score on a 1-term query") {
    val got = Relevance.bm25TopK(corpus, "doc_id", "text", Seq("spark"), topK = 10)
      .as[(Long, Double)].collect().toMap
    val n = 4.0; val df = 3.0; val k1 = 1.2; val b = 0.75
    val avgdl = (4 + 2 + 2 + 8) / 4.0
    val idf = math.log((n - df + 0.5) / (df + 0.5) + 1)
    def score(tf: Double, dl: Double): Double =
      BigDecimal(idf * tf * (k1 + 1) / (tf + k1 * (1 - b + b * dl / avgdl)))
        .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(math.abs(got(1L) - score(3, 4)) < 1e-9)
    assert(math.abs(got(2L) - score(1, 2)) < 1e-9)
    assert(math.abs(got(4L) - score(2, 8)) < 1e-9)
  }

  test("multi-term scores are the sum of per-term scores") {
    val two = Relevance.bm25TopK(corpus, "doc_id", "text", Seq("spark", "room"), topK = 10)
      .as[(Long, Double)].collect().toMap
    val sparkOnly = Relevance.bm25TopK(corpus, "doc_id", "text", Seq("spark"), topK = 10)
      .as[(Long, Double)].collect().toMap
    // docs 1/2/4 contain only 'spark' of the two terms: identical scores
    assert(two(1L) === sparkOnly(1L) && two(2L) === sparkOnly(2L) && two(4L) === sparkOnly(4L))
    assert(two.contains(3L)) // 'room' pulls doc 3 in
  }
}
