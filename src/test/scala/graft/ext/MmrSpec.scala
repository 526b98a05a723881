package graft.ext

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Contracts for [[Mmr]] — greedy maximal marginal relevance. */
class MmrSpec extends SparkSpec {

  /** (id, rel, vec) candidates. */
  private def df(rows: Seq[(Long, Double, Seq[Float])]): DataFrame = {
    val s = spark; import s.implicits._
    rows.toDF("id", "rel", "vec")
  }

  private def rerank(rows: Seq[(Long, Double, Seq[Float])], k: Int,
      lambda: Double): Seq[(Int, Long)] =
    Mmr.rerank(spark, df(rows), "id", "rel", "vec", k, lambda)
      .collect().map(r => (r.getInt(0), r.getLong(1))).toSeq

  private val e1 = Seq(1f, 0f, 0f)
  private val e2 = Seq(0f, 1f, 0f)
  private val e3 = Seq(0f, 0f, 1f)

  test("lambda = 1 degrades to plain (rel desc, id) top-k") {
    val rows = Seq((1L, 0.9, e1), (2L, 0.8, e1), (3L, 0.95, e2),
      (4L, 0.8, e3), (5L, 0.1, e2))
    assert(rerank(rows, 3, 1.0) == Seq((1, 3L), (2, 1L), (3, 2L)))
  }

  test("array<double> vectors and integer relevance are accepted via analysis-time casts") {
    // round-8 advisor item: hard-coded getSeq[Float]/getDouble turned an
    // array<double> input into a runtime ClassCastException; the fix casts
    // in the initial select, so any numeric rel / float-or-double vec works
    val s = spark; import s.implicits._
    val d = Seq((1L, 9, Seq(1.0, 0.0)), (2L, 8, Seq(1.0, 0.0)), (3L, 8, Seq(0.0, 1.0)))
      .toDF("id", "rel", "vec") // rel: int, vec: array<double>
    val got = Mmr.rerank(spark, d, "id", "rel", "vec", 2, 0.5)
      .collect().map(r => (r.getInt(0), r.getLong(1))).toSeq
    // after picking 1, its duplicate 2 is max-penalized; 3 (orthogonal) wins
    assert(got == Seq((1, 1L), (2, 3L)))
  }

  test("duplicates of a selected item are maximally penalized") {
    // id 2 is an exact duplicate of id 1 (sim = 1) with nearly equal
    // relevance; with lambda < 1 the orthogonal id 3 must be picked
    // before the duplicate, even though its relevance is lower.
    val rows = Seq((1L, 0.90, e1), (2L, 0.89, e1), (3L, 0.60, e2))
    assert(rerank(rows, 2, 0.7) == Seq((1, 1L), (2, 3L)))
    // ...but with lambda = 1 relevance alone wins
    assert(rerank(rows, 2, 1.0) == Seq((1, 1L), (2, 2L)))
  }

  test("greedy equals an exhaustive step-by-step argmax on a known case") {
    // hand-computed: pick 1 (rel max); then score(2) = .7*.89 - .3*1 =
    // .323, score(3) = .7*.6 - .3*0 = .42, score(4) = .7*.55 - .3*0 =
    // .385 -> pick 3; then score(2) = .323, score(4) = .7*.55 - .3*0 =
    // .385 (orthogonal to both) -> pick 4.
    val rows = Seq((1L, 0.90, e1), (2L, 0.89, e1), (3L, 0.60, e2),
      (4L, 0.55, e3))
    assert(rerank(rows, 3, 0.7) == Seq((1, 1L), (2, 3L), (3, 4L)))
  }

  test("ties break by id; k > n returns all; zero vectors sim 0") {
    val rows = Seq((7L, 0.5, e1), (3L, 0.5, e2), (9L, 0.5, Seq(0f, 0f, 0f)))
    val got = rerank(rows, 10, 0.7)
    assert(got.size == 3)
    assert(got.head == ((1, 3L)), "equal rel: lowest id first")
  }

  test("oversized candidate lists are refused") {
    val rows = (1L to 50L).map(i => (i, 1.0 / i, e1))
    val e = intercept[IllegalArgumentException] {
      Mmr.rerank(spark, df(rows), "id", "rel", "vec", 5, 0.5,
        maxCandidates = 20)
    }
    assert(e.getMessage.contains("retriever"))
  }
}
