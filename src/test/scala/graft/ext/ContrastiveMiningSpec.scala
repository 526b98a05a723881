package graft.ext

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Contracts for [[ContrastiveMining]] — positives / hard negatives. */
class ContrastiveMiningSpec extends SparkSpec {

  // 2-D vectors: label 0 clusters near (1,0), label 1 near (0,1);
  // id 10 is the "boundary" label-1 vector closest to the label-0 axis.
  private val rows: Seq[(Long, Int, Seq[Float])] = Seq(
    (1L, 0, Seq(1.0f, 0.0f)),
    (2L, 0, Seq(0.9f, 0.1f)),
    (3L, 0, Seq(0.8f, 0.2f)),
    (4L, 0, Seq(0.7f, 0.3f)),
    (10L, 1, Seq(0.6f, 0.8f)),
    (11L, 1, Seq(0.1f, 0.9f)),
    (12L, 1, Seq(0.0f, 1.0f)))

  private def corpus: DataFrame = {
    val s = spark; import s.implicits._
    rows.toDF("id", "lab", "vec")
  }

  private def mine(anchorIds: Seq[Long], kPos: Int, kNeg: Int,
      parts: Int = 1): Seq[(Long, String, Int, Long, Double)] = {
    val base = if (parts > 1) corpus.repartition(parts) else corpus
    val anchors = base.where(col("id").isin(anchorIds: _*))
      .select(col("id").as("aid"), col("vec").as("av"), col("lab").as("alab"))
    ContrastiveMining.minePairs(base, anchors, "id", "vec", "lab",
        "aid", "av", "alab", kPos, kNeg)
      .orderBy("aid", "role", "rank")
      .collect()
      .map(r => (r.getLong(0), r.getString(1), r.getInt(2), r.getLong(3),
        r.getDouble(4)))
      .toSeq
  }

  test("roles, ordering, self-exclusion, and k caps on a known geometry") {
    val got = mine(Seq(1L), kPos = 2, kNeg = 2)
    val pos = got.filter(_._2 == "positive")
    val neg = got.filter(_._2 == "hard_negative")
    // positives: the two label-0 vectors closest to (1,0), anchor excluded
    assert(pos.map(_._4) == Seq(2L, 3L))
    // hard negatives: label-1 vectors by similarity — the boundary vector
    // id 10 (cos to (1,0) = 0.6) must outrank the near-axis ones
    assert(neg.map(_._4) == Seq(10L, 11L))
    // similarity is non-increasing within each role
    assert(pos.map(_._5) == pos.map(_._5).sorted.reverse)
    assert(neg.map(_._5) == neg.map(_._5).sorted.reverse)
  }

  test("kPos/kNeg cap each role independently; short groups return what exists") {
    val got = mine(Seq(1L), kPos = 100, kNeg = 1)
    assert(got.count(_._2 == "positive") == 3, "only 3 same-label others exist")
    assert(got.count(_._2 == "hard_negative") == 1)
  }

  test("partition-invariant and anchor-set batched") {
    val a = mine(Seq(1L, 12L), 2, 2)
    val b = mine(Seq(1L, 12L), 2, 2, parts = 5)
    assert(a == b)
    assert(a.map(_._1).distinct.sorted == Seq(1L, 12L))
  }
}
