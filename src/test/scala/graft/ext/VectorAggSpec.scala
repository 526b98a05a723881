package graft.ext

import org.apache.spark.sql.functions._

import graft.SparkSpec

class VectorAggSpec extends SparkSpec {
  import spark.implicits._

  test("centroids = per-dimension mean, dimensions in order") {
    val df = Seq(
      ("a", Seq(1.0f, 2.0f, 30.0f)),
      ("a", Seq(3.0f, 4.0f, 10.0f)),
      ("b", Seq(10.0f, 20.0f, 0.0f))
    ).toDF("label", "vec")
    val got = VectorAgg.centroids(df, "label", "vec")
      .as[(String, Seq[Double])].collect().toMap
    assert(got("a") === Seq(2.0, 3.0, 20.0))
    assert(got("b") === Seq(10.0, 20.0, 0.0))
  }

  test("centroids on real embeddings: one row per label, full width, unit-scale check") {
    val emb = graft.Tables.load(spark, sf0001, "embeddings")
    val nLabels = emb.select("label").distinct().count()
    val dim = emb.select(size(col("embedding"))).head().getInt(0)
    val got = VectorAgg.centroids(emb, "label", "embedding")
    assert(got.count() === nLabels)
    assert(got.select(size(col("centroid"))).distinct().head().getInt(0) === dim)
    // a centroid of unit-ish vectors has norm <= ~1 and > 0
    val norms = got.select(sqrt(aggregate(col("centroid"), lit(0.0),
      (acc, x) => acc + x * x))).as[Double].collect()
    assert(norms.forall(n => n > 0.0 && n <= 1.5))
  }
}
