package graft.ext

import org.apache.spark.sql.functions._

import graft.SparkSpec

class QuantilesSpec extends SparkSpec {
  import spark.implicits._

  private val fracs = Seq(0.0, 0.25, 0.5, 0.9, 1.0)

  private def check(values: Seq[Double], shards: Int): Unit = {
    val df = values.toDF("v")
    val got = Quantiles.exactPercentiles(df, "v", fracs, shards)
      .select(explode(col("qs"))).as[Double].collect().toSeq
    val exp = df.agg(percentile(col("v"), lit(fracs.toArray)))
      .head().getSeq[Double](0)
    got.zip(exp).foreach { case (g, e) =>
      assert(math.abs(g - e) < 1e-9, s"got $got exp $exp (shards=$shards)")
    }
  }

  test("selection formulation matches Spark's percentile aggregate") {
    val rnd = new scala.util.Random(5)
    check(Seq.fill(1000)(rnd.nextDouble() * 100), shards = 0)
    check(Seq.fill(1000)(rnd.nextDouble() * 100), shards = 6)
  }

  test("heavy ties and tiny inputs interpolate identically") {
    check(Seq.fill(500)(rnd3(new scala.util.Random(9))), shards = 4)
    check(Seq(42.0), shards = 2)
    check(Seq(1.0, 2.0), shards = 2)
    // nulls are excluded like the aggregate does
    val withNulls = Seq(Some(1.0), None, Some(3.0), None, Some(2.0))
      .toDF("v")
    val got = Quantiles.exactPercentiles(withNulls, "v", Seq(0.5), 2)
      .select(explode(col("qs"))).as[Double].head()
    assert(got === 2.0)
  }

  test("empty input yields an empty quantile array") {
    val empty = Seq.empty[Double].toDF("v")
    val qs = Quantiles.exactPercentiles(empty, "v", Seq(0.5), 2)
      .select(size(col("qs"))).as[Int].head()
    assert(qs === 0)
  }

  /** draws from only 3 distinct values — every rank probe lands in a run */
  private def rnd3(r: scala.util.Random): Double = Seq(1.5, 2.5, 9.0)(r.nextInt(3))
}
