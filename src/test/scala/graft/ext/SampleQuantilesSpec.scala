package graft.ext

import java.nio.charset.StandardCharsets.UTF_8
import java.security.MessageDigest

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Contracts for [[SampleQuantiles]] / BottomKSampleAgg: set-pure
  * determinism, reference equality, exact shard-mergeability, and the
  * sampling-error envelope. */
class SampleQuantilesSpec extends SparkSpec {

  private def md5Long(s: String): Long = {
    val d = MessageDigest.getInstance("MD5").digest(s.getBytes(UTF_8))
    java.lang.Long.parseLong(d.take(4).map(b => f"$b%02x").mkString, 16)
  }

  private val rows: Seq[(Long, String, Double)] =
    (1L to 3000L).map { i =>
      val g = if (i % 3 == 0) "a" else "b"
      // skewed values: heavy tail on group a
      val v = if (g == "a") (i % 97).toDouble * (i % 7 + 1) else (i % 101).toDouble
      (i, g, v)
    }

  private def df(parts: Int = 1): DataFrame = {
    val s = spark; import s.implicits._
    val base = rows.toDF("id", "g", "v")
    if (parts > 1) base.repartition(parts) else base
  }

  private def states(parts: Int = 1, k: Int = 100): Map[String, Seq[(Long, Double)]] =
    df(parts).groupBy("g")
      .agg(SampleQuantiles.bottomK(
        SampleQuantiles.draw(col("id")), col("v"), k).as("st"))
      .collect()
      .map { r =>
        r.getString(0) -> r.getSeq[org.apache.spark.sql.Row](1)
          .map(p => (p.getLong(0), p.getDouble(1))).toSeq
      }.toMap

  /** Independent reference: k smallest (md5 draw, value) per group. */
  private def refStates(k: Int): Map[String, Seq[(Long, Double)]] =
    rows.groupBy(_._2).view.mapValues { rs =>
      rs.map(r => (md5Long(r._1.toString), r._3)).sorted.take(k)
    }.toMap

  test("state == independent reference sample, sorted, capped at k") {
    for (k <- Seq(1, 10, 100)) {
      val got = states(k = k)
      val want = refStates(k)
      assert(got.keySet == want.keySet)
      for (g <- got.keySet) assert(got(g) == want(g), s"group $g k=$k")
    }
  }

  test("pure function of the input set: partition count cannot change it") {
    assert(states(parts = 1) == states(parts = 13))
  }

  test("shard sketches merge exactly to the whole-stream sketch") {
    val k = 50
    val whole = states(k = k)
    val merged = df().withColumn("sh", col("id") % 5)
      .groupBy("g", "sh")
      .agg(SampleQuantiles.bottomK(
        SampleQuantiles.draw(col("id")), col("v"), k).as("st"))
      .groupBy("g").agg(collect_list(col("st")).as("sts"))
      .select(col("g"), SampleQuantiles.mergeStates(col("sts"), k).as("m"))
      .collect()
      .map { r =>
        r.getString(0) -> r.getSeq[org.apache.spark.sql.Row](1)
          .map(p => (p.getLong(0), p.getDouble(1))).toSeq
      }.toMap
    assert(merged == whole)
  }

  test("sampled quantiles land inside the O(1/sqrt(k)) rank envelope") {
    val got = df().groupBy("g")
      .agg(SampleQuantiles.bottomK(
        SampleQuantiles.draw(col("id")), col("v"), 200).as("st"))
      .select(col("g"), SampleQuantiles.quantile(col("st"), 0.5).as("p50"))
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    for (g <- Seq("a", "b")) {
      val vs = rows.filter(_._2 == g).map(_._3).sorted
      // population rank of the estimate must be within 0.5 +/- 4/sqrt(200)
      val rank = vs.count(_ <= got(g)).toDouble / vs.size
      assert(math.abs(rank - 0.5) < 4.0 / math.sqrt(200), s"group $g rank $rank")
    }
  }
}
