package graft.ext

import org.apache.spark.sql.functions._
import graft.{SparkSpec, Tables}

class SplitsSpec extends SparkSpec {

  private lazy val docs = Tables.documents(spark, sf0001)

  test("assign is total, deterministic, and stable under re-runs / projection") {
    val w = Seq(("train", 8), ("val", 1), ("test", 1))
    val a = Splits.assign(docs, "doc_id", w).select("doc_id", "split")
    val b = Splits.assign(docs.repartition(7).withColumn("noise", lit(1)),
      "doc_id", w).select("doc_id", "split")
    assert(a.collect().toSet === b.collect().toSet)
    val counts = a.groupBy("split").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(counts.keySet === Set("train", "val", "test"))
    assert(counts.values.sum === docs.count())
    // rough proportions (500 docs; generous tolerance)
    assert(counts("train") > 300 && counts("val") < 120 && counts("test") < 120)
  }

  test("portable mode matches an independently computed md5 assignment") {
    val a = Splits.assign(docs, "doc_id", Seq(("train", 8), ("val", 1), ("test", 1)),
      portable = true)
    val check = a.withColumn("expected",
      when(substring(md5(col("doc_id").cast("string")), 1, 8) < "cccccccc", "train")
        .when(substring(md5(col("doc_id").cast("string")), 1, 8) < "e6666666", "val")
        .otherwise("test"))
    assert(check.filter(col("split") =!= col("expected")).count() === 0)
  }

  test("sampleByKey is a subset, deterministic, and roughly proportional") {
    val s = Splits.sampleByKey(docs, "doc_id", 0.3)
    val n = s.count()
    assert(n > 0 && n < docs.count())
    assert(math.abs(n / 500.0 - 0.3) < 0.1)
    assert(Splits.sampleByKey(docs, "doc_id", 0.3).count() === n)
    // monotone: a larger fraction strictly contains the smaller one
    val small = Splits.sampleByKey(docs, "doc_id", 0.1).select("doc_id").collect().toSet
    val big = Splits.sampleByKey(docs, "doc_id", 0.5).select("doc_id").collect().toSet
    assert(small.subsetOf(big))
  }
}
