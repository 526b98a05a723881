package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.ext.Decontaminate

/** ST15 contracts: the streaming bloom scan equals the batch flags on
  * every doc with shingles across micro-batch boundaries, contaminated
  * docs are NEVER missed (the one-sided-error guarantee), the
  * zero-shingle edge is explicit, and the plan carries no streaming
  * state (append mode with a map-only projection). */
class StreamDecontaminateSpec extends SparkSpec {

  private def ts(s: String) = Timestamp.valueOf(s)

  // benchmark/test set the stream must be screened against
  private def testSet = {
    val s = spark; import s.implicits._
    Seq(
      (900L, "the quick brown fox jumps over the lazy dog tonight"),
      (901L, "question answering benchmarks leak into crawls all the time"))
      .toDF("doc_id", "text")
  }

  private lazy val bf = Decontaminate.buildShingleBloom(
    testSet, "doc_id", "text", shingleK = 5, fpp = 1e-4,
    expectedShingles = 1024)

  private val incoming = Seq(
    // verbatim copy of a benchmark doc — MUST flag
    (1L, "2026-02-01 00:00:00", "the quick brown fox jumps over the lazy dog tonight"),
    // contains a 5-gram of testSet doc 901 inside fresh text — MUST flag
    (2L, "2026-02-01 00:01:00", "crawlers notice question answering benchmarks leak into crawls often"),
    // clean
    (3L, "2026-02-01 00:02:00", "completely unrelated prose about sailing boats on calm water"),
    // too short for any 5-shingle
    (4L, "2026-02-01 00:03:00", "tiny doc"))

  test("stream flags == batch flags across micro-batches; no contaminated doc missed") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    val s = spark; import s.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext

    val mem = MemoryStream[(Long, String, String)]
    val flagged = StreamDecontaminate.flags(bf,
      mem.toDF().toDF("doc_id", "ts", "text")
        .withColumn("ts", col("ts").cast("timestamp")),
      "doc_id", "text", "ts", shingleK = 5, minHits = 1)
    val q = flagged.writeStream.format("memory").queryName("sdc_flags")
      .outputMode("append").start()
    try {
      mem.addData(incoming.take(2).map(r => (r._1, r._2, r._3)))
      q.processAllAvailable()
      mem.addData(incoming.drop(2).map(r => (r._1, r._2, r._3)))
      q.processAllAvailable()
    } finally q.stop()

    val got = spark.table("sdc_flags")
      .select("doc_id", "n_shingles", "n_hits", "flagged")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getBoolean(3)))
      .toMap_4
    assert(got.keySet == Set(1L, 2L, 3L, 4L))
    // one-sided error: both contaminated docs flagged
    assert(got(1L)._3, "verbatim copy missed")
    assert(got(2L)._3, "embedded benchmark 5-gram missed")
    assert(!got(4L)._3 && got(4L)._1 == 0L, "zero-shingle doc must pass clean")

    // batch twin agreement on every doc WITH shingles
    val batch = Decontaminate.bloomContaminationFlags(
        incoming.map(r => (r._1, r._3)).toDF("doc_id", "text")
          .where(col("doc_id") =!= 4L),
        testSet, "doc_id", "text", shingleK = 5, minHits = 1)
      .collect().map(r => (r.getLong(0),
        (r.getLong(1), r.getLong(2), r.getBoolean(3)))).toMap
    for (id <- Seq(1L, 2L, 3L))
      assert(got(id) == batch(id), s"doc $id: stream ${got(id)} vs batch ${batch(id)}")
  }

  test("clean() drops exactly the flagged docs and keeps the original schema") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    val s = spark; import s.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext

    val mem = MemoryStream[(Long, String, String)]
    val cleaned = StreamDecontaminate.clean(bf,
      mem.toDF().toDF("doc_id", "ts", "text"), "text", shingleK = 5)
    val q = cleaned.writeStream.format("memory").queryName("sdc_clean")
      .outputMode("append").start()
    try {
      mem.addData(incoming.map(r => (r._1, r._2, r._3)))
      q.processAllAvailable()
    } finally q.stop()

    val out = spark.table("sdc_clean")
    assert(out.columns.toSeq == Seq("doc_id", "ts", "text"))
    assert(out.select("doc_id").collect().map(_.getLong(0)).toSet == Set(3L, 4L))
  }

  implicit private class MapOps(rows: Array[(Long, Long, Long, Boolean)]) {
    def toMap_4: Map[Long, (Long, Long, Boolean)] =
      rows.map(r => r._1 -> ((r._2, r._3, r._4))).toMap
  }
}
