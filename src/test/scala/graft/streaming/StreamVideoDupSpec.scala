package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.ext.{IndexStore, Multimodal}

/** ST21 contracts (completing the streaming near-dup quadruple): the
  * streaming video probe converges to the batch
  * [[Multimodal.searchVideoBundle]] result across micro-batches
  * (update mode — final counts win), and corrupt blobs drop. */
class StreamVideoDupSpec extends SparkSpec {

  private def ts(s: String) = Timestamp.valueOf(s)

  test("stream probe converges to batch searchVideoBundle; corrupt blobs drop") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    val s = spark; import s.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val dir = java.nio.file.Files.createTempDirectory("svd_bundle").toString
    IndexStore.writeVideoFp(spark,
      Multimodal.synthesizeAvi(spark, (0L until 24L).toDF("doc_id"), "doc_id"),
      dir, minShared = 1)
    val bundle = IndexStore.loadVideoFp(spark, dir)
    val probeMedia = Multimodal.synthesizeAvi(spark,
      (12L until 24L).toDF("doc_id"), "doc_id")
      .collect().map(r => r.getLong(0) -> r.getAs[Array[Byte]](1)).toSeq
    val incoming = probeMedia.map { case (id, b) =>
      (id, ts("2026-01-01 00:00:00"), b)
    } :+ ((999L, ts("2026-01-01 00:01:00"), "not a video".getBytes("UTF-8")))

    val mem = MemoryStream[(Long, Timestamp, Array[Byte])]
    val streamed = StreamVideoDup.pairs(bundle,
      mem.toDF().toDF("media_id", "ts", "media"), "media_id", "media", "ts")
    val q = streamed.writeStream.format("memory").queryName("svd_pairs")
      .outputMode("update").start()
    try {
      mem.addData(incoming.take(6))
      q.processAllAvailable()
      mem.addData(incoming.drop(6))
      q.processAllAvailable()
    } finally q.stop()

    // update mode re-emits as counts grow; the LATEST row per pair is
    // the converged shared count — compare that to the batch serve
    val got = spark.table("svd_pairs")
      .groupBy("probe_id", "corpus_id").agg(max("shared").as("shared"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    val batch = Multimodal.searchVideoBundle(spark, bundle,
      probeMedia.toDF("media_id", "media"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(got === batch)
    assert(got.nonEmpty)
    assert(!got.exists(_._1 == 999L), "corrupt blob must not emit pairs")
  }

  test("write+append equals one-shot write; compaction folds with serving unchanged") {
    val s = spark; import s.implicits._
    val d1 = java.nio.file.Files.createTempDirectory("svd_oneshot").toString
    val d2 = java.nio.file.Files.createTempDirectory("svd_appended").toString
    IndexStore.writeVideoFp(spark,
      Multimodal.synthesizeAvi(spark, (0L until 24L).toDF("doc_id"), "doc_id"),
      d1, minShared = 1)
    IndexStore.writeVideoFp(spark,
      Multimodal.synthesizeAvi(spark, (0L until 16L).toDF("doc_id"), "doc_id"),
      d2, minShared = 1)
    IndexStore.appendVideoFp(spark,
      Multimodal.synthesizeAvi(spark, (16L until 24L).toDF("doc_id"), "doc_id"), d2)
    def prints(dir: String) = IndexStore.loadVideoFp(spark, dir).prints
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).sorted.toSeq
    assert(prints(d1) === prints(d2))
    val probes = Multimodal.synthesizeAvi(spark,
      (12L until 24L).toDF("doc_id"), "doc_id")
    val before = Multimodal.searchVideoBundle(spark,
      IndexStore.loadVideoFp(spark, d2), probes)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    IndexStore.compact(spark, d2)
    assert(!java.nio.file.Files.exists(java.nio.file.Paths.get(d2, "inc")) ||
      java.nio.file.Files.list(java.nio.file.Paths.get(d2, "inc")).count() === 0L)
    val after = Multimodal.searchVideoBundle(spark,
      IndexStore.loadVideoFp(spark, d2), probes)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(after === before)
  }
}
