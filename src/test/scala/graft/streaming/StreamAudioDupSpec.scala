package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.ext.{AudioFingerprint, IndexStore}

/** ST20 contracts: the streaming audio probe converges to the batch
  * [[AudioFingerprint.searchBundle]] result across micro-batches
  * (update mode — final counts win), and corrupt blobs drop. */
class StreamAudioDupSpec extends SparkSpec {

  private def ts(s: String) = Timestamp.valueOf(s)

  test("stream probe converges to batch searchBundle; corrupt blobs drop") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    val s = spark; import s.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val dir = java.nio.file.Files.createTempDirectory("sad_bundle").toString
    IndexStore.writeAudioFp(spark,
      AudioFingerprint.synthesizeTones(spark, (0L until 24L).toDF("doc_id"), "doc_id"),
      dir, minShared = 20)
    val bundle = IndexStore.loadAudioFp(spark, dir)
    val probeMedia = AudioFingerprint.synthesizeTones(spark,
      (12L until 24L).toDF("doc_id"), "doc_id")
      .collect().map(r => r.getLong(0) -> r.getAs[Array[Byte]](1)).toSeq
    val incoming = probeMedia.map { case (id, b) =>
      (id, ts("2026-01-01 00:00:00"), b)
    } :+ ((999L, ts("2026-01-01 00:01:00"), "not audio".getBytes("UTF-8")))

    val mem = MemoryStream[(Long, Timestamp, Array[Byte])]
    val streamed = StreamAudioDup.pairs(bundle,
      mem.toDF().toDF("media_id", "ts", "media"), "media_id", "media", "ts")
    val q = streamed.writeStream.format("memory").queryName("sad_pairs")
      .outputMode("update").start()
    try {
      mem.addData(incoming.take(6))
      q.processAllAvailable()
      mem.addData(incoming.drop(6))
      q.processAllAvailable()
    } finally q.stop()

    // update mode re-emits as counts grow; the LATEST row per pair is
    // the converged shared count — compare that to the batch serve
    val got = spark.table("sad_pairs")
      .groupBy("probe_id", "corpus_id").agg(max("shared").as("shared"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    val batch = AudioFingerprint.searchBundle(spark, bundle,
      probeMedia.toDF("media_id", "media"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(got === batch)
    assert(got.nonEmpty)
    assert(!got.exists(_._1 == 999L), "corrupt blob must not emit pairs")
  }
}
