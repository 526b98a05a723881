package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.ext.{ImageHash, IndexStore}

/** ST19 contracts: the streaming image probe equals the batch
  * [[ImageHash.searchBundle]] over multi-batch delivery, corrupt blobs
  * drop silently, and the watermarked layer emits each pair once. */
class StreamImageDupSpec extends SparkSpec {

  private def ts(s: String) = Timestamp.valueOf(s)

  private lazy val bundle: ImageHash.Bundle = {
    val s = spark; import s.implicits._
    val dir = java.nio.file.Files.createTempDirectory("sid_bundle").toString
    IndexStore.writePhash(spark,
      ImageHash.synthesizePatterned(spark, (0L until 40L).toDF("doc_id"), "doc_id"),
      dir, maxDist = 7, bands = 8)
    IndexStore.loadPhash(spark, dir)
  }

  private def probeMedia: Seq[(Long, Array[Byte])] = {
    val s = spark; import s.implicits._
    ImageHash.synthesizePatterned(spark, (24L until 40L).toDF("doc_id"), "doc_id")
      .collect().map(r => r.getLong(0) -> r.getAs[Array[Byte]](1)).toSeq
  }

  test("stream probe == batch searchBundle, across micro-batches; corrupt blobs drop") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    val s = spark; import s.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val media = probeMedia
    val incoming = media.zipWithIndex.map { case ((id, bytes), i) =>
      (id, ts(f"2026-01-01 00:${i % 60}%02d:00"), bytes)
    } :+ ((999L, ts("2026-01-01 01:00:00"), "not an image".getBytes("UTF-8")))

    val mem = MemoryStream[(Long, Timestamp, Array[Byte])]
    val streamed = StreamImageDup.pairs(bundle,
      mem.toDF().toDF("media_id", "ts", "media"),
      "media_id", "media", "ts")
    val q = streamed.writeStream.format("memory").queryName("sid_pairs")
      .outputMode("append").start()
    try {
      mem.addData(incoming.take(8))
      q.processAllAvailable()
      mem.addData(incoming.drop(8))
      q.processAllAvailable()
    } finally q.stop()

    // at-least-once: collapse duplicates before comparing to batch
    val got = spark.table("sid_pairs")
      .select("probe_id", "corpus_id", "dist").distinct()
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    val batch = ImageHash.searchBundle(spark, bundle,
      media.toDF("media_id", "media"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(got === batch)
    assert(got.nonEmpty)
    assert(!got.exists(_._1 == 999L), "corrupt blob must not emit pairs")
  }

  test("dedupedPairs emits each pair exactly once within the watermark") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    val s = spark; import s.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val media = probeMedia.take(8)
    val mem = MemoryStream[(Long, Timestamp, Array[Byte])]
    val streamed = StreamImageDup.dedupedPairs(bundle,
      mem.toDF().toDF("media_id", "ts", "media"),
      "media_id", "media", "ts", watermark = "10 minutes")
    val q = streamed.writeStream.format("memory").queryName("sid_dedup")
      .outputMode("append").start()
    try {
      mem.addData(media.map { case (id, b) => (id, ts("2026-01-01 00:00:00"), b) })
      q.processAllAvailable()
      // advance the watermark so held rows flush
      mem.addData(Seq((998L, ts("2026-01-01 02:00:00"),
        "nudge".getBytes("UTF-8"))))
      q.processAllAvailable()
    } finally q.stop()
    val rows = spark.table("sid_dedup")
      .select("probe_id", "corpus_id").collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    assert(rows.nonEmpty)
    assert(rows.length === rows.distinct.length,
      "a pair must surface once, not once per colliding band")
  }
}
