package graft.ext

import org.apache.spark.sql.functions._
import graft.{SparkSpec, Tables}

class MultimodalSpec extends SparkSpec {

  private lazy val media = Multimodal.asMediaTable(
    Tables.documents(spark, sf0001), "doc_id", "text").cache()

  test("media table has the opaque-binary contract schema") {
    val f = media.schema.fields.map(f => f.name -> f.dataType.sql).toMap
    assert(f("media") === "BINARY")
    assert(f("media_id") === "BIGINT")
    assert(f("format") === "STRING")
    assert(f("n_bytes") === "BIGINT")
  }

  test("extractFeatures is deterministic, drops the blob, fixed-width output") {
    val a = Multimodal.extractFeatures(spark, media).collect().sortBy(_.media_id)
    val b = Multimodal.extractFeatures(spark, media).collect().sortBy(_.media_id)
    assert(a.map(_.mean_byte).toSeq === b.map(_.mean_byte).toSeq)
    assert(a.forall(_.features.length == 8))
    assert(a.forall(r => r.width >= 16 && r.height >= 16))
  }

  test("sniffFormat recovers every format from magic bytes; unheadered blobs are unknown") {
    val sniffed = Multimodal.withMagic(media)
      .withColumn("sniffed", Multimodal.sniffFormat(col("media")))
    assert(sniffed.filter(col("sniffed") =!= col("format")).count() === 0L)
    assert(sniffed.select(countDistinct(col("sniffed"))).head().getLong(0) === 4L)
    // raw text payloads carry no container signature
    val bare = media.withColumn("sniffed", Multimodal.sniffFormat(col("media")))
    assert(bare.filter(col("sniffed") =!= "unknown").count() === 0L)
    // magic survives a resize that keeps at least the header
    val resized = Multimodal.resize(Multimodal.withMagic(media), maxBytes = 64)
      .withColumn("sniffed", Multimodal.sniffFormat(col("media")))
    assert(resized.filter(col("sniffed") =!= col("format")).count() === 0L)
  }

  test("resize caps payload size and keeps n_bytes consistent") {
    val resized = Multimodal.resize(media, 64)
    val bad = resized.where(octet_length(col("media")) =!= col("n_bytes")
      || col("n_bytes") > 64).count()
    assert(bad === 0)
  }

  test("sampleFrames emits every 2nd 32-byte chunk") {
    import spark.implicits._
    val one = Seq((1L, Array.fill[Byte](100)(7))).toDF("media_id", "media")
    val frames = Multimodal.sampleFrames(one, 32, 2).collect()
    // 100 bytes → chunks 0,1,2 (+ partial ignored by sequence arithmetic:
    // int(100/32)-1 = 2 → i in 0..2, stride 2 keeps 0 and 2) = 2 frames
    assert(frames.length === 2)
    assert(frames.map(_.getInt(1)).toSeq === Seq(0, 1))
  }
}
