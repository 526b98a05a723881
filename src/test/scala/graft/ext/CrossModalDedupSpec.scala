package graft.ext

import org.apache.spark.sql.functions._
import graft.SparkSpec

/** D20 — cross-modal dedup: the defining case is a chain that crosses
  * modalities (text a~b, image b~c) collapsing all three into one
  * cluster; docs without images contribute no image edges. */
class CrossModalDedupSpec extends SparkSpec {
  import spark.implicits._

  test("a text edge and an image edge chain into ONE cluster; min-id survives") {
    // text: docs 1 and 2 share prose; doc 3's text is unrelated
    val docs = Seq(
      (1L, "alpha beta gamma delta epsilon zeta eta theta iota kappa"),
      (2L, "alpha beta gamma delta epsilon zeta eta theta iota lambda"),
      (3L, "totally different content about streams and indexes here"),
      (4L, "another unrelated document with its own words entirely"))
      .toDF("doc_id", "text")
    // images: docs 2 and 3 carry the SAME fixture pattern (id 8 twice);
    // docs 1 and 4 carry distant patterns
    val pat = ImageHash.synthesizePatterned(spark,
      Seq(8L, 8L, 0L, 20L).toDF("doc_id"), "doc_id")
      .collect().map(_.getAs[Array[Byte]]("media"))
    val media = Seq((2L, pat(0)), (3L, pat(1)), (1L, pat(2)), (4L, pat(3)))
      .toDF("doc_id", "media")
    val kept = CrossModalDedup.dropNearDuplicates(spark, docs, media,
      "doc_id", "text", textThreshold = 0.5, imageMaxDist = 7)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    // 1~2 by text, 2~3 by image → {1,2,3} one cluster, min-id 1 kept;
    // 4 is unclustered and passes through
    assert(kept === Set(1L, 4L))
  }

  test("a chain crossing ALL FOUR modalities collapses into one cluster") {
    // text 1~2, image 2~3, audio 3~4, video 4~5 → {1..5} one component,
    // min-id 1 survives; 6 is untouched. Each plane covers only the docs
    // that carry that medium (partial coverage, the q259 shape).
    val docs = Seq(
      (1L, "alpha beta gamma delta epsilon zeta eta theta iota kappa"),
      (2L, "alpha beta gamma delta epsilon zeta eta theta iota lambda"),
      (3L, "totally different content about streams and indexes here"),
      (4L, "another unrelated document with its own words entirely"),
      (5L, "fifth document text completely distinct from all the rest"),
      (6L, "sixth standalone document that matches nothing anywhere else"))
      .toDF("doc_id", "text")
    val img = ImageHash.synthesizePatterned(spark,
      Seq(8L, 8L).toDF("doc_id"), "doc_id")
      .collect().map(_.getAs[Array[Byte]]("media"))
    val images = Seq((2L, img(0)), (3L, img(1))).toDF("doc_id", "media")
    val wav = AudioFingerprint.synthesizeTones(spark,
      Seq(40L, 40L).toDF("doc_id"), "doc_id")
      .collect().map(_.getAs[Array[Byte]]("media"))
    val audios = Seq((3L, wav(0)), (4L, wav(1))).toDF("doc_id", "media")
    val avi = Multimodal.synthesizeAvi(spark,
      Seq(9L, 9L).toDF("doc_id"), "doc_id")
      .collect().map(_.getAs[Array[Byte]]("media"))
    val videos = Seq((4L, avi(0)), (5L, avi(1))).toDF("doc_id", "media")
    val text = Dedup.minHashLshPairs(docs, "doc_id", "text", 0.5)
      .select("id_a", "id_b")
    val kept = CrossModalDedup.dropNearDuplicatesMulti(docs, "doc_id", Seq(
      text,
      CrossModalDedup.imageEdges(spark, images, "doc_id", maxDist = 7),
      CrossModalDedup.audioEdges(spark, audios, "doc_id", minShared = 20),
      CrossModalDedup.videoEdges(spark, videos, "doc_id", minShared = 2)))
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(kept === Set(1L, 6L))
  }

  test("docs without (or with corrupt) images still dedup by text alone") {
    val docs = Seq(
      (1L, "the same passage of words repeated across two documents here"),
      (2L, "the same passage of words repeated across two documents here"),
      (3L, "nothing like the others at all in any way whatsoever"))
      .toDF("doc_id", "text")
    val media = Seq((1L, "corrupt".getBytes("UTF-8")))
      .toDF("doc_id", "media")
    val kept = CrossModalDedup.dropNearDuplicates(spark, docs, media,
      "doc_id", "text", textThreshold = 0.8, imageMaxDist = 7)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(kept === Set(1L, 3L))
  }
}
