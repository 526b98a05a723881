package graft.ext

import org.apache.spark.sql.functions._
import graft.SparkSpec

/** M6/D17/N17 — perceptual image hashing: the invariances the operator
  * exists for (resize, brightness), banded near-dup completeness vs
  * brute force, the stored bundle's append ≡ rebuild bit-identity, and
  * corrupt-blob isolation. */
class ImageHashSpec extends SparkSpec {
  import spark.implicits._

  private def pngBytes(w: Int, h: Int)(luma: (Int, Int) => Int): Array[Byte] = {
    val img = new java.awt.image.BufferedImage(
      w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
    for (y <- 0 until h; x <- 0 until w) {
      val l = luma(x, y).max(0).min(255)
      img.setRGB(x, y, (l << 16) | (l << 8) | l)
    }
    val bos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "png", bos)
    bos.toByteArray
  }

  private def hashOne(bytes: Array[Byte]): (Long, Long) = {
    val r = ImageHash.hashes(spark,
      Seq((1L, bytes)).toDF("media_id", "media")).collect().head
    assert(r.decode_ok)
    (r.phash, r.dhash)
  }

  test("pHash survives 2x pixel replication (resize invariance through exact area averaging)") {
    // replication leaves the underlying step function identical, so the
    // 32x32 area resample integrates the same image — pHash's ±512 sign
    // margins absorb the FP weight differences
    val ids = Seq(3L, 7L, 11L).toDF("doc_id")
    val base = ImageHash.synthesizePatterned(spark, ids, "doc_id")
      .collect().map(r => r.getLong(0) -> r.getAs[Array[Byte]](1)).toMap
    base.foreach { case (id, bytes) =>
      val img = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(bytes))
      val up = pngBytes(64, 64)((x, y) => img.getRGB(x / 2, y / 2) & 0xff)
      assert(hashOne(up)._1 === hashOne(bytes)._1, s"id $id phash changed under 2x upscale")
    }
  }

  test("gradient fixture: dHash invariant under brightness shift; flips under mirror") {
    // adjacent 9x8 cells of a linear x-gradient differ by ~25 luma —
    // far above FP noise, so every dHash bit has a real margin. (pHash
    // is NOT asserted here: a pure ramp's DCT is analytically zero at
    // every u>0,v>0 coefficient, putting 49 of its 63 bits on an FP
    // knife edge — its shift invariance is gated by q248 on the cosine
    // fixture, where every coefficient carries a ±512 margin.)
    val g = pngBytes(32, 32)((x, y) => 20 + x * 6 + y)
    val gShift = pngBytes(32, 32)((x, y) => 30 + x * 6 + y)
    val gMirror = pngBytes(32, 32)((x, y) => 20 + (31 - x) * 6 + y)
    assert(hashOne(g)._2 === hashOne(gShift)._2)
    // a mirrored gradient reverses every horizontal comparison
    val d = hashOne(g)._2
    val dm = hashOne(gMirror)._2
    assert(java.lang.Long.bitCount(d ^ dm) > 40)
  }

  test("nearDupPairs equals brute force for maxDist < bands (pigeonhole recall 1.0)") {
    // deterministic 63-bit hashes with planted near pairs: id pairs
    // (2i, 2i+1) differ in exactly i%8 bits; cross pairs are far
    val rnd = new scala.util.Random(42)
    val hs = (0 until 20).flatMap { i =>
      val base = rnd.nextLong() & Long.MaxValue
      val flips = (0 until i % 8).foldLeft(0L)((m, k) => m | (1L << (k * 7)))
      Seq((2L * i, base), (2L * i + 1, base ^ flips))
    }
    val df = hs.toDF("media_id", "phash")
    val got = ImageHash.nearDupPairs(df, "media_id", "phash", maxDist = 7, bands = 8)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    val brute = (for {
      (a, ha) <- hs; (b, hb) <- hs if a < b
      d = java.lang.Long.bitCount(ha ^ hb) if d <= 7
    } yield (a, b, d.toLong)).toSet
    assert(got === brute)
    assertThrows[IllegalArgumentException](
      ImageHash.nearDupPairs(df, "media_id", "phash", maxDist = 8, bands = 8))
    // the compound-block scale path finds the same set (9 blocks of 7
    // bits, pair keys: guarantee d <= 9-2 = 7) — and refuses a maxDist
    // its pigeonhole cannot cover
    val blocked = ImageHash.nearDupPairsBlocked(df, "media_id", "phash",
      maxDist = 7, blocks = 9, keySize = 2)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(blocked === brute)
    val tripleKey = ImageHash.nearDupPairsBlocked(df, "media_id", "phash",
      maxDist = 6, blocks = 9, keySize = 3)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(tripleKey === brute.filter(_._3 <= 6))
    assertThrows[IllegalArgumentException](
      ImageHash.nearDupPairsBlocked(df, "media_id", "phash",
        maxDist = 8, blocks = 9, keySize = 2))
  }

  test("bundle append ≡ rebuild bit-identically; searchBundle matches the one-shot join") {
    val ids = (0L until 32L).toDF("doc_id")
    val media = ImageHash.synthesizePatterned(spark, ids, "doc_id")
    val tmp = java.nio.file.Files.createTempDirectory("phash_spec").toString
    val full = s"$tmp/full"
    val inc = s"$tmp/inc"
    IndexStore.writePhash(spark, media, full, maxDist = 7, bands = 8)
    IndexStore.writePhash(spark,
      media.where(col("media_id") < 20), inc, maxDist = 7, bands = 8)
    IndexStore.appendPhash(spark, media.where(col("media_id") >= 20), inc)
    val a = IndexStore.loadPhash(spark, full)
    val b = IndexStore.loadPhash(spark, inc)
    assert(a.hashes.collect().map(_.toSeq).toSet === b.hashes.collect().map(_.toSeq).toSet)
    assert(a.banded.collect().map(_.toSeq).toSet === b.banded.collect().map(_.toSeq).toSet)
    val probes = ImageHash.synthesizePatterned(spark,
      (8L until 16L).toDF("doc_id"), "doc_id")
    val viaBundle = ImageHash.searchBundle(spark, b, probes)
      .collect().map(_.toSeq).toSet
    val hashes = ImageHash.hashes(spark, media).toDF().where(col("decode_ok"))
    val probeH = ImageHash.hashes(spark, probes).toDF().where(col("decode_ok"))
    val oneShot = ImageHash.probePairs(
      hashes.select(col("media_id").as("corpus_id"),
        explode(ImageHash.bandCols(col("phash"), 8)).as("bb"))
        .select(col("bb.band").as("band"), col("bb.value").as("value"), col("corpus_id")),
      hashes.select(col("media_id").as("corpus_id"), col("phash").as("ch")),
      probeH, "media_id", "phash", maxDist = 7, bands = 8)
      .collect().map(_.toSeq).toSet
    assert(viaBundle === oneShot)
    assert(viaBundle.nonEmpty)
    // compaction folds the inc chain into one re-clustered file set and
    // serving is unchanged
    IndexStore.compact(spark, inc)
    assert(!java.nio.file.Files.exists(java.nio.file.Paths.get(inc, "inc")) ||
      java.nio.file.Files.list(java.nio.file.Paths.get(inc, "inc")).count() === 0L)
    val compacted = IndexStore.loadPhash(spark, inc)
    val viaCompacted = ImageHash.searchBundle(spark, compacted, probes)
      .collect().map(_.toSeq).toSet
    assert(viaCompacted === oneShot)
  }

  test("corrupt blobs isolate as decode_ok=false rows, never task failures") {
    val media = Seq(
      (1L, "definitely not an image".getBytes("UTF-8")),
      (2L, Array[Byte]()),
      (3L, pngBytes(16, 16)((x, y) => x * 16 + y))).toDF("media_id", "media")
    val r = ImageHash.hashes(spark, media).collect().map(h => h.media_id -> h.decode_ok).toMap
    assert(r === Map(1L -> false, 2L -> false, 3L -> true))
  }
}
