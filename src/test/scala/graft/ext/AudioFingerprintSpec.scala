package graft.ext

import org.apache.spark.sql.functions._
import graft.SparkSpec

/** M7/D18 — audio fingerprinting: the invariances the operator exists
  * for (gain), the closed-form fixture contract, near-dup ≡ brute
  * force, and corrupt-blob isolation. */
class AudioFingerprintSpec extends SparkSpec {
  import spark.implicits._

  private def peaksOf(media: org.apache.spark.sql.DataFrame): Map[Long, Seq[Int]] =
    AudioFingerprint.peaks(spark, media).collect()
      .map(p => p.media_id -> p.peaks.toSeq).toMap

  test("fixture peaks equal the closed form; bin-exact tones leak nothing") {
    val ids = Seq(0L, 1L, 5L, 42L).toDF("doc_id")
    val got = peaksOf(AudioFingerprint.synthesizeTones(spark, ids, "doc_id"))
    for (id <- Seq(0L, 1L, 5L, 42L)) {
      val g = id - id % 4
      val v = (id % 4).toInt
      val expected = (0 until 8).flatMap { s =>
        val bin = (4 + (g * 31 + s * 17) % 60 + (if (s < v) 1 else 0)).toInt
        Seq.fill(4)(bin)
      }
      assert(got(id) === expected, s"id $id")
    }
  }

  test("fingerprint is gain-invariant: half-amplitude audio has identical peaks") {
    val ids = Seq(3L, 7L).toDF("doc_id")
    val loud = peaksOf(AudioFingerprint.synthesizeTones(spark, ids, "doc_id"))
    val quiet = peaksOf(AudioFingerprint.synthesizeTones(spark, ids, "doc_id",
      amplitude = 6000.0))
    assert(loud === quiet)
  }

  test("nearDupPairs equals brute force on the fixture's shared-frame counts") {
    val ids = (0L until 16L).toDF("doc_id")
    val p = AudioFingerprint.peaks(spark,
      AudioFingerprint.synthesizeTones(spark, ids, "doc_id")).toDF()
    val got = AudioFingerprint.nearDupPairs(p, "media_id", "peaks", minShared = 20)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    val seqs = peaksOf(AudioFingerprint.synthesizeTones(spark, ids, "doc_id"))
    val brute = (for {
      a <- 0L until 16L; b <- 0L until 16L if a < b
      shared = seqs(a).zip(seqs(b)).count { case (x, y) => x == y }
      if shared >= 20
    } yield (a, b, shared.toLong)).toSet
    assert(got === brute)
    assert(got.nonEmpty)
    // within one group: |dv| = 1 shares 28 frames, |dv| = 3 shares 20
    assert(got.contains((0L, 1L, 28L)) && got.contains((0L, 3L, 20L)))
  }

  test("bundle append ≡ rebuild bit-identically; searchBundle ≡ in-plan pairs; compaction folds") {
    import org.apache.spark.sql.functions._
    val ids = (0L until 32L).toDF("doc_id")
    val media = AudioFingerprint.synthesizeTones(spark, ids, "doc_id")
    val tmp = java.nio.file.Files.createTempDirectory("audiofp_spec").toString
    IndexStore.writeAudioFp(spark, media, s"$tmp/full", minShared = 20)
    IndexStore.writeAudioFp(spark,
      media.where(col("media_id") < 20), s"$tmp/inc", minShared = 20)
    IndexStore.appendAudioFp(spark,
      media.where(col("media_id") >= 20), s"$tmp/inc")
    val a = IndexStore.loadAudioFp(spark, s"$tmp/full")
    val b = IndexStore.loadAudioFp(spark, s"$tmp/inc")
    assert(a.prints.collect().map(_.toSeq).toSet === b.prints.collect().map(_.toSeq).toSet)
    val probes = AudioFingerprint.synthesizeTones(spark, (8L until 16L).toDF("doc_id"), "doc_id")
    val viaBundle = AudioFingerprint.searchBundle(spark, b, probes)
      .collect().map(_.toSeq).toSet
    // in-plan equivalent: ordered (probe, corpus) pairs with shared >= 20
    val all = AudioFingerprint.peaks(spark, media).toDF().where(col("decode_ok"))
    val probeP = AudioFingerprint.peaks(spark, probes).toDF().where(col("decode_ok"))
    val exploded = all.select(col("media_id").as("corpus_id"),
      posexplode(col("peaks")).as(Seq("frame", "bin")))
    val pexp = probeP.select(col("media_id").as("probe_id"),
      posexplode(col("peaks")).as(Seq("frame", "bin")))
    val inPlan = pexp.join(exploded, Seq("frame", "bin"))
      .where(col("probe_id") =!= col("corpus_id"))
      .groupBy("probe_id", "corpus_id")
      .agg(count(lit(1)).cast("long").as("shared"))
      .where(col("shared") >= 20)
      .collect().map(_.toSeq).toSet
    assert(viaBundle === inPlan && viaBundle.nonEmpty)
    IndexStore.compact(spark, s"$tmp/inc")
    val compacted = IndexStore.loadAudioFp(spark, s"$tmp/inc")
    assert(AudioFingerprint.searchBundle(spark, compacted, probes)
      .collect().map(_.toSeq).toSet === inPlan)
  }

  test("corrupt/unsupported blobs isolate as decode_ok=false rows") {
    val tone = AudioFingerprint.synthesizeTones(spark, Seq(1L).toDF("doc_id"), "doc_id")
      .collect().head.getAs[Array[Byte]]("media")
    // a NEGATIVE chunk length (bytes F8 FF FF FF = -8) would step the
    // RIFF walk by zero and spin the executor forever if not refused
    val negChunk = tone.clone()
    negChunk(16) = 0xF8.toByte; negChunk(17) = 0xFF.toByte
    negChunk(18) = 0xFF.toByte; negChunk(19) = 0xFF.toByte
    val media = Seq(
      (1L, "not a wav".getBytes("UTF-8")),
      (2L, tone.take(30)), // truncated header
      (3L, tone),
      (4L, negChunk)).toDF("media_id", "media")
    val ok = AudioFingerprint.peaks(spark, media).collect()
      .map(p => p.media_id -> p.decode_ok).toMap
    assert(ok === Map(1L -> false, 2L -> false, 3L -> true, 4L -> false))
  }
}
