package graft.tools

import org.apache.spark.sql.functions._

import graft.ext.AudioFingerprint

/** One-off scaling probe for the audio-fingerprint tier (M7/D18, not a
  * gate) — the same two cost planes [[PhashProbe]] measures for
  * images:
  *
  *   - `decode`: REAL RIFF walk + framed DFT argmax over N synthesized
  *     tone WAVs (16 KiB / 32 frames each; synthesis untimed). Map-only
  *     — the expected decade curve is constant files/s.
  *   - `join`: [[AudioFingerprint.nearDupPairs]] over the N fingerprint
  *     arrays (32 rows per file after the posexplode — the tier's only
  *     shuffle). The fixture plants groups of 4 sharing ≥ 20 of 32
  *     frames, so the pair count is 6·N/4 exactly plus whatever
  *     cross-group segment collisions the bin space (60 values) admits.
  *
  * `AudioProbe [nFiles] [passes]` — defaults 2000 / 3. */
object AudioProbe {
  def main(args: Array[String]): Unit = {
    val nFiles = args.lift(0).map(_.toInt).getOrElse(2000)
    val passes = args.lift(1).map(_.toInt).getOrElse(3)
    val spark = graft.GraftSession.local("audio-probe")
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._

    val ids = spark.range(nFiles.toLong).select(col("id").as("doc_id"))
    val media = AudioFingerprint.synthesizeTones(spark, ids, "doc_id").persist()
    media.count() // materialize synthesis, untimed
    (1 to passes).foreach { p =>
      val t0 = System.nanoTime()
      val n = AudioFingerprint.peaks(spark, media).toDF()
        .where(col("decode_ok")).count()
      val s = (System.nanoTime() - t0) / 1e9
      println(f"[audio-probe] decode pass $p: $n%d files in $s%.2f s " +
        f"(${n / s}%.0f files/s)")
    }
    media.unpersist()
    // join leg over PLANTED peak arrays (not the tone fixture: its
    // oracle-expressible weak mixer (g·31 mod 60) repeats whole groups
    // every 15 group indices, which at probe scale manufactures
    // quadratic cross-group "near-dups" no real corpus has) —
    // xxhash64-derived segment bins make cross-group frame matches
    // ~1/120, so pairs = exactly the planted 6·N/4 and the measurement
    // isolates the (frame, bin) shuffle, the PhashProbe join-leg shape
    val peaks = spark.range(nFiles.toLong).select(
      col("id").as("media_id"),
      {
        val g = col("id") - pmod(col("id"), lit(4))
        val v = col("id") % 4
        transform(sequence(lit(0), lit(31)), fr => {
          val seg = (fr / 4).cast("long")
          (lit(1) + pmod(xxhash64(g, seg), lit(120)) +
            when(seg < v, lit(1)).otherwise(lit(0))).cast("int")
        }).as("peaks")
      }).persist()
    peaks.count()
    (1 to passes).foreach { p =>
      val t0 = System.nanoTime()
      val pairs = AudioFingerprint.nearDupPairs(peaks, "media_id", "peaks",
        minShared = 20).count()
      val s = (System.nanoTime() - t0) / 1e9
      println(f"[audio-probe] join pass $p: $nFiles%d files -> $pairs%d pairs " +
        f"in $s%.2f s")
    }
    spark.stop()
  }
}
