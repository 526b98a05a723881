package graft.tools

import org.apache.spark.sql.functions._

import graft.ext.ImageHash

/** One-off scaling probe for the perceptual-hash image near-dup tier
  * (not a gate) — the two cost planes of the M6/D17 pipeline, measured
  * over decade-apart corpus sizes so the 100 TB claim has numbers:
  *
  *   - `hash`: decode → resample → DCT → sign for N REAL 32×32 PNGs
  *     ([[ImageHash.synthesizePatterned]] encodes them first, untimed).
  *     Map-only, no shuffle — the expected decade curve is linear in N
  *     (constant imgs/s), which at 1000 executors means the hash pass
  *     scales with the cluster, full stop.
  *   - `join`: [[ImageHash.nearDupPairs]] over N planted 63-bit hashes
  *     (groups of 4 at Hamming distances ≤ 3, the q249 construction;
  *     no images in the loop — this isolates the band-join shuffle,
  *     the tier's ONLY shuffle). Shuffle volume is `bands` fixed-width
  *     rows per image; candidate count scales with real near-dup
  *     density, not N².
  *
  * `PhashProbe [nHash] [nJoin] [passes] [legs]` — defaults
  * 5000 / 200000 / 3 / hash,banded,blocked. `legs` subsets the runs:
  * past ~4M hashes the banded leg IS the degeneration it measures
  * (its candidate volume ~8·N²/2⁸ — 2e12 comparisons at 8M, hours) —
  * measure `blocked` or `blocked3` (keySize 3, maxDist 6) alone there.
  */
object PhashProbe {
  def main(args: Array[String]): Unit = {
    val nHash = args.lift(0).map(_.toInt).getOrElse(5000)
    val nJoin = args.lift(1).map(_.toInt).getOrElse(200000)
    val passes = args.lift(2).map(_.toInt).getOrElse(3)
    val legs = args.lift(3)
      .map(_.split(",").map(_.trim.toLowerCase).toSet)
      .getOrElse(Set("hash", "banded", "blocked"))
    val spark = graft.GraftSession.local("phash-probe")
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._

    // ---- hash leg: real decode path over N patterned PNGs ----------
    if (legs("hash")) {
    val ids = spark.range(nHash.toLong).select(col("id").as("doc_id"))
    val media = ImageHash.synthesizePatterned(spark, ids, "doc_id")
      .persist()
    val nMedia = media.count() // materialize the encode, untimed
    (1 to passes).foreach { p =>
      val t0 = System.nanoTime()
      val hashed = ImageHash.hashes(spark, media).toDF()
        .where(col("decode_ok")).count()
      val s = (System.nanoTime() - t0) / 1e9
      println(f"[phash-probe] hash pass $p: $hashed%d imgs in $s%.2f s " +
        f"(${hashed / s}%.0f imgs/s)")
    }
    media.unpersist()
    }

    // ---- join legs: near-dup over N planted hashes -----------------
    // per-group unique base (xxhash64 bits — no base collisions across
    // groups), variant v flips the v lowest of 3 spread-out bits:
    // within-group distances ≤ 3, cross-group ~31. Built ONLY when a
    // join leg runs — a hash-only invocation at a 1e8 decade must not
    // materialize 1e8 planted rows it never reads.
    val joinLegs = legs("banded") || legs("blocked") || legs("blocked3")
    if (joinLegs) {
    val hashes = spark.range(nJoin.toLong).select(
      col("id").as("media_id"),
      {
        // integer group anchor (Spark's `/` is FRACTIONAL on longs —
        // a bare id/4 would make every group a singleton)
        val g = col("id") - pmod(col("id"), lit(4))
        val v = col("id") % 4
        val base = (0 until 63).map { k =>
          when(pmod(xxhash64(g, lit(k)), lit(2)) === 0, lit(1L << k))
            .otherwise(lit(0L))
        }.reduce((a, b) => a.bitwiseOR(b))
        val flips = (0 until 3).map { k =>
          when(v > k, lit(1L << (k * 7))).otherwise(lit(0L))
        }.reduce((a, b) => a.bitwiseOR(b))
        base.bitwiseXOR(flips).as("phash")
      }).persist()
    val nH = hashes.count()
    if (legs("banded")) (1 to passes).foreach { p =>
      val t0 = System.nanoTime()
      val pairs = ImageHash.nearDupPairs(hashes, "media_id", "phash",
        maxDist = 7, bands = 8).count()
      val s = (System.nanoTime() - t0) / 1e9
      println(f"[phash-probe] banded pass $p: $nH%d hashes -> $pairs%d pairs " +
        f"in $s%.2f s")
    }
    if (legs("blocked")) (1 to passes).foreach { p =>
      val t0 = System.nanoTime()
      val pairs = ImageHash.nearDupPairsBlocked(hashes, "media_id", "phash",
        maxDist = 7, blocks = 9, keySize = 2).count()
      val s = (System.nanoTime() - t0) / 1e9
      println(f"[phash-probe] blocked pass $p: $nH%d hashes -> $pairs%d pairs " +
        f"in $s%.2f s")
    }
    if (legs("blocked3")) (1 to passes).foreach { p =>
      val t0 = System.nanoTime()
      val pairs = ImageHash.nearDupPairsBlocked(hashes, "media_id", "phash",
        maxDist = 6, blocks = 9, keySize = 3).count()
      val s = (System.nanoTime() - t0) / 1e9
      println(f"[phash-probe] blocked3 pass $p: $nH%d hashes -> $pairs%d pairs " +
        f"in $s%.2f s")
    }
    }
    spark.stop()
  }
}
