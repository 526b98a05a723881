package graft.tools

import org.apache.spark.sql.functions._

import graft.ext.Multimodal

/** One-off scaling probe for the video near-dup joins (not a gate):
  * the per-frame generator's bucket key (frame_index, qluma) has only
  * ~10² distinct values TOTAL, so its candidate volume is N²-driven
  * almost immediately — this probe measures that degeneration against
  * the consecutive-bigram generator over decade-apart N.
  *
  * Planted fingerprints (no codec in the loop — isolates the join):
  * 8 frames per video, per-group base luma from xxhash64 (13 live
  * buckets — cross-group (frame, qluma) collisions at the ~1/13 rate a
  * real 16-bucket signature has), variant v = id%4 raising frames
  * 0..v−1 — within-group pairs share the 8−max(v_a,v_b) ≥ 5 tail run.
  * minShared = 6 keeps the verify honest at scale: random pairs pass
  * at ~C(8,6)/13⁶ ≈ 6×10⁻⁶ (a signature this coarse NEEDS a
  * most-frames floor; at minShared 2 random collisions alone make the
  * emitted pair set quadratic and no candidate strategy can save it —
  * that operating-point lesson is part of what this probe documents).
  *
  * `VideoProbe [n] [passes] [legs]` — defaults 20000 / 2 /
  * frame,bigram. */
object VideoProbe {
  def main(args: Array[String]): Unit = {
    val n = args.lift(0).map(_.toInt).getOrElse(20000)
    val passes = args.lift(1).map(_.toInt).getOrElse(2)
    val legs = args.lift(2)
      .map(_.split(",").map(_.trim.toLowerCase).toSet)
      .getOrElse(Set("frame", "bigram"))
    val spark = graft.GraftSession.local("video-probe")
    spark.sparkContext.setLogLevel("ERROR")

    val g = col("id") - pmod(col("id"), lit(4))
    val v = col("id") % 4
    val fp = spark.range(n.toLong)
      .select(col("id").as("media_id"), g.as("g"), v.as("v"),
        explode(array((0 until 8).map(lit): _*)).as("frame_index"))
      .select(col("media_id"), col("frame_index"),
        (lit(1) + pmod(xxhash64(col("g"), col("frame_index")) +
          when(col("frame_index") < col("v"), 1).otherwise(0), lit(13)))
          .cast("long").as("qluma"))
      .persist()
    val rows = fp.count()

    if (legs("frame")) (1 to passes).foreach { p =>
      val t0 = System.nanoTime()
      val pairs = Multimodal.videoNearDupPairs(fp, minShared = 6).count()
      val s = (System.nanoTime() - t0) / 1e9
      println(f"[video-probe] frame pass $p: $n%d videos ($rows%d prints) " +
        f"-> $pairs%d pairs in $s%.2f s")
    }
    if (legs("bigram")) (1 to passes).foreach { p =>
      val t0 = System.nanoTime()
      val pairs = Multimodal.videoNearDupPairsBigram(fp, minShared = 6).count()
      val s = (System.nanoTime() - t0) / 1e9
      println(f"[video-probe] bigram pass $p: $n%d videos ($rows%d prints) " +
        f"-> $pairs%d pairs in $s%.2f s")
    }
    spark.stop()
  }
}
