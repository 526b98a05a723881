package graft.ext

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** M7/D18 — audio fingerprinting + audio-content near-dup: the audio
  * plane of multimodal curation, where two crawl captures of the same
  * recording differ in every byte (re-encode, gain, container) but
  * share their SPECTRAL PEAK structure — the constellation idea behind
  * every production audio matcher (Wang's Shazam paper, ISMIR'03;
  * Chromaprint), reduced to its deterministic core:
  *
  *   PCM → non-overlapping 256-sample frames → DFT magnitude per bin →
  *   per-frame argmax bin (the "peak") → the peak SEQUENCE is the
  *   fingerprint.
  *
  * Gain changes scale every magnitude equally (argmax invariant);
  * re-encode noise moves magnitudes by orders less than the peak
  * margin. Near-dup joins on (frame index, peak bin) — the q26
  * bucket-join shape with the frame index as the band — and verifies
  * by shared-peak count, so candidates scale with real content
  * overlap, never all-pairs.
  *
  * All decode is the REAL RIFF/PCM path ([[Multimodal.decodeWav]]'s
  * format, re-walked here for the sample plane); damage isolates as
  * ok=false rows. The DFT is computed, not FFT'd — frames are 256
  * samples and the per-file cost is ~1M multiply-adds, partition-local
  * (an FFT would save milliseconds and cost clarity; at scale this
  * plane is embarrassingly parallel either way). */
object AudioFingerprint {

  final case class AudioPeaks(
      media_id: Long, decode_ok: Boolean, n_frames: Int, peaks: Array[Int])

  private val FRAME = 256

  /** Parse a mono 16-bit PCM WAV's samples (the [[Multimodal.decodeWav]]
    * header walk, plus the data plane). None on any damage. */
  private def pcmSamples(b: Array[Byte]): Option[Array[Short]] = {
    try {
      if (b.length < 44 || new String(b, 0, 4, "US-ASCII") != "RIFF" ||
        new String(b, 8, 4, "US-ASCII") != "WAVE") return None
      var off = 12
      var fmtOk = false
      var data: Array[Short] = null
      while (off + 8 <= b.length && (data == null || !fmtOk)) {
        val id = new String(b, off, 4, "US-ASCII")
        val len = (b(off + 4) & 0xff) | ((b(off + 5) & 0xff) << 8) |
          ((b(off + 6) & 0xff) << 16) | ((b(off + 7) & 0xff) << 24)
        // a corrupt negative chunk length would step `off` backwards (or
        // by zero at len = -8/-9) and wedge the walk forever — damage
        // must return None, never hang the executor
        if (len < 0) return None
        if (id == "fmt ") {
          val channels = (b(off + 10) & 0xff) | ((b(off + 11) & 0xff) << 8)
          val bits = (b(off + 22) & 0xff) | ((b(off + 23) & 0xff) << 8)
          fmtOk = channels == 1 && bits == 16
        } else if (id == "data") {
          val n = math.min(len, b.length - off - 8) / 2
          data = Array.tabulate(n)(i =>
            (((b(off + 8 + 2 * i) & 0xff) |
              ((b(off + 9 + 2 * i) & 0xff) << 8)).toShort))
        }
        off += 8 + len + (len & 1)
      }
      if (fmtOk && data != null) Some(data) else None
    } catch { case _: Exception => None }
  }

  /** Twiddle tables: cos/sin of 2π·i/256 for i in [0, 256) — the DFT
    * angle 2π·k·t/FRAME only depends on (k·t) mod FRAME, so one
    * 256-entry table per JVM replaces ~2M trig calls per file (the
    * [[ImageHash]] basis32 pattern). */
  private lazy val cosT: Array[Double] =
    Array.tabulate(FRAME)(i => math.cos(2.0 * math.Pi * i / FRAME))
  private lazy val sinT: Array[Double] =
    Array.tabulate(FRAME)(i => math.sin(2.0 * math.Pi * i / FRAME))

  /** Per-frame spectral peak: argmax over bins 1..127 of the DFT
    * magnitude² (bin 0 — DC/offset — excluded; ties take the lowest
    * bin, so the argmax is total and engine-independent). */
  private[ext] def framePeaks(samples: Array[Short]): Array[Int] = {
    val nFrames = samples.length / FRAME
    val out = new Array[Int](nFrames)
    var f = 0
    while (f < nFrames) {
      var best = 1
      var bestMag = -1.0
      var k = 1
      while (k < FRAME / 2) {
        var re = 0.0
        var im = 0.0
        var t = 0
        var idx = 0 // (k·t) mod FRAME, advanced by k per sample
        while (t < FRAME) {
          val s = samples(f * FRAME + t).toDouble
          re += s * cosT(idx)
          im -= s * sinT(idx)
          idx += k
          if (idx >= FRAME) idx -= FRAME
          t += 1
        }
        val mag = re * re + im * im
        if (mag > bestMag) { bestMag = mag; best = k }
        k += 1
      }
      out(f) = best
      f += 1
    }
    out
  }

  /** Per-blob fingerprint: the peak sequence, None when undecodable —
    * the ONE decode path batch [[peaks]] and the streaming probe
    * ([[graft.streaming.StreamAudioDup]]) share (the
    * [[ImageHash.phashOfBytes]] discipline: stream and batch
    * fingerprints must never silently diverge). */
  private[graft] def peaksOfBytes(bytes: Array[Byte]): Option[Array[Int]] =
    pcmSamples(bytes).filter(_.length >= FRAME).map(framePeaks)

  /** Decode + fingerprint every blob: REAL RIFF walk, partition-local;
    * corrupt/unsupported blobs isolate as decode_ok=false rows. */
  def peaks(spark: SparkSession, media: DataFrame): Dataset[AudioPeaks] = {
    import spark.implicits._
    media.select("media_id", "media").as[(Long, Array[Byte])].mapPartitions(_.map {
      case (id, bytes) =>
        peaksOfBytes(bytes) match {
          case Some(p) => AudioPeaks(id, decode_ok = true, p.length, p)
          case None => AudioPeaks(id, decode_ok = false, 0, Array.empty)
        }
    })
  }

  /** All pairs sharing ≥ `minShared` (frame, peak) positions — the
    * bucket join on (frame index, peak bin): two captures of the same
    * recording agree at almost every frame, unrelated audio agrees
    * almost nowhere, and the shuffle carries one fixed-width row per
    * FRAME (no samples). */
  def nearDupPairs(peaksDf: DataFrame, idCol: String, peaksCol: String,
      minShared: Int): DataFrame = {
    val exploded = peaksDf.select(col(idCol),
      posexplode(col(peaksCol)).as(Seq("frame", "bin")))
    val a = exploded.select(col(idCol).as("id_a"), col("frame"), col("bin"))
    val b = exploded.select(col(idCol).as("id_b"), col("frame"), col("bin"))
    a.join(b, Seq("frame", "bin"))
      .where(col("id_a") < col("id_b"))
      .groupBy("id_a", "id_b")
      .agg(count(lit(1)).cast("long").as("shared"))
      .where(col("shared") >= minShared)
  }

  /** Gate fixture: one REAL mono 16-bit WAV per id whose content is a
    * sequence of `segments` pure tones, each EXACTLY bin-aligned —
    * segment s plays bin k(g, s) = 4 + (g·31 + s·17) mod 60 (g = the
    * group anchor id − id mod 4) for
    * `framesPerSegment` whole frames, so every frame holds an integer
    * number of periods, the DFT energy lands entirely in bin k (zero
    * spectral leakage — the rectangular window is exact at bin
    * centers), and the peak sequence is a CLOSED FORM of the id DuckDB
    * restates with no decoder and no DFT (the q239/q248 discipline).
    * The margin: a bin-centered tone's own-bin magnitude² is
    * (A·128)² ≈ 2.3e12 against 16-bit rounding noise orders below —
    * argmax is decided by construction. Variant structure for the
    * near-dup gate: ids in a group of 4 share tones; variant v = id%4
    * RAISES the bin of segments 0..v−1 by one — variants v_a < v_b
    * agree below v_a (both raised) AND from v_b up (both unraised), so
    * within-group pairs share exactly (segments − |v_a − v_b|)
    * segments. */
  def synthesizeTones(spark: SparkSession, ids: DataFrame, idCol: String,
      segments: Int = 8, framesPerSegment: Int = 4,
      amplitude: Double = 12000.0): DataFrame = {
    import spark.implicits._
    ids.select(col(idCol).cast("long")).as[Long].mapPartitions(_.map { id =>
      val g = id - id % 4
      val v = (id % 4).toInt
      val n = segments * framesPerSegment * FRAME
      val pcm = new Array[Short](n)
      var s = 0
      while (s < segments) {
        val bin = (4 + (g * 31 + s * 17) % 60 + (if (s < v) 1 else 0)).toInt
        var t = 0
        while (t < framesPerSegment * FRAME) {
          val sample = math.round(amplitude *
            math.sin(2.0 * math.Pi * bin * (t % FRAME) / FRAME)).toInt
          pcm(s * framesPerSegment * FRAME + t) = sample.toShort
          t += 1
        }
        s += 1
      }
      (id, wavBytes(8000, pcm))
    }).toDF("media_id", "media")
  }

  /** A loaded audio-fingerprint bundle: the (frame, bin)-clustered
    * print table probes bucket-join against, plus the match floor. */
  final case class Bundle(prints: DataFrame, minShared: Int)

  private val cache = Memo.unmanaged[Bundle]

  /** Serving memo (lazy parquet reads — nothing cluster-side to
    * release; the bound caps JVM state). */
  def cached(key: String)(build: => Bundle): Bundle = cache(key)(build)

  /** The ONE candidate-join + shared-count tail every serving path uses
    * (batch [[searchBundle]] and the streaming probe
    * [[graft.streaming.StreamAudioDup]] — the match semantics must
    * never silently diverge between them): probe (frame, bin) rows
    * equi-join the corpus prints, self-pairs excluded, shared-count
    * aggregate thresholded at `minShared`. */
  private[graft] def sharedCountPairs(probePrints: DataFrame,
      corpusPrints: DataFrame, minShared: Int): DataFrame =
    probePrints.join(corpusPrints, Seq("frame", "bin"))
      .where(col("probe_id") =!= col("corpus_id"))
      .groupBy("probe_id", "corpus_id")
      .agg(count(lit(1)).cast("long").as("shared"))
      .where(col("shared") >= minShared)

  /** Near-dup pairs between probe AUDIO and the stored corpus: the
    * probe side decodes + fingerprints itself (map-only), explodes to
    * (frame, bin) rows and joins the corpus prints — candidate rows are
    * row-group runs under the (frame, bin) clustering; the shared-count
    * verify IS the join's aggregate, no second fetch. */
  def searchBundle(spark: SparkSession, bundle: Bundle,
      probeMedia: DataFrame): DataFrame = {
    val p = peaks(spark, probeMedia).toDF().where(col("decode_ok"))
      .select(col("media_id").as("probe_id"),
        posexplode(col("peaks")).as(Seq("frame", "bin")))
    sharedCountPairs(p, bundle.prints, bundle.minShared)
  }

  /** Minimal RIFF/WAVE writer: mono, 16-bit, little-endian PCM. */
  private[ext] def wavBytes(rate: Int, samples: Array[Short]): Array[Byte] = {
    val dataLen = samples.length * 2
    val buf = java.nio.ByteBuffer.allocate(44 + dataLen)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    buf.put("RIFF".getBytes("US-ASCII")).putInt(36 + dataLen)
      .put("WAVE".getBytes("US-ASCII"))
    buf.put("fmt ".getBytes("US-ASCII")).putInt(16)
      .putShort(1).putShort(1).putInt(rate).putInt(rate * 2)
      .putShort(2).putShort(16)
    buf.put("data".getBytes("US-ASCII")).putInt(dataLen)
    samples.foreach(buf.putShort)
    buf.array()
  }
}
