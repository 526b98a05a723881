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

  test("decodeMp4 parses real box trees: brand, duration, tracks, codecs; corrupt → decode_ok=false") {
    import spark.implicits._
    val ids = Seq(5L, 6L, 7L, 100L).toDF("id")
    val mp4s = Multimodal.synthesizeMp4(spark, ids, "id")
    val out = Multimodal.decodeMp4(spark, mp4s).collect()
      .map(m => m.media_id -> m).toMap
    // every property is the id-arithmetic the synthesizer declares
    Seq(5L, 6L, 7L, 100L).foreach { id =>
      val m = out(id)
      assert(m.decode_ok && m.major_brand === "isom" && m.timescale === 1000L)
      assert(m.duration_ms === 500L + (id * 37) % 90000)
      assert(m.n_tracks === 1 + (id % 3).toInt)
      val names = Array("avc1", "mp4a", "hev1")
      val codecs = (0 until m.n_tracks).map(t => names(((id + t) % 3).toInt))
      assert(m.codecs === codecs.mkString(","))
    }
    // truncation and garbage both fail soft, never throw
    val bad = Seq(
      (1L, Multimodal.synthesizeMp4(spark, Seq(5L).toDF("id"), "id")
        .head().getAs[Array[Byte]]("media").take(20)),
      (2L, "utterly not a video".getBytes("UTF-8"))
    ).toDF("media_id", "media")
    val badOut = Multimodal.decodeMp4(spark, bad).collect()
    assert(badOut.forall(!_.decode_ok))
  }

  test("AVI: real MJPEG frames decode with correct dimensions + luma; corrupt/truncated handled") {
    import spark.implicits._
    val ids = Seq(3L, 9L, 14L, 26L).toDF("id")
    val avis = Multimodal.synthesizeAvi(spark, ids, "id")
    // container metadata is the id arithmetic the synthesizer declares
    val meta = Multimodal.decodeAvi(spark, avis).collect()
      .map(m => m.media_id -> m).toMap
    ids.as[Long].collect().foreach { id =>
      val m = meta(id)
      assert(m.decode_ok && m.us_per_frame === 40000L &&
        m.n_streams === 1 &&
        m.total_frames === 1 + id % 4 &&
        m.n_video_chunks === 1 + id % 4 &&
        m.width === 8 + id % 8 && m.height === 8 + (id / 8) % 8, s"id=$id: $m")
    }
    // every frame REALLY decodes: dimensions exact, solid-gray luma
    // within the JPEG DC-quantization band
    val frames = Multimodal.sampleAviFrames(spark, avis).collect()
    assert(frames.length === ids.as[Long].collect().map(id => 1 + id % 4).sum)
    frames.foreach { f =>
      assert(f.decode_ok, s"frame failed to decode: $f")
      assert(f.width === 8 + f.media_id % 8 &&
        f.height === 8 + (f.media_id / 8) % 8)
      val want = 16.0 + 16.0 * ((f.media_id + f.frame_index) % 13)
      assert(math.abs(f.mean_luma - want) < 2.5,
        s"luma ${f.mean_luma} vs $want for $f")
    }
    // stride + cap: every 2nd frame, at most 1
    val strided = Multimodal.sampleAviFrames(spark, avis, stride = 2, maxFrames = 1)
      .collect()
    assert(strided.length === 4 && strided.forall(_.frame_index === 0L))
    // corrupt blob → container-level decode_ok=false row; a frame-level
    // corruption (JPEG bytes zeroed in place) → that frame's row fails,
    // siblings still decode
    val corrupt = Seq((1L, "nonsense".getBytes("UTF-8"))).toDF("media_id", "media")
    val cm = Multimodal.decodeAvi(spark, corrupt).collect()
    assert(cm.length === 1 && !cm.head.decode_ok)
    val cf = Multimodal.sampleAviFrames(spark, corrupt).collect()
    assert(cf.length === 1 && !cf.head.decode_ok && cf.head.frame_index === -1L)
    val oneGood = Multimodal.synthesizeAvi(spark, Seq(3L).toDF("id"), "id")
      .as[(Long, Array[Byte])].collect().head
    // zero out the LAST frame's JPEG payload bytes in place: chunk
    // structure intact, frame undecodable
    val bytes = oneGood._2.clone()
    val marker = "00dc".getBytes("US-ASCII")
    val lastChunk = bytes.indices.findLast(i => i + 4 <= bytes.length &&
      bytes.slice(i, i + 4).sameElements(marker)).get
    java.util.Arrays.fill(bytes, lastChunk + 8,
      math.min(bytes.length, lastChunk + 24), 0.toByte)
    val mixed = Multimodal.sampleAviFrames(spark,
      Seq((3L, bytes)).toDF("media_id", "media")).collect()
      .sortBy(_.frame_index)
    assert(mixed.length === 4) // id 3 → 4 frames
    assert(mixed.init.forall(_.decode_ok), "earlier frames must survive")
    assert(!mixed.last.decode_ok, "the zeroed frame must fail alone")
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

  // ---- real codecs: genuine containers synthesized in-test, no fixtures

  private def pngBytes(w: Int, h: Int, rgb: Int): Array[Byte] = {
    val img = new java.awt.image.BufferedImage(
      w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
    (0 until h).foreach(y => (0 until w).foreach(x => img.setRGB(x, y, rgb)))
    val bos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "png", bos)
    bos.toByteArray
  }

  test("decodeImages reads real PNGs: dimensions, luma, histogram; corrupt → decode_ok=false") {
    import spark.implicits._
    val imgs = Seq(
      (1L, pngBytes(40, 30, 0xFFFFFF)),          // white: luma 255
      (2L, pngBytes(8, 8, 0x000000)),            // black: luma 0
      (3L, pngBytes(16, 4, 0xFF0000)),           // red: luma = 0.299*255 ≈ 76.2
      (4L, "not an image at all".getBytes("UTF-8"))
    ).toDF("media_id", "media")
    val out = Multimodal.decodeImages(spark, imgs).collect()
      .map(f => f.media_id -> f).toMap
    assert(out(1L).decode_ok && out(1L).width === 40 && out(1L).height === 30)
    assert(math.abs(out(1L).mean_luma - 255.0) < 1e-6)
    assert(out(1L).luma_hist(7) === 1.0f)        // all pixels in the top bin
    assert(out(2L).decode_ok && math.abs(out(2L).mean_luma) < 1e-6)
    assert(out(2L).luma_hist(0) === 1.0f)
    assert(out(3L).decode_ok && math.abs(out(3L).mean_luma - 0.299 * 255) < 0.5)
    assert(!out(4L).decode_ok)
  }

  test("resizeImages scales real images (aspect kept, no upscale, undecodable pass through)") {
    import spark.implicits._
    val imgs = Seq(
      (1L, pngBytes(200, 100, 0x00FF00)),
      (2L, pngBytes(10, 10, 0x0000FF)),
      (3L, "garbage".getBytes("UTF-8"))
    ).toDF("media_id", "media")
    val resized = Multimodal.resizeImages(spark, imgs, maxDim = 50)
    val back = Multimodal.decodeImages(spark, resized).collect()
      .map(f => f.media_id -> f).toMap
    assert(back(1L).decode_ok && back(1L).width === 50 && back(1L).height === 25)
    assert(back(2L).decode_ok && back(2L).width === 10, "small image must not upscale")
    assert(!back(3L).decode_ok, "garbage passes through unchanged")
    // green survives the resample
    assert(math.abs(back(1L).mean_luma - 0.587 * 255) < 1.0)
  }

  private def wavBytes(rate: Int, samples: Array[Short]): Array[Byte] = {
    val dataLen = samples.length * 2
    val buf = java.nio.ByteBuffer.allocate(44 + dataLen)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    buf.put("RIFF".getBytes("US-ASCII")).putInt(36 + dataLen)
      .put("WAVE".getBytes("US-ASCII"))
      .put("fmt ".getBytes("US-ASCII")).putInt(16)
      .putShort(1).putShort(1)                       // PCM, mono
      .putInt(rate).putInt(rate * 2).putShort(2)     // byte rate, block align
      .putShort(16)                                  // bits
      .put("data".getBytes("US-ASCII")).putInt(dataLen)
    samples.foreach(buf.putShort)
    buf.array()
  }

  test("decodeWav parses real RIFF PCM: rate, count, RMS; truncated → decode_ok=false") {
    import spark.implicits._
    val square = Array.fill[Short](1000)(1000) // constant amplitude → RMS = 1000
    val wavs = Seq(
      (1L, wavBytes(16000, square)),
      (2L, wavBytes(44100, Array[Short](0, 0, 0, 0))),
      (3L, "RIFFxxxxWAVEbroken".getBytes("US-ASCII"))
    ).toDF("media_id", "media")
    val out = Multimodal.decodeWav(spark, wavs).collect()
      .map(w => w.media_id -> w).toMap
    assert(out(1L).decode_ok && out(1L).sample_rate === 16000 &&
      out(1L).channels === 1 && out(1L).bits === 16 && out(1L).n_samples === 1000L)
    assert(math.abs(out(1L).rms - 1000.0) < 1e-9)
    assert(out(2L).decode_ok && out(2L).rms === 0.0 && out(2L).n_samples === 4L)
    assert(!out(3L).decode_ok)
  }

  test("exifMeta parses real TIFF-in-APP1 under BOTH byte orders; damage isolated per row") {
    import spark.implicits._
    val ids = spark.range(0, 10).toDF("doc_id")
    val synth = Multimodal.synthesizeJpegWithExif(spark, ids, "doc_id")
    val out = Multimodal.exifMeta(spark, synth).collect()
      .map(m => m.media_id -> m).toMap
    (0L until 10L).foreach { id =>
      val m = out(id)
      assert(m.exif_ok, s"id $id")
      assert(m.byte_order == (if (id % 2 == 0) "II" else "MM"))
      assert(m.orientation == (1 + id % 8).toInt)
      assert(m.make == s"cam_${id % 5}")
      assert(m.datetime == f"2024:01:${1 + id % 28}%02d 00:00:00")
    }
    // the EXIF-bearing JPEGs still DECODE as images (the splice is a
    // valid segment, not a corruption)
    val dec = Multimodal.decodeImages(spark, synth).collect()
    assert(dec.forall(_.decode_ok) && dec.forall(f => f.width == 8 && f.height == 8))
    // a plain PNG (no APP1) and a truncated APP1 fail ALONE
    val plain = Multimodal.synthesizeImages(spark, ids.where($"doc_id" < 1), "doc_id")
    val damaged = synth.as[(Long, Array[Byte])].map { case (id, b) =>
      if (id == 3L) (id, b.take(12)) else (id, b) // cut inside APP1
    }.toDF("media_id", "media").unionByName(plain)
    val got = Multimodal.exifMeta(spark, damaged).collect()
      .map(m => m.media_id -> m.exif_ok).toMap
    assert(!got(3L), "truncated APP1 must fail its own row")
    assert(got(4L) && got(5L), "siblings must survive")
    // the plain PNG shares media_id 0 with an exif row — both rows exist,
    // one ok and one not (damage is per-ROW, keyed by payload)
    val zeroRows = Multimodal.exifMeta(spark, damaged).collect()
      .filter(_.media_id == 0L).map(_.exif_ok).sorted.toSeq
    assert(zeroRows == Seq(false, true))
  }

  test("video fingerprint recovers the frame-luma law; near-dup pairs are the congruence classes") {
    import spark.implicits._
    val ids = (0L until 26L).toDF("doc_id")
    val fp = Multimodal.videoFingerprint(spark,
      Multimodal.synthesizeAvi(spark, ids, "doc_id"))
    val rows = fp.collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    for (id <- 0L until 26L; f <- 0L to id % 4)
      assert(rows((id, f)) === 1 + (id + f) % 13, s"($id, $f)")
    // pairs fire iff id_a ≡ id_b (mod 13) — then every sampled frame of
    // the shorter video matches, so shared = min(n_a, n_b)
    val got = Multimodal.videoNearDupPairs(fp, minShared = 1)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    val expected = (for {
      a <- 0L until 26L; b <- 0L until 26L
      if a < b && a % 13 == b % 13
    } yield (a, b, math.min(1 + a % 4, 1 + b % 4))).toSet
    assert(got === expected)
    // spot pins: (0,13) shares min(1,2)=1; (2,15) shares min(3,4)=3
    assert(got.contains((0L, 13L, 1L)) && got.contains((2L, 15L, 3L)))
  }

  test("bigram near-dup equals the per-frame generator where runs exist; isolated positions are the documented miss") {
    import spark.implicits._
    // on the AVI fixture every shared set is a prefix (consecutive), so
    // the two generators must converge exactly at minShared = 2
    val ids = (0L until 26L).toDF("doc_id")
    val fp = Multimodal.videoFingerprint(spark,
      Multimodal.synthesizeAvi(spark, ids, "doc_id"))
    def collect(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(collect(Multimodal.videoNearDupPairsBigram(fp, minShared = 2))
      === collect(Multimodal.videoNearDupPairs(fp, minShared = 2)))
    // hand-built fingerprints: A~B share positions 0 and 2 (ISOLATED —
    // no adjacent pair), A~C share the run 0,1,2. The bigram generator
    // finds A~C with the exact count and — by the documented recall
    // contract — misses A~B; the per-frame generator finds both.
    val hand = Seq(
      (1L, 0L, 5L), (1L, 1L, 1L), (1L, 2L, 6L), (1L, 3L, 2L),
      (2L, 0L, 5L), (2L, 1L, 9L), (2L, 2L, 6L), (2L, 3L, 8L),
      (3L, 0L, 5L), (3L, 1L, 1L), (3L, 2L, 6L), (3L, 3L, 7L))
      .toDF("media_id", "frame_index", "qluma")
    assert(collect(Multimodal.videoNearDupPairs(hand, minShared = 2))
      === Set((1L, 2L, 2L), (1L, 3L, 3L), (2L, 3L, 2L)))
    assert(collect(Multimodal.videoNearDupPairsBigram(hand, minShared = 2))
      === Set((1L, 3L, 3L)))
    // minShared < 2 has no bigram witness — refused loudly
    intercept[IllegalArgumentException] {
      Multimodal.videoNearDupPairsBigram(hand, minShared = 1)
    }
  }

  test("keyframe pHashes: one hash per sampled frame through the real decode; corrupt containers contribute nothing") {
    import spark.implicits._
    val ids = (0L until 12L).toDF("doc_id")
    val kf = Multimodal.videoKeyframePhashes(spark,
      Multimodal.synthesizeAvi(spark, ids, "doc_id"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    // one row per (id, frame) — frames = 1 + id % 4, every frame decodes
    val expected = (for (id <- 0L until 12L; f <- 0L to id % 4) yield (id, f)).toSet
    assert(kf === expected)
    val corrupt = Seq((99L, "not an avi".getBytes("UTF-8")))
      .toDF("media_id", "media")
    assert(Multimodal.videoKeyframePhashes(spark, corrupt).count() === 0L)
  }

  test("keyframe near-dup: compound-block candidates + exact verify equal brute force on planted hashes") {
    import spark.implicits._
    // groups of 3 share per-frame base hashes; variant flips v low bits
    // (distance ≤ 2 ≤ 7 at every frame); cross-group bases are xxhash
    // bits (~31 apart). 60 videos × 4 frames.
    def baseHash(g: Long, f: Long): Long = {
      var h = 0L
      for (k <- 0 until 63)
        if (((g * 2654435761L + f * 40503L + k * 69427L) >>> 7) % 2 == 0)
          h |= 1L << k
      h
    }
    val rows = for {
      id <- 0L until 60L; f <- 0L until 4L
    } yield (id, f, baseHash(id / 3, f) ^ ((1L << (id % 3).toInt) - 1L))
    val fp = rows.toDF("media_id", "frame_index", "phash")
    val got = Multimodal.videoNearDupPairsKeyframe(fp, maxDist = 7, minShared = 2)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    // brute force over the same planted hashes
    val byId = rows.groupBy(_._1)
    val expected2 = (for {
      a <- 0L until 60L; b <- 0L until 60L if a < b
    } yield {
      val ha = byId(a).map(r => r._2 -> r._3).toMap
      val hb = byId(b).map(r => r._2 -> r._3).toMap
      val shared = ha.keys.count(f => hb.get(f).exists(h =>
        java.lang.Long.bitCount(ha(f) ^ h) <= 7))
      (a, b, shared.toLong)
    }).filter(_._3 >= 2).toSet
    assert(got === expected2)
    assert(got.nonEmpty)
  }

  test("resizeImages honors EXIF orientation: rotated fixtures come out upright") {
    import spark.implicits._
    // an asymmetric 8x4 gradient JPEG with a REAL spliced EXIF segment;
    // orientation = 1 + id % 8, so ids pin identity(0), mirror-H(1),
    // rotate-180(2), rotate-90-CW(5), rotate-270-CW(7)
    def jpegGradient(): Array[Byte] = {
      val img = new java.awt.image.BufferedImage(
        8, 4, java.awt.image.BufferedImage.TYPE_INT_RGB)
      for (y <- 0 until 4; x <- 0 until 8) {
        val l = x * 30 + y * 8
        img.setRGB(x, y, (l << 16) | (l << 8) | l)
      }
      val bos = new java.io.ByteArrayOutputStream()
      javax.imageio.ImageIO.write(img, "jpg", bos)
      bos.toByteArray
    }
    val jpeg = jpegGradient()
    // the reference pixels every orientation is compared against are the
    // DECODED jpeg's (JPEG is lossy; the transform itself is exact)
    val src = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(jpeg))
    def px(img: java.awt.image.BufferedImage)(x: Int, y: Int) = img.getRGB(x, y)
    val media = Seq(0L, 1L, 2L, 5L, 7L)
      .map(id => (id, Multimodal.spliceExif(jpeg, id)))
      .toDF("media_id", "media")
    val out = Multimodal.resizeImages(spark, media, maxDim = 100)
      .collect().map(r => r.getLong(0) -> r.getAs[Array[Byte]](1)).toMap
    def decoded(id: Long) =
      javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(out(id)))
    // orientation 1 (id 0): already upright AND under maxDim → the blob
    // passes through byte-identical (no needless re-encode)
    assert(out(0L).sameElements(Multimodal.spliceExif(jpeg, 0L)))
    // orientation 2 (id 1): mirror horizontal, dims kept
    val m = decoded(1L)
    assert(m.getWidth === 8 && m.getHeight === 4)
    for (y <- 0 until 4; x <- 0 until 8)
      assert(px(m)(x, y) === px(src)(7 - x, y), s"mirror-H at ($x,$y)")
    // orientation 3 (id 2): rotate 180
    val r180 = decoded(2L)
    for (y <- 0 until 4; x <- 0 until 8)
      assert(px(r180)(x, y) === px(src)(7 - x, 3 - y), s"rot180 at ($x,$y)")
    // orientation 6 (id 5): rotate 90 CW — dims swap, top row becomes
    // the right column
    val r90 = decoded(5L)
    assert(r90.getWidth === 4 && r90.getHeight === 8)
    for (y <- 0 until 8; x <- 0 until 4)
      assert(px(r90)(x, y) === px(src)(y, 3 - x), s"rot90 at ($x,$y)")
    // orientation 8 (id 7): rotate 270 CW
    val r270 = decoded(7L)
    assert(r270.getWidth === 4 && r270.getHeight === 8)
    for (y <- 0 until 8; x <- 0 until 4)
      assert(px(r270)(x, y) === px(src)(7 - y, x), s"rot270 at ($x,$y)")
  }

  test("orientation composes with scaling: a sideways image scales to its UPRIGHT bound") {
    import spark.implicits._
    // 100x40 image, orientation 6 (id 5) → upright is 40x100; maxDim 50
    // must scale against the UPRIGHT dims (50 tall), not the raw ones
    val img = new java.awt.image.BufferedImage(
      100, 40, java.awt.image.BufferedImage.TYPE_INT_RGB)
    for (y <- 0 until 40; x <- 0 until 100)
      img.setRGB(x, y, if (x < 50) 0xFFFFFF else 0)
    val bos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "jpg", bos)
    val media = Seq((5L, Multimodal.spliceExif(bos.toByteArray, 5L)))
      .toDF("media_id", "media")
    val out = Multimodal.resizeImages(spark, media, maxDim = 50)
    val back = Multimodal.decodeImages(spark, out).collect().head
    assert(back.decode_ok && back.width === 20 && back.height === 50)
  }
}
