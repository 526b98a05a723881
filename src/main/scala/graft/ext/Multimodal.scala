package graft.ext

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal-column plumbing: image/audio/video as opaque `BINARY` columns
  * with typed metadata, plus decode / feature-extract / resize /
  * frame-sample stages.
  *
  * Codec status: image decode/resize (PNG/JPEG/GIF/BMP via the JDK's
  * javax.imageio — no external library), WAV PCM parsing (RIFF chunk walk +
  * 16-bit samples, pure byte arithmetic), and MP4 container metadata
  * (ISO BMFF `ftyp`/`moov` box walk — brand, timescale/duration, track
  * count, codec fourccs) are all REAL ([[decodeImages]], [[resizeImages]],
  * [[decodeWav]], [[decodeMp4]], spec'd against synthesized genuine
  * containers). Video FRAME decode (the pixel half) needs a codec the JDK
  * does not ship and is out of scope — container metadata is the part a
  * curation pipeline filters on (duration/track/codec routing) before any
  * GPU decode stage.
  *
  * At 100 TB: binary payloads dominate row size, so every stage here is a
  * narrow map (no shuffle), metadata-only queries prune the binary column
  * at the Parquet scan (columnar — check ReadSchema), and feature extraction
  * emits small fixed-width vectors so downstream joins/aggs never carry the
  * blob.
  */
object Multimodal {

  final case class MediaRow(media_id: Long, media: Array[Byte], format: String, n_bytes: Long)

  /** Wrap any text corpus as an opaque-binary media table (UTF-8 payload
    * standing in for an encoded image/audio blob). Schema is the contract:
    * (media_id BIGINT, media BINARY, format STRING, n_bytes BIGINT). */
  def asMediaTable(docs: DataFrame, idCol: String, payloadCol: String): DataFrame =
    docs.select(
      col(idCol).cast("long").as("media_id"),
      encode(col(payloadCol), "UTF-8").as("media"),
      element_at(array(lit("png"), lit("jpeg"), lit("wav"), lit("mp4")),
        (pmod(col(idCol), lit(4)) + 1).cast("int")).as("format"),
      octet_length(encode(col(payloadCol), "UTF-8")).cast("long").as("n_bytes"))

  import org.apache.spark.sql.Column

  private val pngMagic = Array[Byte](0x89.toByte, 'P', 'N', 'G', 0x0D, 0x0A, 0x1A, 0x0A)
  private val jpegMagic = Array[Byte](0xFF.toByte, 0xD8.toByte, 0xFF.toByte, 0xE0.toByte)
  private val wavMagic = "RIFF".getBytes("US-ASCII") ++ Array[Byte](0, 0, 0, 0) ++
    "WAVE".getBytes("US-ASCII")
  private val mp4Magic = Array[Byte](0, 0, 0, 0x18) ++ "ftyp".getBytes("US-ASCII")

  /** Prepend the container's real magic-byte header to each payload —
    * the synthesized blobs then carry genuine sniffable signatures
    * (PNG \x89PNG, JPEG SOI, RIFF/WAVE, MP4 ftyp). Narrow map. */
  def withMagic(media: DataFrame): DataFrame =
    media.withColumn("media", concat(
        when(col("format") === "png", lit(pngMagic))
          .when(col("format") === "jpeg", lit(jpegMagic))
          .when(col("format") === "wav", lit(wavMagic))
          .otherwise(lit(mp4Magic)),
        col("media")))
      .withColumn("n_bytes", octet_length(col("media")).cast("long"))

  /** Container-format detection from the BYTES alone — the type-sniffing
    * pass a crawl pipeline runs before routing blobs to codecs (file
    * extensions and declared MIME types lie; magic bytes don't). Pure
    * expression tree over binary substrings: no UDF, no codec. */
  def sniffFormat(bin: Column): Column =
    when(substring(bin, 1, 8) === lit(pngMagic), "png")
      .when(substring(bin, 1, 3) === lit(jpegMagic.take(3)), "jpeg")
      .when(substring(bin, 1, 4) === lit("RIFF".getBytes("US-ASCII")) &&
        substring(bin, 9, 4) === lit("WAVE".getBytes("US-ASCII")), "wav")
      .when(substring(bin, 5, 4) === lit("ftyp".getBytes("US-ASCII")), "mp4")
      .otherwise("unknown")

  /** Metadata-only pass: never touches payload bytes beyond length/digest —
    * pure expression work, oracle-expressible (sha256 exists in DuckDB). */
  def mediaMetadata(media: DataFrame): DataFrame =
    media.select(col("media_id"), col("format"), col("n_bytes"),
      sha2(col("media"), 256).as("digest"))

  /** "Resize": cap payloads at maxBytes (narrow map; [[resizeImages]] is
    * the real re-encoding form for decodable images). */
  def resize(media: DataFrame, maxBytes: Int): DataFrame =
    media.withColumn("media",
        when(octet_length(col("media")) > maxBytes,
          substring(col("media"), 1, maxBytes)).otherwise(col("media")))
      .withColumn("n_bytes", octet_length(col("media")).cast("long"))

  /** Frame-sample a "video" blob: every `stride`-th chunk of `frameBytes`
    * bytes becomes one frame row (media_id, frame_no, frame BINARY).
    * frame_no is the index within the sampled sequence. */
  def sampleFrames(media: DataFrame, frameBytes: Int, stride: Int): DataFrame =
    media.select(col("media_id"),
      posexplode(expr(
        s"""transform(
           |  filter(sequence(0, greatest(int(octet_length(media) / $frameBytes) - 1, 0)),
           |         i -> i % $stride = 0),
           |  i -> substring(media, i * $frameBytes + 1, $frameBytes))""".stripMargin))
        .as(Seq("frame_no", "frame")))

  // --------------------------------------------------------- real codecs
  // The JDK ships an image codec (javax.imageio: PNG/JPEG/GIF/BMP) and WAV
  // is a trivially parseable RIFF container — so these paths decode REAL
  // bytes with zero external dependencies. Each decoder runs inside
  // mapPartitions (partition-local, no shuffle, blob dropped from the
  // output), and failed decodes surface as decode_ok=false rows instead of
  // task failures: at crawl scale corrupt blobs are data, not errors.

  final case class ImageFeatures(
      media_id: Long, decode_ok: Boolean, width: Int, height: Int,
      mean_luma: Double, luma_hist: Array[Float])

  private def lumaOf(rgb: Int): Double = {
    val (r, g, b) = ((rgb >> 16) & 0xff, (rgb >> 8) & 0xff, rgb & 0xff)
    0.299 * r + 0.587 * g + 0.114 * b
  }

  /** REAL image decode + features: dimensions, mean luma, 8-bin luma
    * histogram. Pixels are traversed once; features are fixed-width. */
  def decodeImages(spark: SparkSession, media: DataFrame): Dataset[ImageFeatures] = {
    import spark.implicits._
    media.select("media_id", "media").as[(Long, Array[Byte])].mapPartitions(_.map {
      case (id, bytes) =>
        try {
          val img = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(bytes))
          if (img == null) ImageFeatures(id, decode_ok = false, 0, 0, 0.0, Array.fill(8)(0f))
          else {
            val (w, h) = (img.getWidth, img.getHeight)
            var sum = 0.0
            val hist = new Array[Float](8)
            var y = 0
            while (y < h) {
              var x = 0
              while (x < w) {
                val l = lumaOf(img.getRGB(x, y))
                sum += l
                hist((l / 32).toInt.min(7)) += 1f
                x += 1
              }
              y += 1
            }
            val n = (w * h).toFloat
            ImageFeatures(id, decode_ok = true, w, h, sum / n, hist.map(_ / n))
          }
        } catch {
          case _: Exception =>
            ImageFeatures(id, decode_ok = false, 0, 0, 0.0, Array.fill(8)(0f))
        }
    })
  }

  /** REAL image resize: decode, HONOR the EXIF orientation (tag 0x0112
    * — [[applyOrientation]]; the JDK decoder returns raw sensor pixels,
    * so skipping this ships sideways/mirrored thumbnails, the classic
    * resize-pipeline bug), scale the UPRIGHT image to fit `maxDim`
    * (aspect preserved, never upscale), re-encode PNG. An image that
    * needs re-orienting is re-encoded even when it already fits —
    * orientation is a correction, not an optimization. Undecodable
    * blobs pass through unchanged — the resize pass must not destroy
    * data it can't read. */
  def resizeImages(spark: SparkSession, media: DataFrame, maxDim: Int): DataFrame = {
    import spark.implicits._
    val resized = media.select("media_id", "media").as[(Long, Array[Byte])]
      .mapPartitions(_.map { case (id, bytes) =>
        val out =
          try {
            val raw = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(bytes))
            if (raw == null) bytes
            else {
              val orientation = exifFields(bytes).map(_._2).getOrElse(1)
              val img = applyOrientation(raw, orientation)
              if (img.eq(raw) && img.getWidth <= maxDim && img.getHeight <= maxDim)
                bytes
              else {
                val dst =
                  if (img.getWidth <= maxDim && img.getHeight <= maxDim) img
                  else {
                    val scale = maxDim.toDouble / math.max(img.getWidth, img.getHeight)
                    val (w, h) = (math.max(1, (img.getWidth * scale).toInt),
                      math.max(1, (img.getHeight * scale).toInt))
                    val scaled = new java.awt.image.BufferedImage(
                      w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
                    val g = scaled.createGraphics()
                    try g.drawImage(img.getScaledInstance(
                      w, h, java.awt.Image.SCALE_AREA_AVERAGING), 0, 0, null)
                    finally g.dispose()
                    scaled
                  }
                val bos = new java.io.ByteArrayOutputStream()
                javax.imageio.ImageIO.write(dst, "png", bos)
                bos.toByteArray
              }
            }
          } catch { case _: Exception => bytes }
        (id, out)
      }).toDF("media_id", "media")
    resized.withColumn("n_bytes", octet_length(col("media")).cast("long"))
  }

  /** Synthesize one REAL solid-color PNG per input row, dimensions and
    * color derived arithmetically from the id — the encode half of the
    * codec round-trip, and the reason Q116 can be oracle-checked: every
    * decoded property (width, height, luma) is a pure function of the id
    * that DuckDB recomputes without any codec. */
  def synthesizeImages(spark: SparkSession, ids: DataFrame, idCol: String): DataFrame = {
    import spark.implicits._
    ids.select(col(idCol).cast("long")).as[Long].mapPartitions(_.map { id =>
      val (w, h) = ((8 + id % 8).toInt, (8 + (id / 8) % 8).toInt)
      val rgb = (((id * 37) % 256) << 16 | ((id * 59) % 256) << 8 | ((id * 83) % 256)).toInt
      val img = new java.awt.image.BufferedImage(
        w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
      var y = 0
      while (y < h) { var x = 0; while (x < w) { img.setRGB(x, y, rgb); x += 1 }; y += 1 }
      val bos = new java.io.ByteArrayOutputStream()
      javax.imageio.ImageIO.write(img, "png", bos)
      (id, bos.toByteArray)
    }).toDF("media_id", "media")
  }

  final case class WavStats(
      media_id: Long, decode_ok: Boolean, channels: Int, sample_rate: Int,
      bits: Int, n_samples: Long, rms: Double)

  private def le16(b: Array[Byte], off: Int): Int =
    (b(off) & 0xff) | ((b(off + 1) & 0xff) << 8)
  private def le32(b: Array[Byte], off: Int): Int =
    (b(off) & 0xff) | ((b(off + 1) & 0xff) << 8) |
      ((b(off + 2) & 0xff) << 16) | ((b(off + 3) & 0xff) << 24)

  /** REAL WAV parse: RIFF/WAVE chunk walk → fmt (channels, rate, bits) +
    * data (16-bit PCM samples → count + RMS). Pure byte arithmetic. */
  def decodeWav(spark: SparkSession, media: DataFrame): Dataset[WavStats] = {
    import spark.implicits._
    def fail(id: Long) = WavStats(id, decode_ok = false, 0, 0, 0, 0L, 0.0)
    media.select("media_id", "media").as[(Long, Array[Byte])].mapPartitions(_.map {
      case (id, b) =>
        try {
          if (b.length < 12 ||
            new String(b, 0, 4, "US-ASCII") != "RIFF" ||
            new String(b, 8, 4, "US-ASCII") != "WAVE") fail(id)
          else {
            var (off, channels, rate, bits) = (12, 0, 0, 0)
            var stats: Option[(Long, Double)] = None
            while (off + 8 <= b.length) {
              val ckId = new String(b, off, 4, "US-ASCII")
              val ckSize = le32(b, off + 4)
              // corrupt negative chunk size: the walk would step back (or
              // by zero at -8/-9) and spin forever — fail the row instead
              if (ckSize < 0) throw new IllegalArgumentException(
                s"negative RIFF chunk size $ckSize")
              if (ckId == "fmt ") {
                channels = le16(b, off + 10); rate = le32(b, off + 12)
                bits = le16(b, off + 22)
              } else if (ckId == "data" && bits == 16) {
                val n = math.min(ckSize, b.length - off - 8) / 2
                var (i, sumSq) = (0, 0.0)
                while (i < n) {
                  val s = le16(b, off + 8 + 2 * i).toShort.toDouble
                  sumSq += s * s; i += 1
                }
                stats = Some((n.toLong, if (n == 0) 0.0 else math.sqrt(sumSq / n)))
              }
              off += 8 + ckSize + (ckSize & 1) // chunks are word-aligned
            }
            stats match {
              case Some((n, rms)) => WavStats(id, decode_ok = true, channels, rate, bits, n, rms)
              case None => fail(id)
            }
          }
        } catch { case _: Exception => fail(id) }
    })
  }

  // ------------------------------------------------------ MP4 (ISO BMFF)
  // The container-metadata half of video handling: an MP4 is a tree of
  // [size:be32][fourcc][payload] boxes; duration/timescale live in
  // moov/mvhd, one trak subtree per stream, and each track's codec fourcc
  // is the first sample-entry of trak/mdia/minf/stbl/stsd. Walking boxes
  // is pure byte arithmetic (same discipline as the WAV RIFF walk) — no
  // codec needed for the properties a curation pipeline routes on
  // (duration caps, track sanity, codec allow-lists). Frame/pixel decode
  // is explicitly out of scope: the JDK ships no video codec.

  final case class Mp4Meta(
      media_id: Long, decode_ok: Boolean, major_brand: String,
      timescale: Long, duration_ms: Long, n_tracks: Int, codecs: String)

  private def be32(b: Array[Byte], off: Int): Long =
    ((b(off) & 0xffL) << 24) | ((b(off + 1) & 0xffL) << 16) |
      ((b(off + 2) & 0xffL) << 8) | (b(off + 3) & 0xffL)

  /** Children of the byte range [start, end): (fourcc, payloadStart,
    * boxEnd). A box overrunning the range (truncated/corrupt container)
    * aborts the walk with a parse failure, never a partial read. */
  private def boxes(b: Array[Byte], start: Int, end: Int): List[(String, Int, Int)] = {
    var off = start
    val out = List.newBuilder[(String, Int, Int)]
    while (off + 8 <= end) {
      val size = be32(b, off)
      if (size < 8 || off + size > end) throw new IllegalArgumentException("box overrun")
      out += ((new String(b, off + 4, 4, "US-ASCII"), off + 8, off + size.toInt))
      off += size.toInt
    }
    if (off != end) throw new IllegalArgumentException("trailing garbage")
    out.result()
  }

  private def child(b: Array[Byte], start: Int, end: Int,
      fourcc: String): Option[(Int, Int)] =
    boxes(b, start, end).collectFirst { case (`fourcc`, s, e) => (s, e) }

  /** REAL MP4 container parse: `ftyp` major brand; `moov/mvhd` timescale +
    * duration (version 0 and 1 layouts); track count = `trak` boxes; codec
    * fourccs from each `trak/mdia/minf/stbl/stsd`'s first sample entry,
    * joined in track order. Corrupt/truncated blobs → `decode_ok=false`
    * rows (corrupt blobs are data, not task failures). Narrow map; the
    * blob never survives into the output row. */
  def decodeMp4(spark: SparkSession, media: DataFrame): Dataset[Mp4Meta] = {
    import spark.implicits._
    def fail(id: Long) = Mp4Meta(id, decode_ok = false, "", 0L, 0L, 0, "")
    media.select("media_id", "media").as[(Long, Array[Byte])].mapPartitions(_.map {
      case (id, b) =>
        try {
          val top = boxes(b, 0, b.length)
          val brand = top.collectFirst { case ("ftyp", s, e) if e - s >= 4 =>
            new String(b, s, 4, "US-ASCII")
          }
          val moov = top.collectFirst { case ("moov", s, e) => (s, e) }
          (brand, moov) match {
            case (Some(br), Some((ms, me))) =>
              val (timescale, duration) = child(b, ms, me, "mvhd") match {
                case Some((s, _)) =>
                  b(s) match {
                    case 0 => (be32(b, s + 12), be32(b, s + 16))
                    case 1 => (be32(b, s + 20),
                      (be32(b, s + 24) << 32) | be32(b, s + 28))
                    case _ => throw new IllegalArgumentException("mvhd version")
                  }
                case None => throw new IllegalArgumentException("no mvhd")
              }
              val codecs = boxes(b, ms, me).collect { case ("trak", ts, te) =>
                (for {
                  (s1, e1) <- child(b, ts, te, "mdia")
                  (s2, e2) <- child(b, s1, e1, "minf")
                  (s3, e3) <- child(b, s2, e2, "stbl")
                  (s4, e4) <- child(b, s3, e3, "stsd")
                  if e4 - s4 >= 16 && be32(b, s4 + 4) >= 1
                } yield new String(b, s4 + 12, 4, "US-ASCII"))
                  .getOrElse(throw new IllegalArgumentException("no sample entry"))
              }
              if (timescale <= 0) fail(id)
              else Mp4Meta(id, decode_ok = true, br, timescale,
                duration * 1000L / timescale, codecs.size, codecs.mkString(","))
            case _ => fail(id)
          }
        } catch { case _: Exception => fail(id) }
    })
  }

  // ------------------------------------------------------ AVI (RIFF) MJPEG
  // REAL video frame decode, the honest zero-dependency path: the JDK
  // ships no H.264/HEVC codec (MP4 stays container-only above, stated),
  // but Motion-JPEG frames ARE baseline JPEGs, which javax.imageio
  // decodes — and MJPEG-in-AVI is a real interchange format (capture
  // cards, webcams, intermediate exports). An AVI is RIFF: little-endian
  // [fourcc][size:le32][payload, padded to even]; the header LIST 'hdrl'
  // carries 'avih' (frame timing, counts, dimensions), the LIST 'movi'
  // carries one '00dc'/'00db' chunk per video frame. Same byte-walk
  // discipline as the WAV/MP4 parsers; corrupt blobs → decode_ok=false
  // rows, never task failures.

  final case class AviMeta(
      media_id: Long, decode_ok: Boolean, us_per_frame: Long,
      total_frames: Long, n_streams: Int, width: Int, height: Int,
      n_video_chunks: Long)

  final case class AviFrame(
      media_id: Long, decode_ok: Boolean, frame_index: Long,
      width: Long, height: Long, mean_luma: Double)

  /** RIFF children of [start, end): (fourcc, payloadStart, payloadEnd).
    * Chunks pad to even; an overrun aborts the walk (truncated/corrupt
    * container — a parse failure, never a partial read). */
  private def riffChunks(b: Array[Byte], start: Int, end: Int): List[(String, Int, Int)] = {
    var off = start
    val out = List.newBuilder[(String, Int, Int)]
    while (off + 8 <= end) {
      val fourcc = new String(b, off, 4, "US-ASCII")
      val size = le32(b, off + 4).toLong & 0xffffffffL
      val pEnd = off + 8 + size
      if (pEnd > end) throw new IllegalArgumentException("riff chunk overrun")
      out += ((fourcc, off + 8, pEnd.toInt))
      off = (pEnd + (size & 1L)).toInt // even padding
    }
    out.result()
  }

  /** LIST chunks expose their list TYPE as the payload's first fourcc. */
  private def riffList(b: Array[Byte], chunks: List[(String, Int, Int)],
      listType: String): Option[(Int, Int)] =
    chunks.collectFirst {
      case ("LIST", s, e) if e - s >= 4 &&
        new String(b, s, 4, "US-ASCII") == listType => (s + 4, e)
    }

  /** REAL AVI container parse: 'avih' timing/count/dimension fields plus
    * the actual video-chunk census from the 'movi' list (the header's
    * dwTotalFrames is advisory in the wild; the movi walk is ground
    * truth a curation filter can trust). */
  def decodeAvi(spark: SparkSession, media: DataFrame): Dataset[AviMeta] = {
    import spark.implicits._
    def fail(id: Long) = AviMeta(id, decode_ok = false, 0L, 0L, 0, 0, 0, 0L)
    media.select("media_id", "media").as[(Long, Array[Byte])].mapPartitions(_.map {
      case (id, b) =>
        try {
          if (b.length < 12 || new String(b, 0, 4, "US-ASCII") != "RIFF" ||
            new String(b, 8, 4, "US-ASCII") != "AVI ")
            throw new IllegalArgumentException("not an AVI")
          val top = riffChunks(b, 12, b.length)
          val (hs, he) = riffList(b, top, "hdrl")
            .getOrElse(throw new IllegalArgumentException("no hdrl"))
          val (as, ae) = riffChunks(b, hs, he)
            .collectFirst { case ("avih", s, e) => (s, e) }
            .getOrElse(throw new IllegalArgumentException("no avih"))
          if (ae - as < 40) throw new IllegalArgumentException("short avih")
          val (ms, me) = riffList(b, top, "movi")
            .getOrElse(throw new IllegalArgumentException("no movi"))
          val nChunks = riffChunks(b, ms, me)
            .count(c => c._1 == "00dc" || c._1 == "00db").toLong
          AviMeta(id, decode_ok = true,
            us_per_frame = le32(b, as).toLong & 0xffffffffL,
            total_frames = le32(b, as + 16).toLong & 0xffffffffL,
            n_streams = le32(b, as + 24),
            width = le32(b, as + 32), height = le32(b, as + 36),
            n_video_chunks = nChunks)
        } catch { case _: Exception => fail(id) }
    })
  }

  /** REAL frame decode: every `stride`-th '00dc'/'00db' chunk's JPEG
    * bytes run through the actual JDK decoder (MJPEG frames are baseline
    * JPEGs), up to `maxFrames` per video — the frame-sampling shape a
    * pipeline uses (decode k evenly-spaced frames, featurize, route).
    * One output row per SAMPLED frame with pixel-derived features
    * (dimensions + mean luma, the decodeImages features); an
    * undecodable frame yields its row with decode_ok=false (frame-level
    * corruption is data too). Narrow map, blobs never survive into the
    * output. */
  def sampleAviFrames(spark: SparkSession, media: DataFrame,
      stride: Int = 1, maxFrames: Int = 8): Dataset[AviFrame] = {
    import spark.implicits._
    require(stride >= 1 && maxFrames >= 1, "stride/maxFrames must be >= 1")
    media.select("media_id", "media").as[(Long, Array[Byte])]
      .mapPartitions(_.flatMap { case (id, b) =>
        aviFrameFeatures(id, b, stride, maxFrames)
      })
  }

  /** The ONE per-blob frame-decode path every video surface uses (batch
    * [[sampleAviFrames]]/[[videoFingerprint]] and the streaming probe
    * [[graft.streaming.StreamVideoDup]] — stream and batch features
    * must never silently diverge): RIFF walk to 'movi', every
    * `stride`-th video chunk through the REAL JDK decoder, per-frame
    * dimensions + mean luma; frame-level corruption yields that frame's
    * row with decode_ok=false, container-level corruption one sentinel
    * row. */
  /** The ONE sampled-video-chunk enumeration every frame-consuming
    * surface shares ([[aviFrameFeatures]] and the keyframe hasher
    * [[videoKeyframePhashes]] must sample IDENTICAL frames or the luma
    * and pHash planes silently diverge): container validation, RIFF
    * walk to 'movi', every `stride`-th '00dc'/'00db' chunk up to
    * `maxFrames`, as (frameIndex, start, end) byte spans. Throws on
    * container-level damage — each caller maps that to its own
    * corrupt-blob shape. */
  private def sampledAviChunks(b: Array[Byte], stride: Int,
      maxFrames: Int): List[(Int, Int, Int)] = {
    if (b.length < 12 || new String(b, 0, 4, "US-ASCII") != "RIFF" ||
      new String(b, 8, 4, "US-ASCII") != "AVI ")
      throw new IllegalArgumentException("not an AVI")
    val top = riffChunks(b, 12, b.length)
    val (ms, me) = riffList(b, top, "movi")
      .getOrElse(throw new IllegalArgumentException("no movi"))
    riffChunks(b, ms, me).iterator
      .filter(c => c._1 == "00dc" || c._1 == "00db")
      .zipWithIndex
      .filter { case (_, i) => i % stride == 0 }
      .take(maxFrames)
      .map { case ((_, s, e), i) => (i, s, e) }
      .toList
  }

  private[graft] def aviFrameFeatures(id: Long, b: Array[Byte],
      stride: Int, maxFrames: Int): List[AviFrame] =
    try {
      sampledAviChunks(b, stride, maxFrames)
        .map { case (i, s, e) =>
          try {
            val img = javax.imageio.ImageIO.read(
              new java.io.ByteArrayInputStream(b, s, e - s))
            if (img == null) AviFrame(id, decode_ok = false, i.toLong, 0L, 0L, 0.0)
            else {
              val (w, h) = (img.getWidth, img.getHeight)
              var sum = 0.0
              var y = 0
              while (y < h) {
                var x = 0
                while (x < w) { sum += lumaOf(img.getRGB(x, y)); x += 1 }
                y += 1
              }
              AviFrame(id, decode_ok = true, i.toLong, w.toLong, h.toLong,
                sum / (w * h))
            }
          } catch {
            case _: Exception => AviFrame(id, decode_ok = false, i.toLong, 0L, 0L, 0.0)
          }
        }.toList
    } catch {
      case _: Exception =>
        List(AviFrame(id, decode_ok = false, -1L, 0L, 0L, 0.0))
    }

  private def leBytes32(v: Long): Array[Byte] =
    Array((v & 0xff).toByte, ((v >> 8) & 0xff).toByte,
      ((v >> 16) & 0xff).toByte, ((v >> 24) & 0xff).toByte)

  private def riffChunk(fourcc: String, payload: Array[Byte]): Array[Byte] = {
    val pad = if (payload.length % 2 == 1) Array(0.toByte) else Array.empty[Byte]
    fourcc.getBytes("US-ASCII") ++ leBytes32(payload.length.toLong) ++ payload ++ pad
  }

  private def riffListBytes(listType: String, payload: Array[Byte]): Array[Byte] =
    riffChunk("LIST", listType.getBytes("US-ASCII") ++ payload)

  /** Synthesize one REAL MJPEG AVI per input row — the q116/q163 pattern
    * for frame-level video: every container property AND every sampled
    * frame's dimensions are pure functions of the id the oracle
    * recomputes codec-free, and each frame is a SOLID-GRAY real JPEG
    * (25 fps: us_per_frame = 40000):
    *   width     = 8 + id mod 8, height = 8 + (id / 8) mod 8,
    *   frames    = 1 + id mod 4,
    *   gray(f)   = 16 + 16·((id + f) mod 13)  — decoded mean luma lands
    *               within JPEG's DC-quantization error (< ~2) of this.
    * Solid gray survives 4:2:0 chroma subsampling exactly (Cb=Cr=128),
    * so the only loss is the luma DC quantizer — which is what makes a
    * tight luma band honest to gate on. */
  def synthesizeAvi(spark: SparkSession, ids: DataFrame, idCol: String): DataFrame = {
    import spark.implicits._
    ids.select(col(idCol).cast("long")).as[Long].mapPartitions(_.map { id =>
      val (w, h) = ((8 + id % 8).toInt, (8 + (id / 8) % 8).toInt)
      val nFrames = (1 + id % 4).toInt
      val frames = (0 until nFrames).map { f =>
        val v = (16 + 16 * ((id + f) % 13)).toInt
        val img = new java.awt.image.BufferedImage(
          w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
        val rgb = (v << 16) | (v << 8) | v
        var y = 0
        while (y < h) { var x = 0; while (x < w) { img.setRGB(x, y, rgb); x += 1 }; y += 1 }
        val bos = new java.io.ByteArrayOutputStream()
        javax.imageio.ImageIO.write(img, "jpg", bos)
        riffChunk("00dc", bos.toByteArray)
      }
      val avih = new Array[Byte](56)
      System.arraycopy(leBytes32(40000L), 0, avih, 0, 4) // usPerFrame (25fps)
      System.arraycopy(leBytes32(nFrames.toLong), 0, avih, 16, 4)
      System.arraycopy(leBytes32(1L), 0, avih, 24, 4) // one stream
      System.arraycopy(leBytes32(w.toLong), 0, avih, 32, 4)
      System.arraycopy(leBytes32(h.toLong), 0, avih, 36, 4)
      // minimal strl: strh (vids/MJPG) + strf (BITMAPINFOHEADER)
      val strh = {
        val p = new Array[Byte](56)
        System.arraycopy("vids".getBytes("US-ASCII"), 0, p, 0, 4)
        System.arraycopy("MJPG".getBytes("US-ASCII"), 0, p, 4, 4)
        riffChunk("strh", p)
      }
      val strf = {
        val p = new Array[Byte](40)
        System.arraycopy(leBytes32(40L), 0, p, 0, 4)
        System.arraycopy(leBytes32(w.toLong), 0, p, 4, 4)
        System.arraycopy(leBytes32(h.toLong), 0, p, 8, 4)
        riffChunk("strf", p)
      }
      val hdrl = riffListBytes("hdrl",
        riffChunk("avih", avih) ++ riffListBytes("strl", strh ++ strf))
      val movi = riffListBytes("movi", frames.flatten.toArray)
      val body = "AVI ".getBytes("US-ASCII") ++ hdrl ++ movi
      (id, "RIFF".getBytes("US-ASCII") ++ leBytes32(body.length.toLong) ++ body)
    }).toDF("media_id", "media")
  }

  private def beBytes(v: Long): Array[Byte] =
    Array(((v >> 24) & 0xff).toByte, ((v >> 16) & 0xff).toByte,
      ((v >> 8) & 0xff).toByte, (v & 0xff).toByte)

  private def box(fourcc: String, payload: Array[Byte]): Array[Byte] =
    beBytes(payload.length + 8L) ++ fourcc.getBytes("US-ASCII") ++ payload

  /** Synthesize one REAL (minimal, well-formed) MP4 box tree per input
    * row — the q116 pattern for video: every decoded property is a pure
    * function of the id that the oracle recomputes without a parser.
    *   timescale 1000 (so duration units == ms exactly),
    *   duration  = 500 + (id*37) mod 90000,
    *   tracks    = 1 + id mod 3,
    *   codec(t)  = [avc1, mp4a, hev1][(id + t) mod 3]. */
  def synthesizeMp4(spark: SparkSession, ids: DataFrame, idCol: String): DataFrame = {
    import spark.implicits._
    val codecNames = Array("avc1", "mp4a", "hev1")
    ids.select(col(idCol).cast("long")).as[Long].mapPartitions(_.map { id =>
      val ftyp = box("ftyp",
        "isom".getBytes("US-ASCII") ++ beBytes(0x200L) ++
          "isom".getBytes("US-ASCII") ++ "avc1".getBytes("US-ASCII"))
      val mvhdPayload = new Array[Byte](100) // version 0 fixed layout
      System.arraycopy(beBytes(1000L), 0, mvhdPayload, 12, 4) // timescale
      System.arraycopy(beBytes(500L + (id * 37) % 90000), 0, mvhdPayload, 16, 4)
      val mvhd = box("mvhd", mvhdPayload)
      val traks = (0 until (1 + (id % 3)).toInt).map { t =>
        val entry = box(codecNames(((id + t) % 3).toInt), new Array[Byte](8))
        val stsd = box("stsd", beBytes(0L) ++ beBytes(1L) ++ entry)
        box("trak", box("mdia", box("minf", box("stbl", stsd))))
      }
      (id, ftyp ++ box("moov", mvhd ++ traks.flatten))
    }).toDF("media_id", "media")
  }

  // ---------------------------------------- video near-dup (M8/D19)

  /** M8 — video-content fingerprint over the REAL frame-decode path:
    * one row per sampled frame carrying its QUANTIZED mean luma
    * (round(luma/16) — 16 luma buckets). Quantization is what makes
    * the signature decode-robust: MJPEG's DC quantizer moves a solid
    * frame's decoded mean by ±2.5 (the q239 measured band), far inside
    * a half-bucket of 8, so re-encodes land in the same bucket. Two
    * captures of one video agree bucket-for-bucket; unrelated videos
    * agree only by 1-in-16 chance per frame. */
  /** The ONE luma quantizer every video surface shares (batch
    * fingerprint, bundle prints, streaming probe). */
  private[graft] def qlumaCol(meanLuma: Column): Column =
    round(meanLuma / 16.0, 0).cast("long")

  def videoFingerprint(spark: SparkSession, media: DataFrame,
      stride: Int = 1, maxFrames: Int = 8): DataFrame =
    sampleAviFrames(spark, media, stride, maxFrames).toDF()
      .where(col("decode_ok"))
      .select(col("media_id"), col("frame_index"),
        qlumaCol(col("mean_luma")).as("qluma"))

  /** D19 — video-content near-dup: all pairs sharing ≥ `minShared`
    * (frame index, luma bucket) positions — the q26 bucket join with
    * the frame index as the band (the [[AudioFingerprint.nearDupPairs]]
    * shape on the video plane). Shuffle = one fixed-width row per
    * sampled FRAME; candidates scale with real content overlap — BUT
    * the key space is tiny (≤ maxFrames × 16 buckets ≈ 10² keys), so
    * cross-video collisions make the candidate stage N²-driven by
    * ~10⁴–10⁵ items (VideoProbe, BASELINE §Round 16: 104 s at 5×10⁴
    * vs [[videoNearDupPairsBigram]]'s 42 s, slopes 20× vs 4× per
    * 2.5× N). Past ~10⁴ corpus items use the bigram generator. */
  def videoNearDupPairs(fingerprint: DataFrame, minShared: Int): DataFrame = {
    val a = fingerprint.select(col("media_id").as("id_a"),
      col("frame_index"), col("qluma"))
    val b = fingerprint.select(col("media_id").as("id_b"),
      col("frame_index"), col("qluma"))
    a.join(b, Seq("frame_index", "qluma"))
      .where(col("id_a") < col("id_b"))
      .groupBy("id_a", "id_b")
      .agg(count(lit(1)).cast("long").as("shared"))
      .where(col("shared") >= minShared)
  }

  /** D19′ — the [[videoNearDupPairs]] SCALE path (the q251/Manku move
    * on the video plane): the per-frame join's bucket key is
    * (frame_index, qluma) — with ≤ `maxFrames` sampled positions and 16
    * luma buckets that is ~10² distinct keys TOTAL, so its candidate
    * volume degenerates as N²/10² almost immediately (the 8-bit-band
    * failure mode, only coarser). Candidates here come from CONSECUTIVE
    * luma BIGRAMS instead — key (frame_index, qluma_f, qluma_f+1), ~16×
    * the key space per position — followed by the SAME exact
    * shared-count verify over the full fingerprints, so emitted counts
    * are identical to the per-frame generator's. Recall contract
    * (explicit, the keySize-3 style trade): a pair is found iff it
    * shares ≥ 2 CONSECUTIVE positions — hence `minShared >= 2` is
    * required, and a pair whose ≥ minShared shared positions are all
    * isolated (no two adjacent) is missed. For re-encode/trim near-dups
    * — the operator's target — shared positions come in runs, so the
    * consecutive-pair witness exists whenever minShared ≥ 2 does. */
  def videoNearDupPairsBigram(fingerprint: DataFrame,
      minShared: Int): DataFrame = {
    require(minShared >= 2,
      "bigram recall guarantee needs minShared >= 2 " +
        "(candidates are witnessed by shared CONSECUTIVE positions)")
    val f = fingerprint.select(col("media_id"), col("frame_index"), col("qluma"))
    val nxt = f.select(col("media_id"),
      (col("frame_index") - 1).as("frame_index"), col("qluma").as("q1"))
    val bi = f.join(nxt, Seq("media_id", "frame_index"))
      .select(col("media_id"), col("frame_index"),
        col("qluma").as("q0"), col("q1"))
    val candidates = bi.select(col("media_id").as("id_a"),
        col("frame_index"), col("q0"), col("q1"))
      .join(bi.select(col("media_id").as("id_b"),
        col("frame_index"), col("q0"), col("q1")),
        Seq("frame_index", "q0", "q1"))
      .where(col("id_a") < col("id_b"))
      .select("id_a", "id_b").distinct()
    candidates
      .join(f.select(col("media_id").as("id_a"),
        col("frame_index"), col("qluma")), Seq("id_a"))
      .join(f.select(col("media_id").as("id_b"),
        col("frame_index"), col("qluma")), Seq("id_b", "frame_index", "qluma"))
      .groupBy("id_a", "id_b")
      .agg(count(lit(1)).cast("long").as("shared"))
      .where(col("shared") >= minShared)
  }

  /** D19″ — keyframe-pHash video fingerprint: one 63-bit perceptual
    * hash PER SAMPLED FRAME through the real MJPEG decode
    * ([[ImageHash.phashOfBytes]] on each '00dc' chunk — MJPEG frames
    * ARE baseline JPEGs). This is the decade fingerprint the luma tier
    * is not: 2⁶³ values per frame where [[videoFingerprint]] has 16,
    * so the candidate join below stays collision-driven instead of
    * going quadratic at 10⁵ (VideoProbe, BASELINE §Round 16 — the
    * measured ceiling of ANY join over the coarse signature). */
  def videoKeyframePhashes(spark: SparkSession, media: DataFrame,
      stride: Int = 1, maxFrames: Int = 8): DataFrame = {
    import spark.implicits._
    require(stride >= 1 && maxFrames >= 1, "stride/maxFrames must be >= 1")
    media.select("media_id", "media").as[(Long, Array[Byte])]
      .mapPartitions(_.flatMap { case (id, b) =>
        try {
          // THE shared chunk enumeration (sampledAviChunks) — this
          // surface and the luma plane must sample IDENTICAL frames
          sampledAviChunks(b, stride, maxFrames).flatMap { case (i, s, e) =>
            ImageHash.phashOfBytes(java.util.Arrays.copyOfRange(b, s, e))
              .map(h => (id, i.toLong, h))
          }
        } catch { case _: Exception => Nil } // corrupt container: no prints
      }).toDF("media_id", "frame_index", "phash")
  }

  /** D19″ — video near-dup over keyframe pHashes: pairs sharing ≥
    * `minShared` frame positions whose per-frame hashes sit within
    * Hamming `maxDist`. Candidates come from COMPOUND BLOCK KEYS per
    * frame ([[ImageHash.nearDupPairsBlocked]]'s Manku WWW'07 keys with
    * the frame index joined alongside — pigeonhole per frame: any
    * frame pair within d ≤ blocks−keySize collides in ≥ 1 key, so the
    * frame-match relation is EXACT, never sampled); the verify joins
    * the full per-frame hashes and counts matching positions. This is
    * the composition the measured decade tables justify end-to-end:
    * per-frame keys measured to 2×10⁷ hashes (BASELINE §Round 16
    * pHash), frame_index as the band (the q253/q255 shape). */
  def videoNearDupPairsKeyframe(keyframes: DataFrame, maxDist: Int = 7,
      minShared: Int = 1, blocks: Int = 9, keySize: Int = 2): DataFrame = {
    // THE shared Manku key builder (ImageHash.blockKeyCols — carries
    // the recall-critical math AND the blocks/keySize validity
    // requires, so an invalid keySize refuses instead of silently
    // yielding zero candidates)
    val keyed = keyframes.select(col("media_id"), col("frame_index"),
      explode(ImageHash.blockKeyCols(col("phash"), maxDist, blocks, keySize))
        .as("key"))
    val candidates = keyed.select(col("media_id").as("id_a"),
        col("frame_index"), col("key"))
      .join(keyed.select(col("media_id").as("id_b"),
        col("frame_index"), col("key")), Seq("frame_index", "key"))
      .where(col("id_a") < col("id_b"))
      .select("id_a", "id_b").distinct()
    val f = keyframes
    candidates
      .join(f.select(col("media_id").as("id_a"),
        col("frame_index"), col("phash").as("ha")), Seq("id_a"))
      .join(f.select(col("media_id").as("id_b"),
        col("frame_index"), col("phash").as("hb")), Seq("id_b", "frame_index"))
      .where(bit_count(col("ha").bitwiseXOR(col("hb"))) <= maxDist)
      .groupBy("id_a", "id_b")
      .agg(count(lit(1)).cast("long").as("shared"))
      .where(col("shared") >= minShared)
  }

  /** A loaded video-fingerprint bundle: the (frame_index, qluma)-
    * clustered print table probes bucket-join against, plus the match
    * floor ([[AudioFingerprint.Bundle]]'s shape on the video plane). */
  final case class VideoBundle(prints: DataFrame, minShared: Int)

  private val videoCache = Memo.unmanaged[VideoBundle]

  /** Serving memo for video bundles (lazy parquet reads — nothing
    * cluster-side to release; the bound caps JVM state). */
  def cachedVideo(key: String)(build: => VideoBundle): VideoBundle =
    videoCache(key)(build)

  /** The ONE candidate-join + shared-count tail every video serving
    * path uses (batch [[searchVideoBundle]] and the streaming probe
    * [[graft.streaming.StreamVideoDup]]): probe (frame_index, qluma)
    * rows equi-join the corpus prints, self-pairs excluded,
    * shared-count aggregate thresholded at `minShared`. */
  private[graft] def videoSharedCountPairs(probePrints: DataFrame,
      corpusPrints: DataFrame, minShared: Int): DataFrame =
    probePrints.join(corpusPrints, Seq("frame_index", "qluma"))
      .where(col("probe_id") =!= col("corpus_id"))
      .groupBy("probe_id", "corpus_id")
      .agg(count(lit(1)).cast("long").as("shared"))
      .where(col("shared") >= minShared)

  /** Near-dup pairs between probe VIDEOS and the stored corpus: the
    * probe side decodes + fingerprints itself (map-only), and joins the
    * corpus prints — candidate rows are row-group runs under the
    * (frame_index, qluma) clustering; the shared-count verify IS the
    * join's aggregate, no second fetch. */
  def searchVideoBundle(spark: SparkSession, bundle: VideoBundle,
      probeMedia: DataFrame): DataFrame =
    videoSharedCountPairs(
      videoFingerprint(spark, probeMedia)
        .withColumnRenamed("media_id", "probe_id"),
      bundle.prints, bundle.minShared)

  // ------------------------------------------------------------ EXIF (M5)
  //
  // The metadata plane of image curation: orientation (the tag every
  // resize/thumbnail pass must honor or ship sideways images),
  // capture-device make (dedup/provenance grouping), capture datetime
  // (temporal splits). EXIF is an APP1 JPEG segment carrying a TIFF
  // structure — endianness declared per file ("II" little / "MM" big),
  // IFD0 = a counted table of 12-byte (tag, type, count, value-or-offset)
  // entries. Both the writer and the reader below speak REAL
  // TIFF-in-APP1 bytes (the q116/q163 discipline: real format, real
  // parser, corruption surfaces as exif_ok=false), and the synthesizer
  // EXERCISES BOTH byte orders (id parity picks II vs MM) so the gate
  // proves the endian paths, not one happy path.

  final case class ExifMeta(media_id: Long, exif_ok: Boolean,
      byte_order: String, orientation: Int, make: String, datetime: String)

  private def exifTiff(id: Long): Array[Byte] = {
    val little = id % 2 == 0
    def u16(v: Int): Array[Byte] =
      if (little) Array((v & 0xff).toByte, ((v >> 8) & 0xff).toByte)
      else Array(((v >> 8) & 0xff).toByte, (v & 0xff).toByte)
    def u32(v: Long): Array[Byte] =
      if (little) leBytes32(v)
      else Array(((v >> 24) & 0xff).toByte, ((v >> 16) & 0xff).toByte,
        ((v >> 8) & 0xff).toByte, (v & 0xff).toByte)
    val make = s"cam_${id % 5}"
    val makeBytes = make.getBytes("US-ASCII") :+ 0.toByte
    val dt = f"2024:01:${1 + id % 28}%02d 00:00:00"
    val dtBytes = dt.getBytes("US-ASCII") :+ 0.toByte
    // header(8) + count(2) + 3 entries(36) + nextIFD(4) = 50 → data area
    val makeOff = 50L
    val dtOff = makeOff + makeBytes.length
    def entry(tag: Int, tpe: Int, count: Long,
        value: Array[Byte]): Array[Byte] =
      u16(tag) ++ u16(tpe) ++ u32(count) ++ value.padTo(4, 0.toByte)
    val header = (if (little) "II" else "MM").getBytes("US-ASCII") ++
      u16(42) ++ u32(8L)
    // entries in ascending tag order (the TIFF requirement):
    // 0x010F Make (ASCII @offset), 0x0112 Orientation (SHORT inline,
    // left-justified in the 4-byte value field under either order),
    // 0x0132 DateTime (ASCII @offset)
    val entries =
      entry(0x010f, 2, makeBytes.length.toLong, u32(makeOff)) ++
        entry(0x0112, 3, 1L, u16((1 + id % 8).toInt)) ++
        entry(0x0132, 2, dtBytes.length.toLong, u32(dtOff))
    header ++ u16(3) ++ entries ++ u32(0L) ++ makeBytes ++ dtBytes
  }

  /** Synthesize one REAL JPEG per row with a REAL EXIF APP1 segment
    * spliced after SOI — every field a pure function of the id (the
    * oracle recomputes them arithmetic-only), byte order alternating
    * II/MM by id parity. The image bytes are the JDK encoder's. */
  def synthesizeJpegWithExif(spark: SparkSession, ids: DataFrame,
      idCol: String): DataFrame = {
    import spark.implicits._
    ids.select(col(idCol).cast("long")).as[Long].mapPartitions(_.map { id =>
      val img = new java.awt.image.BufferedImage(
        8, 8, java.awt.image.BufferedImage.TYPE_INT_RGB)
      var y = 0
      while (y < 8) { var x = 0; while (x < 8) {
        img.setRGB(x, y, 0x808080); x += 1 }; y += 1 }
      val bos = new java.io.ByteArrayOutputStream()
      javax.imageio.ImageIO.write(img, "jpg", bos)
      (id, spliceExif(bos.toByteArray, id))
    }).toDF("media_id", "media")
  }

  /** Splice the id-derived REAL EXIF APP1 segment after a JPEG's SOI —
    * shared by the synthesizer and spec fixtures that need EXIF on a
    * patterned (non-solid) image, e.g. the orientation-resize pin
    * (orientation = 1 + id % 8, byte order by id parity). */
  private[ext] def spliceExif(jpeg: Array[Byte], id: Long): Array[Byte] = {
    val tiff = exifTiff(id)
    val payload = "Exif".getBytes("US-ASCII") ++
      Array[Byte](0, 0) ++ tiff
    val len = payload.length + 2
    val app1 = Array(0xFF.toByte, 0xE1.toByte,
      ((len >> 8) & 0xff).toByte, (len & 0xff).toByte) ++ payload
    jpeg.take(2) ++ app1 ++ jpeg.drop(2)
  }

  /** REAL EXIF parse: JPEG segment walk → APP1 "Exif\0\0" → TIFF header
    * (II/MM endianness, magic 42) → IFD0 entry table → Make (0x010F,
    * ASCII), Orientation (0x0112, SHORT, inline left-justified),
    * DateTime (0x0132, ASCII). Every read bounds-checked; any overrun,
    * a missing APP1, or a non-Exif APP1 yields exif_ok=false for THAT
    * row while siblings survive — metadata damage must never fail a
    * partition. Pure byte arithmetic, no imaging library. */
  def exifMeta(spark: SparkSession, media: DataFrame): Dataset[ExifMeta] = {
    import spark.implicits._
    media.select("media_id", "media").as[(Long, Array[Byte])]
      .mapPartitions(_.map { case (id, b) =>
        exifFields(b) match {
          case Some((order, orientation, make, datetime)) =>
            ExifMeta(id, exif_ok = true, order, orientation, make, datetime)
          case None => ExifMeta(id, exif_ok = false, "", 0, "", "")
        }
      })
  }

  /** The per-blob EXIF walk behind [[exifMeta]] (and the orientation
    * probe [[resizeImages]] honors): (byte order, orientation, make,
    * datetime), None on any damage. */
  private[ext] def exifFields(b: Array[Byte])
      : Option[(String, Int, String, String)] = {
    def fail = None
    try {
          if (b.length < 4 || (b(0) & 0xff) != 0xff || (b(1) & 0xff) != 0xd8)
            fail
          else {
            // walk marker segments until APP1/Exif, SOS, or EOF
            var off = 2
            var tiffStart = -1
            var tiffEnd = -1
            while (tiffStart < 0 && off + 4 <= b.length &&
                (b(off) & 0xff) == 0xff && (b(off + 1) & 0xff) != 0xda) {
              val marker = b(off + 1) & 0xff
              val len = ((b(off + 2) & 0xff) << 8) | (b(off + 3) & 0xff)
              if (off + 2 + len > b.length)
                throw new IllegalArgumentException("segment overruns file")
              if (marker == 0xe1 && len >= 2 + 6 + 8 &&
                  new String(b, off + 4, 4, "US-ASCII") == "Exif" &&
                  b(off + 8) == 0 && b(off + 9) == 0) {
                tiffStart = off + 10
                tiffEnd = off + 2 + len
              }
              off += 2 + len
            }
            if (tiffStart < 0) fail
            else {
              val order = new String(b, tiffStart, 2, "US-ASCII")
              require(order == "II" || order == "MM", s"bad byte order $order")
              val little = order == "II"
              def u16(p: Int): Int = {
                require(p >= tiffStart && p + 2 <= tiffEnd, "u16 out of TIFF")
                if (little) (b(p) & 0xff) | ((b(p + 1) & 0xff) << 8)
                else ((b(p) & 0xff) << 8) | (b(p + 1) & 0xff)
              }
              def u32(p: Int): Long = {
                require(p >= tiffStart && p + 4 <= tiffEnd, "u32 out of TIFF")
                if (little) (b(p) & 0xffL) | ((b(p + 1) & 0xffL) << 8) |
                  ((b(p + 2) & 0xffL) << 16) | ((b(p + 3) & 0xffL) << 24)
                else ((b(p) & 0xffL) << 24) | ((b(p + 1) & 0xffL) << 16) |
                  ((b(p + 2) & 0xffL) << 8) | (b(p + 3) & 0xffL)
              }
              require(u16(tiffStart + 2) == 42, "TIFF magic != 42")
              val ifd = tiffStart + u32(tiffStart + 4).toInt
              val n = u16(ifd)
              var orientation = 0
              var make = ""
              var datetime = ""
              def ascii(countIncNul: Long, valueField: Int): String = {
                val p =
                  if (countIncNul <= 4) valueField
                  else tiffStart + u32(valueField).toInt
                val len = countIncNul.toInt - 1 // strip the NUL
                require(len >= 0 && p >= tiffStart && p + len <= tiffEnd,
                  "ascii out of TIFF")
                new String(b, p, len, "US-ASCII")
              }
              var i = 0
              while (i < n) {
                val e = ifd + 2 + i * 12
                val tag = u16(e)
                val count = u32(e + 4)
                tag match {
                  case 0x0112 => orientation = u16(e + 8) // left-justified
                  case 0x010f => make = ascii(count, e + 8)
                  case 0x0132 => datetime = ascii(count, e + 8)
                  case _ => ()
                }
                i += 1
              }
              Some((order, orientation, make, datetime))
            }
          }
    } catch { case _: Exception => fail }
  }

  /** Apply an EXIF orientation (JEITA CP-3451 tag 0x0112) to decoded
    * pixels — the transform every resize/thumbnail pass must run or
    * ship sideways images. Pure pixel remap, deterministic:
    * 1 identity, 2 mirror-H, 3 rotate 180, 4 mirror-V, 5 transpose,
    * 6 rotate 90 CW, 7 transverse, 8 rotate 270 CW. Unknown values
    * (0, >8) are treated as 1 — damaged metadata must not fail the
    * image it annotates. */
  private[ext] def applyOrientation(img: java.awt.image.BufferedImage,
      orientation: Int): java.awt.image.BufferedImage = {
    if (orientation <= 1 || orientation > 8) return img
    val (w, h) = (img.getWidth, img.getHeight)
    val swap = orientation >= 5
    val (ow, oh) = if (swap) (h, w) else (w, h)
    val out = new java.awt.image.BufferedImage(
      ow, oh, java.awt.image.BufferedImage.TYPE_INT_RGB)
    var y = 0
    while (y < oh) {
      var x = 0
      while (x < ow) {
        val (sx, sy) = orientation match {
          case 2 => (w - 1 - x, y)
          case 3 => (w - 1 - x, h - 1 - y)
          case 4 => (x, h - 1 - y)
          case 5 => (y, x)
          case 6 => (y, h - 1 - x)
          case 7 => (w - 1 - y, h - 1 - x)
          case 8 => (w - 1 - y, x)
        }
        out.setRGB(x, y, img.getRGB(sx, sy))
        x += 1
      }
      y += 1
    }
    out
  }
}
