package graft.ext

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal-column plumbing: image/audio/video as opaque `BINARY` columns
  * with typed metadata, plus decode / feature-extract / resize /
  * frame-sample stages.
  *
  * The Spark-side plumbing — schema, partition-preserving mapPartitions,
  * batch shape, metadata struct — is real and tested. The actual codec step
  * is a clearly-marked STUB (deterministic fake decoder): media codec
  * libraries are not available in this environment, and the engine contract
  * is the distributed data path, not the codec.
  *
  * At 100 TB: binary payloads dominate row size, so every stage here is a
  * narrow map (no shuffle), metadata-only queries prune the binary column
  * at the Parquet scan (columnar — check ReadSchema), and feature extraction
  * emits small fixed-width vectors so downstream joins/aggs never carry the
  * blob.
  */
object Multimodal {

  final case class MediaRow(media_id: Long, media: Array[Byte], format: String, n_bytes: Long)
  final case class MediaFeatures(
      media_id: Long, format: String, n_bytes: Long,
      width: Int, height: Int, mean_byte: Double, features: Array[Float])

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

  /** STUB decode: a real implementation would invoke an image/audio codec
    * per batch here (e.g. JNI libjpeg / javax.imageio). This deterministic
    * fake derives pseudo-dimensions and a small feature vector from the
    * bytes so the distributed path (partition-preserving, batch-iterator
    * shape, fixed-width output schema) is fully exercised and testable. */
  private def decodeStub(r: MediaRow): MediaFeatures = {
    val bytes = r.media
    val h = bytes.foldLeft(1125899906842597L)((acc, b) => acc * 31 + (b & 0xff)) // FNV-ish
    val width = 16 + (((h % 1024) + 1024) % 1024).toInt
    val height = 16 + ((((h >> 10) % 1024) + 1024) % 1024).toInt
    val mean = if (bytes.isEmpty) 0.0 else bytes.map(b => (b & 0xff).toDouble).sum / bytes.length
    val feats = Array.tabulate(8) { i =>
      if (bytes.isEmpty) 0f
      else bytes.iterator.zipWithIndex.filter(_._2 % 8 == i).map(_._1 & 0xff).sum.toFloat / bytes.length
    }
    MediaFeatures(r.media_id, r.format, r.n_bytes, width, height, mean, feats)
  }

  /** Decode + feature-extract over partition-local batches: one iterator
    * pass per partition, no shuffle, blob dropped from the output row. */
  def extractFeatures(spark: SparkSession, media: DataFrame): Dataset[MediaFeatures] = {
    import spark.implicits._
    media.select("media_id", "media", "format", "n_bytes").as[MediaRow]
      .mapPartitions(_.map(decodeStub))
  }

  /** "Resize": cap payloads at maxBytes (narrow map; a real impl would
    * re-encode in decodeStub's place). */
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
}
