package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.ext.ImageHash

/** ST19 — streaming image near-dup against a STORED pHash bundle: the
  * multimodal twin of [[StreamNearDup]] (text) closing the same
  * serving gap for the image plane — crawl images are checked against
  * the existing corpus AS THEY ARRIVE, and the stream only ever hashes
  * itself.
  *
  * Plan shape (the ST14 discipline transplanted to Hamming space):
  *   - the stream side is MAP-ONLY: decode → luma → 32×32 resample →
  *     DCT → sign ([[ImageHash]]'s real-codec path inside
  *     `mapPartitions`) and the band-slice explode are all per-row —
  *     no stream-side aggregation, append mode holds throughout;
  *   - candidates come from a STREAM-STATIC inner equi-join on
  *     (band, value) against the bundle's persisted pre-banded table;
  *     the exact-Hamming verify joins the persisted hash table — zero
  *     streaming state in either join;
  *   - [[pairs]] is at-least-once (a pair within distance d can
  *     collide in up to `bands` band slices); [[dedupedPairs]] puts
  *     `dropDuplicatesWithinWatermark(probe_id, corpus_id)` BETWEEN
  *     the candidate join and the verify (the ST16 ordering: dedup
  *     before the expensive stage), the only stateful stage, evicted
  *     by the watermark.
  *
  * Undecodable stream blobs drop silently (decode_ok=false — corrupt
  * crawl bytes are data, not poison pills for the query). */
object StreamImageDup {

  /** Map-only stream-side hashing: (idCol, tsCol, phash) for decodable
    * rows — THE batch decode path ([[ImageHash.phashOfBytes]]), shared
    * so stream and batch hashes can never silently diverge (the
    * stream ≡ batch spec contract depends on it). */
  private def hashStream(stream: DataFrame, idCol: String, mediaCol: String,
      tsCol: String): DataFrame = {
    val spark = stream.sparkSession
    import spark.implicits._
    stream.select(col(idCol).cast("long"), col(mediaCol), col(tsCol))
      .as[(Long, Array[Byte], java.sql.Timestamp)]
      .mapPartitions(_.flatMap { case (id, bytes, ts) =>
        ImageHash.phashOfBytes(bytes).map(h => (id, ts, h))
      }).toDF(idCol, tsCol, "phash")
  }

  private def candidates(bundle: ImageHash.Bundle, hashed: DataFrame,
      idCol: String, tsCol: String): DataFrame =
    hashed
      .select(col(idCol).as("probe_id"), col(tsCol), col("phash").as("hp"),
        explode(ImageHash.bandCols(col("phash"), bundle.bands)).as("b"))
      .select(col("probe_id"), col(tsCol), col("hp"),
        col("b.band").as("band"), col("b.value").as("value"))
      .join(bundle.banded, Seq("band", "value"))
      .select(col("probe_id"), col("corpus_id"), col(tsCol), col("hp"))

  private def verify(bundle: ImageHash.Bundle, cand: DataFrame,
      tsCol: String): DataFrame =
    cand
      .join(bundle.hashes.select(col("media_id").as("corpus_id"),
        col("phash").as("ch")), Seq("corpus_id"))
      .select(col("probe_id"), col("corpus_id"), col(tsCol),
        bit_count(col("hp").bitwiseXOR(col("ch"))).cast("long").as("dist"))
      .where(col("dist") <= bundle.maxDist &&
        col("probe_id") =!= col("corpus_id"))

  /** Verified near-dup pairs (probe_id, corpus_id, ts, dist),
    * at-least-once per pair. */
  def pairs(bundle: ImageHash.Bundle, stream: DataFrame, idCol: String,
      mediaCol: String, tsCol: String): DataFrame =
    verify(bundle,
      candidates(bundle, hashStream(stream, idCol, mediaCol, tsCol),
        idCol, tsCol), tsCol)

  /** [[pairs]] with exactly-once pair emission within the watermark —
    * candidate dedup BEFORE the verify join, so band multiplicity
    * never multiplies the hash fetch + Hamming work. */
  def dedupedPairs(bundle: ImageHash.Bundle, stream: DataFrame,
      idCol: String, mediaCol: String, tsCol: String,
      watermark: String): DataFrame =
    verify(bundle,
      candidates(bundle,
        hashStream(stream, idCol, mediaCol, tsCol).withWatermark(tsCol, watermark),
        idCol, tsCol)
        .dropDuplicatesWithinWatermark("probe_id", "corpus_id"), tsCol)
}
