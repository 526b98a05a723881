package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.ext.Multimodal

/** ST21 — streaming video near-dup against a STORED fingerprint
  * bundle: the fourth leg completing the streaming near-dup QUADRUPLE
  * (text ST14, image ST19, audio ST20, video here) — crawl video is
  * checked against the existing corpus AS IT ARRIVES, and the stream
  * only ever decodes itself.
  *
  * Plan shape (the ST20 discipline on the video plane):
  *   - stream side is MAP-ONLY: RIFF walk + real MJPEG frame decode
  *     inside `mapPartitions` ([[Multimodal.aviFrameFeatures]] — THE
  *     batch decode path, shared so stream and batch features can
  *     never silently diverge), then the shared luma quantizer
  *     ([[Multimodal.qlumaCol]]) to (frame_index, qluma) rows;
  *   - candidates AND the verify are ONE stream-static equi-join
  *     against the bundle's (frame_index, qluma)-clustered print table
  *     — the shared-count verify is the join's own aggregate, no
  *     second fetch;
  *   - the aggregate (groupBy pair + count) is the only stateful
  *     stage, keyed on (probe, corpus) with no event-time column — so
  *     the query runs in UPDATE (or complete) mode, re-emitting a
  *     pair's count as its frames accumulate across micro-batches (the
  *     live-monitoring shape; see [[StreamAudioDup]] for why append
  *     mode is not available here).
  *
  * Undecodable stream blobs (and individually corrupt frames) drop
  * silently — corrupt crawl bytes are data, not poison pills. */
object StreamVideoDup {

  /** Map-only stream-side fingerprinting: (idCol, tsCol, frame_index,
    * qluma) for decodable frames. */
  private def printStream(stream: DataFrame, idCol: String, mediaCol: String,
      tsCol: String): DataFrame = {
    val spark = stream.sparkSession
    import spark.implicits._
    stream.select(col(idCol).cast("long"), col(mediaCol), col(tsCol))
      .as[(Long, Array[Byte], java.sql.Timestamp)]
      .mapPartitions(_.flatMap { case (id, bytes, ts) =>
        Multimodal.aviFrameFeatures(id, bytes, stride = 1, maxFrames = 8)
          .filter(_.decode_ok)
          .map(f => (id, ts, f.frame_index, f.mean_luma))
      }).toDF(idCol, tsCol, "frame_index", "mean_luma")
      .select(col(idCol), col(tsCol), col("frame_index"),
        Multimodal.qlumaCol(col("mean_luma")).as("qluma"))
  }

  /** Near-dup pairs (probe_id, corpus_id, shared ≥ bundle.minShared) in
    * UPDATE mode — the verify tail is [[Multimodal
    * .videoSharedCountPairs]], THE batch path, shared so stream and
    * batch match semantics can never silently diverge. */
  def pairs(bundle: Multimodal.VideoBundle, stream: DataFrame,
      idCol: String, mediaCol: String, tsCol: String): DataFrame =
    Multimodal.videoSharedCountPairs(
      printStream(stream, idCol, mediaCol, tsCol)
        .withColumnRenamed(idCol, "probe_id"),
      bundle.prints, bundle.minShared)
}
