package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.ext.AudioFingerprint

/** ST20 — streaming audio near-dup against a STORED fingerprint
  * bundle: the third leg of the streaming near-dup triple (text ST14,
  * image ST19, audio here) — crawl audio is checked against the
  * existing corpus AS IT ARRIVES, and the stream only ever decodes
  * itself.
  *
  * Plan shape (the ST14/ST19 discipline on the audio plane):
  *   - stream side is MAP-ONLY: RIFF walk + framed DFT argmax inside
  *     `mapPartitions` ([[AudioFingerprint.peaks]]'s exact path), then
  *     a per-row posexplode to (frame, bin);
  *   - candidates AND the verify are ONE stream-static equi-join
  *     against the bundle's (frame, bin)-clustered print table — the
  *     shared-count verify is the join's own aggregate, so unlike the
  *     text/image twins there is no second fetch to dedup in front of;
  *   - the aggregate (groupBy pair + count) is the only stateful
  *     stage, keyed on (probe, corpus) with NO event-time column — so
  *     the query runs in UPDATE (or complete) mode, re-emitting a
  *     pair's count as its frames accumulate across micro-batches (the
  *     live-monitoring shape). Append mode is NOT available here:
  *     Spark rejects a streaming aggregation whose keys carry no
  *     event-time window; a once-per-pair append emission would need a
  *     `window(ts, …)` grouping key and would change the law (counts
  *     per window, not per stream).
  *
  * Undecodable stream blobs drop silently. */
object StreamAudioDup {

  /** Map-only stream-side fingerprinting: (idCol, tsCol, frame, bin). */
  private def printStream(stream: DataFrame, idCol: String, mediaCol: String,
      tsCol: String): DataFrame = {
    val spark = stream.sparkSession
    import spark.implicits._
    stream.select(col(idCol).cast("long"), col(mediaCol), col(tsCol))
      .as[(Long, Array[Byte], java.sql.Timestamp)]
      .mapPartitions(_.flatMap { case (id, bytes, ts) =>
        AudioFingerprint.peaksOfBytes(bytes).toSeq.flatMap(_.zipWithIndex.map {
          case (bin, frame) => (id, ts, frame, bin)
        })
      }).toDF(idCol, tsCol, "frame", "bin")
  }

  /** Near-dup pairs (probe_id, corpus_id, shared ≥ bundle.minShared) in
    * UPDATE mode — the verify tail is [[AudioFingerprint
    * .sharedCountPairs]], THE batch path, shared so stream and batch
    * match semantics can never silently diverge. */
  def pairs(bundle: AudioFingerprint.Bundle, stream: DataFrame,
      idCol: String, mediaCol: String, tsCol: String): DataFrame =
    AudioFingerprint.sharedCountPairs(
      printStream(stream, idCol, mediaCol, tsCol)
        .withColumnRenamed(idCol, "probe_id"),
      bundle.prints, bundle.minShared)
}
