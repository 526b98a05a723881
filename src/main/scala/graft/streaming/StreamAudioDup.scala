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
  *     stage; with a watermark on the stream timestamp it runs in
  *     append mode and each pair emits ONCE when its window closes
  *     (update mode streams partial counts — the caller's choice).
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
    * UPDATE mode: counts re-emit as a pair's frames accumulate across
    * micro-batches — the live-monitoring shape. */
  def pairs(bundle: AudioFingerprint.Bundle, stream: DataFrame,
      idCol: String, mediaCol: String, tsCol: String): DataFrame =
    printStream(stream, idCol, mediaCol, tsCol)
      .withColumnRenamed(idCol, "probe_id")
      .join(bundle.prints, Seq("frame", "bin"))
      .where(col("probe_id") =!= col("corpus_id"))
      .groupBy("probe_id", "corpus_id")
      .agg(count(lit(1)).cast("long").as("shared"))
      .where(col("shared") >= bundle.minShared)
}
