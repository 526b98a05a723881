package graft.streaming

import org.apache.spark.sql.DataFrame

import graft.ext.MinHashIndex

/** Streaming ingestion near-dup filter against a STORED MinHash band
  * index (ST14) — the Structured-Streaming twin of [[graft.ext
  * .MinHashIndex.probe]] (D14), closing the serving gap between the
  * batch-nightly increment and real-time ingest: a crawl stream is
  * checked against the existing corpus AS IT ARRIVES, and only ever
  * hashes itself.
  *
  * Plan shape (what makes this stream-legal and 100 TB-sane):
  *   - the stream side is MAP-ONLY — shingles, base hashes, MinHash
  *     signature and band keys are all per-row expressions
  *     (`SketchExprs` native loops), so no stream-side aggregation
  *     precedes the join and append mode holds throughout;
  *   - candidates come from a STREAM-STATIC inner equi-join on
  *     (band_id, band_key) against the persisted band table, the exact
  *     Jaccard verify joins the persisted shingle table — these joins
  *     carry ZERO streaming state, and the corpus is never rescanned
  *     per micro-batch beyond those index lookups;
  *   - [[pairs]] is at-least-once (a pair colliding in b bands surfaces
  *     b times); [[dedupedPairs]] puts
  *     `dropDuplicatesWithinWatermark(id_a, id_b)` BETWEEN the candidate
  *     join and the exact-Jaccard verify (the ST16 discipline: dedup
  *     sits before the expensive stage, so each candidate pair fetches
  *     corpus shingles and verifies ONCE, not once per colliding band)
  *     — the only stateful stage, keyed per CANDIDATE pair (a superset
  *     of emitted pairs: below-threshold candidates hold a key too),
  *     state evicted by the watermark
  *     (the `EventsStream.dedupWithinWatermark` contract).
  *
  * Output: (id_a = corpus doc, id_b = stream doc, ts, jaccard ≥
  * threshold rounded to 6) — the D14 pair schema plus the stream
  * timestamp. StreamNearDupSpec proves stream ≡ batch [[MinHashIndex
  * .probe]] over multi-batch delivery, and pair-duplicate eviction.
  */
object StreamNearDup {

  /** Verified near-dup pairs, at-least-once per pair. */
  def pairs(index: MinHashIndex.Index, stream: DataFrame, idCol: String,
      textCol: String, tsCol: String, threshold: Double): DataFrame =
    MinHashIndex.probeStream(index, stream, idCol, textCol, tsCol, threshold)

  /** [[pairs]] with exactly-once pair emission within the watermark —
    * the dedup keyed on the candidate pair BEFORE the verify, so band
    * multiplicity never multiplies the shingle fetch + Jaccard work. */
  def dedupedPairs(index: MinHashIndex.Index, stream: DataFrame,
      idCol: String, textCol: String, tsCol: String, threshold: Double,
      watermark: String): DataFrame =
    MinHashIndex.verifyStream(index,
      MinHashIndex.candidateStream(index,
          stream.withWatermark(tsCol, watermark), idCol, textCol, tsCol)
        .dropDuplicatesWithinWatermark("id_a", "__sid"),
      threshold)
}
