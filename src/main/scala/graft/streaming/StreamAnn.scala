package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.ext.{LshIndex, Similarity}
import graft.functions.VectorFunctions

/** Streaming ANN radius search against a STORED LSH bundle (ST16) —
  * the vector-side member of the streaming-serving family (ST14 text
  * near-dup, ST15 decontamination): a stream of query embeddings is
  * answered against the persisted signature index AS IT ARRIVES. The
  * semantics are RADIUS search (every corpus neighbor with cosine ≥
  * `minSim`), not top-k: a per-probe top-k needs ordered state per
  * probe, while the radius form is a pure filter — every stage below is
  * stream-legal in append mode with bounded state.
  *
  * Plan shape (the ST14 discipline applied to vectors):
  *   - the stream side is MAP-ONLY: per-row hyperplane signatures
  *     ([[Similarity.lshBuckets]] — the probe's id/ts ride along inside
  *     a struct key, so one projection carries everything);
  *   - candidates form on a STREAM-STATIC inner equi-join against the
  *     persisted (table_id, bucket) signature table, and the exact
  *     cosine verify joins the persisted id-sorted vectors table —
  *     zero streaming state in either join, the corpus is never
  *     rescanned beyond the index lookups;
  *   - a probe colliding with a corpus vector in b tables surfaces b
  *     times → `dropDuplicatesWithinWatermark` keyed per (probe, id)
  *     BEFORE the vector fetch — the only stateful stage, evicted by
  *     the watermark, and placed where it also dedups the fetch work.
  *
  * Recall is the stored index's (bucket collision ⇒ candidate — the
  * q30/q177 surface); emitted pairs are exact-verified, so false
  * positives never leave the operator. Output: (probeIdCol, tsCol,
  * corpusIdCol, cos_sim ≥ minSim rounded to 6), exactly once per
  * (probe, corpus id) within the watermark.
  */
object StreamAnn {

  def radius(index: LshIndex.Index, vectors: DataFrame, stream: DataFrame,
      probeIdCol: String, probeVecCol: String, tsCol: String,
      corpusIdCol: String, corpusVecCol: String, minSim: Double,
      watermark: String): DataFrame = {
    val buckets = stream
      .withWatermark(tsCol, watermark)
      .select(col(probeIdCol), col(tsCol), col(probeVecCol).as("__pv"),
        explode(Similarity.lshBucketArray(col(probeVecCol),
          index.tables, index.bits, index.dim)).as("__tb"))
      .select(col(probeIdCol), col(tsCol), col("__pv"),
        col("__tb.table_id").as("table_id"),
        col("__tb.bucket").as("bucket"))
    val cand = buckets
      .join(index.buckets.select(col(corpusIdCol), col("table_id"),
        col("bucket")), Seq("table_id", "bucket"))
      .where(col(probeIdCol) =!= col(corpusIdCol))
      .select(col(probeIdCol), col(tsCol), col("__pv"), col(corpusIdCol))
      .dropDuplicatesWithinWatermark(probeIdCol, corpusIdCol)
    cand
      .join(vectors.select(col(corpusIdCol), col(corpusVecCol)),
        Seq(corpusIdCol))
      .select(col(probeIdCol), col(tsCol), col(corpusIdCol),
        round(VectorFunctions.cosine(col(corpusVecCol), col("__pv")), 6)
          .as("cos_sim"))
      .where(col("cos_sim") >= minSim)
  }
}
