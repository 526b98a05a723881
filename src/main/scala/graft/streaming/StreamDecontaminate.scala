package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.ext.TextPrep

/** Streaming train/test decontamination (ST15) — the real-time twin of
  * [[graft.ext.Decontaminate.bloomContaminationFlags]] (D13): a crawl
  * stream is checked against a benchmark/test-set bloom AS IT ARRIVES,
  * so contaminated documents never reach the corpus at all.
  *
  * The batch plan probes exploded shingles and re-groups per doc; a
  * stream-side aggregation would force update mode and per-doc state.
  * This plan has NEITHER: the whole check is ONE per-row projection —
  * staged shingles → base hashes → a native per-row
  * [[org.apache.spark.sql.graft.BloomHitCount]] loop — zero streaming
  * state, zero shuffle, append mode holds, and the filter rides along
  * as a task-referenced object (built ONCE from the static test set via
  * [[graft.ext.Decontaminate.buildShingleBloom]]; the stream only ever
  * hashes itself — the ST14 serving discipline). Error is one-sided in
  * the safe direction, exactly the batch contract: no false negatives,
  * so every truly contaminated stream doc is flagged; fpp-bounded false
  * positives over-drop only.
  *
  * One declared divergence from the batch twin: a doc too short to have
  * any k-shingle emits (n_shingles = 0, n_hits = 0, flagged = false)
  * here, while the batch path's explode_outer row counts it as one null
  * shingle — StreamDecontaminateSpec pins stream ≡ batch on every doc
  * WITH shingles and the zero-shingle edge explicitly.
  */
object StreamDecontaminate {

  /** Per-stream-doc contamination flags: (idCol, tsCol, n_shingles,
    * n_hits, flagged). Map-only; safe under append mode with any sink. */
  def flags(bf: Array[Byte], stream: DataFrame, idCol: String,
      textCol: String, tsCol: String, shingleK: Int = 5,
      minHits: Int = 1): DataFrame = {
    import org.apache.spark.sql.graft.SketchExprs
    TextPrep.stagedShingles(
        stream.select(col(idCol), col(tsCol), col(textCol).as("__text")),
        "__text", shingleK, "__sh")
      .withColumn("__hashes", TextPrep.baseHashes(col("__sh")))
      .select(col(idCol), col(tsCol),
        size(col("__sh")).cast("long").as("n_shingles"),
        SketchExprs.bloomHitCount(bf, col("__hashes")).as("n_hits"))
      .withColumn("flagged", col("n_hits") >= minHits)
  }

  /** Clean-only view of the stream (original schema) — the ingest-side
    * drop filter, still one map-only projection + filter (no self-join:
    * the hit count computes inline and drops with its scaffolding). */
  def clean(bf: Array[Byte], stream: DataFrame, textCol: String,
      shingleK: Int = 5, minHits: Int = 1): DataFrame = {
    import org.apache.spark.sql.graft.SketchExprs
    TextPrep.stagedShingles(stream, textCol, shingleK, "__sh")
      .withColumn("__hits",
        SketchExprs.bloomHitCount(bf, TextPrep.baseHashes(col("__sh"))))
      .where(col("__hits") < minHits)
      .drop("__sh", "__hits")
  }
}
