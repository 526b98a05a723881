package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Winnowing document fingerprints (Schleimer, Wilkerson & Aiken 2003 —
  * the MOSS algorithm): from every window of `w` consecutive k-gram
  * hashes, select the minimum (rightmost on ties), and the distinct
  * selections are the document's fingerprint. The guarantee that makes
  * this THE copy-detection fingerprint: any shared substring of length
  * ≥ w + k − 1 tokens is caught by at least one shared fingerprint
  * (coverage), while density stays ~2/(w+1) regardless of document size
  * (compression) — properties uniform sampling cannot give. T5's
  * rolling-hash fingerprint answers "have I seen this doc"; winnowing
  * answers "which documents share PASSAGES", the provenance/plagiarism
  * question a training-corpus audit actually asks.
  *
  * Hashes are the portable md5 draw over word k-grams, so the DuckDB
  * oracle recomputes identical fingerprints (relationally — band-join
  * windows; the Spark side is the array form below).
  *
  * Scale shape: [[fingerprints]] is ONE codegen'd projection — tokenize,
  * then a single native expression
  * ([[org.apache.spark.sql.graft.WinnowFingerprints]]) that hashes the
  * k-grams and selects per-window rightmost-minima with a monotonic deque,
  * O(n·k) per document. The round-7 higher-order-function form was
  * re-quadratized by `InferFiltersFromGenerate` + filter pushdown inlining
  * the staged hash pipeline into a per-window filter condition (210 s for
  * 50 docs); a single expression node cannot be partially inlined, and
  * `explode_outer` + post-filter (the q68 pattern) keeps the optimizer
  * from inferring any filter over it at all. Only the ~2n/(w+1) selected
  * rows leave the scan, and nothing shuffles.
  * [[overlapPairs]] joins on fp_hash with a
  * promiscuous-hash guard (the q200 basket cap): a fingerprint shared
  * by > maxDf documents is boilerplate, carries no pair signal, and
  * would mint O(maxDf²) join rows — it is dropped BEFORE the self-join.
  */
object Winnowing {

  /** (doc_id, fp_pos, fp_hash): 1-based k-gram position + hash of each
    * selected fingerprint. Documents with fewer than k tokens have no
    * k-grams and emit nothing; documents with fewer than w k-grams are
    * winnowed as a single window (the whole hash array). */
  def fingerprints(docs: DataFrame, idCol: String, textCol: String,
      k: Int = 3, w: Int = 4): DataFrame = {
    require(k >= 1 && w >= 1, "k and w must be positive")
    docs
      .select(col(idCol).as("doc_id"),
        explode_outer(org.apache.spark.sql.graft.WinnowExprs.winnowFingerprints(
          TextPrep.tokens(col(textCol)), k, w)).as("fp"))
      .filter(col("fp").isNotNull)
      .select(col("doc_id"), col("fp.fp_pos").as("fp_pos"),
        col("fp.fp_hash").as("fp_hash"))
  }

  /** Candidate passage-sharing pairs: documents ranked by how many
    * fingerprints they share, after dropping fingerprints present in
    * more than `maxDf` documents (boilerplate guard — one hash shared
    * by 10⁵ docs mints 5·10⁹ pairs and means "common phrase", not
    * "copied passage"). Output: (id_a, id_b, shared), topN by
    * (shared desc, id_a, id_b). */
  def overlapPairs(fps: DataFrame, maxDf: Int, topN: Int): DataFrame = {
    require(maxDf >= 2 && topN >= 1, "maxDf must be >= 2, topN >= 1")
    val byHash = fps.select(col("doc_id"), col("fp_hash")).distinct()
    val df = byHash.groupBy("fp_hash").agg(count(lit(1)).as("__df"))
      .filter(col("__df") <= maxDf)
      .select("fp_hash")
    val pruned = byHash.join(df, Seq("fp_hash"))
    val pairs = pruned.as("a")
      .join(pruned.as("b"),
        col("a.fp_hash") === col("b.fp_hash") &&
          col("a.doc_id") < col("b.doc_id"))
      .groupBy(col("a.doc_id").as("id_a"), col("b.doc_id").as("id_b"))
      .agg(count(lit(1)).as("shared"))
    pairs.orderBy(col("shared").desc, col("id_a"), col("id_b")).limit(topN)
  }
}
