package graft.ext

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** K-minimum-values (KMV) distinct-set sketches for corpus overlap — the
  * "how much of shard B have I already got in shard A" estimate a data
  * team wants BEFORE paying for a full cross-shard dedup (Beyer et al.,
  * "On synopses for distinct-value estimation under multiset operations",
  * SIGMOD 2007; the bottom-k form of Broder's min-wise estimators).
  *
  * The sketch of a set is its k smallest element hashes. Sketches are
  * trivially mergeable (k smallest of the union of sketches) and support
  * Jaccard estimation: with S = k-min of A∪B,
  * Ĵ = |{h ∈ S : h ∈ A ∧ h ∈ B}| / k — an unbiased estimator with
  * s.e. ≈ √(J(1−J)/k). Only the ORDER of hashes matters, so signed
  * xxhash64 comparison is fine as long as every side uses the same hash.
  *
  * == Scale shape ==
  *
  * The element stream is (group, hash) — slim 16-byte rows; text never
  * leaves the scan projection. One distinct-aggregate shuffle produces
  * per-hash membership flags with map-side combine; the k-cut is a
  * TakeOrdered (distributed heap per partition, k rows to the driver's
  * side of the plan — never a global sort). At 100 TB the sketch path
  * touches each corpus element once and keeps k rows of state — the
  * exact-Jaccard twin (one more aggregate over the same stream) exists
  * for the gate contract only; production calls [[jaccardEstimate]]
  * alone and never pays the exact pass.
  */
object Kmv {

  /** Distinct (group, element-hash) stream of word `shingleK`-shingles.
    * Shingle → one xxhash64 per element, staged per TextPrep's
    * evaluation-cost discipline (shingle sets are distinct per doc, and
    * the cross-doc distinct folds into the downstream aggregate). */
  def shingleHashes(docs: DataFrame, grpCol: String, textCol: String,
      shingleK: Int): DataFrame =
    Dedup.shingleSets(docs, grpCol, textCol, shingleK)
      .select(col("doc_id").as("__grp"), explode_outer(col("sh")).as("__sh"))
      .select(col("__grp"), xxhash64(col("__sh")).as("__h"))
      .distinct()

  /** Per-hash membership flags for a two-group element stream:
    * (h, in_a, in_b), one row per distinct hash — the merged-domain
    * view both the estimator and the exact twin aggregate over.
    *
    * `grpB == null` selects A-vs-REST semantics (in_b = any group other
    * than `grpA` — correct only when the stream genuinely carries two
    * groups); passing `grpB` explicitly filters the stream to exactly
    * {grpA, grpB}, so a 3+-group input measures J(A, B) rather than
    * silently measuring J(A, rest). */
  private def membership(elems: DataFrame, grpA: String,
      grpB: String): DataFrame = {
    val two =
      if (grpB == null) elems
      else elems.where(col("__grp").isin(grpA, grpB))
    two.groupBy(col("__h"))
      .agg(max(when(col("__grp") === grpA, 1).otherwise(0)).as("__in_a"),
        max(when(col("__grp") =!= grpA, 1).otherwise(0)).as("__in_b"))
  }

  /** Ĵ(A, B) from the k smallest union hashes: one row
    * (k, est_jaccard). `elems` = (group, hash) distinct stream;
    * `grpB` null = A-vs-rest (see [[membership]]). */
  def jaccardEstimate(elems: DataFrame, grpA: String, k: Int,
      grpB: String = null): DataFrame =
    membership(elems, grpA, grpB)
      .orderBy(col("__h")).limit(k)
      .agg(count(lit(1)).cast("long").as("k_actual"),
        round(sum(col("__in_a") * col("__in_b")).cast("double")
          / count(lit(1)), 6).as("est_jaccard"))

  /** Gate contract: sketch estimate within `tol` of the exact Jaccard
    * computed over the SAME element stream (the exact pass exists for
    * the gate only — see scale note above). Output one row:
    * (k, exact_jaccard, est_ok) — est_ok is the only column that sees
    * the estimate, so the oracle restates exact_jaccard and `true`. */
  def jaccardContract(docs: DataFrame, grpCol: String, textCol: String,
      grpA: String, shingleK: Int, k: Int, tol: Double,
      grpB: String = null): DataFrame = {
    val elems = shingleHashes(docs, grpCol, textCol, shingleK)
    val exact = membership(elems, grpA, grpB)
      .agg(round(sum(col("__in_a") * col("__in_b")).cast("double")
        / sum(when(col("__in_a") + col("__in_b") > 0, 1).otherwise(0)), 6)
        .as("exact_jaccard"))
    jaccardEstimate(elems, grpA, k, grpB)
      .crossJoin(broadcast(exact))
      .select(lit(k.toLong).as("k"), col("exact_jaccard"),
        (abs(col("est_jaccard") - col("exact_jaccard")) <= tol &&
          col("k_actual") === k).as("est_ok"))
  }
}
