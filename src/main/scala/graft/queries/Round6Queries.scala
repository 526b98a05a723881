package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables
import graft.ext.{BpeTrainer, IvfIndex, Similarity}

/** Round-6 declared queries: the build-once/search-many ANN split
  * (`q78_build` / `q78_search` — the round-5 bench-placement critique)
  * and the int8-verify LSH-ANN tail (`q172`).
  */
object Round6Queries {

  private def t(s: SparkSession, d: String, n: String): DataFrame = Tables.load(s, d, n)

  private def probesOf(e: DataFrame): DataFrame =
    e.where(col("vec_id") < 5)
      .select(col("vec_id").as("probe_id"), col("embedding").as("pv"))

  /** Q78_BUILD (IVF index build, priced alone): Lloyd-trained centroids +
    * the corpus-sized inverted-list assignment, materialized eagerly
    * inside the query body ([[IvfIndex.buildTrained]] counts the lists),
    * so the bench entry times the BUILD and nothing else. The returned
    * row carries the structural invariants the oracle can recompute:
    * every corpus vector lands on exactly one list. */
  val q78b = GQuery("q78_build", (s, d) => {
    val e = t(s, d, "embeddings")
    val idx = IvfIndex.buildTrained(e, "vec_id", "embedding",
      nCentroids = 8, lloydIters = 2)
    val nAssigned = idx.assignment.count()
    IvfIndex.drop(idx)
    import s.implicits._
    Seq((8L, nAssigned)).toDF("n_centroids", "n_assigned")
  },
    Some("""SELECT CAST(8 AS BIGINT) AS n_centroids,
           |  CAST(count(*) AS BIGINT) AS n_assigned FROM embeddings""".stripMargin))

  /** Q78_SEARCH (IVF search against a PREBUILT index): the index is
    * built once per (session, table dir) via [[IvfIndex.cached]] and
    * reused — bench rep 1 pays the build, reps 2+ measure pure search,
    * and the min-of-3 headline is the search-many steady state. Same
    * recall contract and floor as q78 (identical centroids/search path,
    * so the trained-list quality gate carries over). */
  val q78s = GQuery("q78_search", (s, d) => {
    val e = t(s, d, "embeddings")
    val probes = probesOf(e)
    val idx = IvfIndex.cached(s.sparkContext.applicationId + ":" + d) {
      IvfIndex.buildTrained(e, "vec_id", "embedding",
        nCentroids = 8, lloydIters = 2)
    }
    val ann = IvfIndex.search(idx, e, probes, "vec_id", "embedding",
      "probe_id", "pv", k = 10, nprobe = 3)
    val exact = Similarity.bruteForceTopK(e, probes, "vec_id", "embedding",
      "probe_id", "pv", 10)
    Similarity.recallContract(ann, exact, "probe_id", "vec_id", k = 10,
      minHits = 2.0)
  }, Some(PipelineQueries.annContractSql))

  /** Q172 (N5 end-to-end: int8 under the ANN verify tail): LSH buckets
    * on the float vectors (hyperplane signs are scale-invariant), the
    * candidate VERIFY stage in q170-gated int8 (integer dot products, a
    * quarter of the verify bytes — the stage that dominates at 10⁹
    * vectors), float re-rank of the 4k-per-probe short list. Gated by
    * the q30-family recall contract against the float brute-force top-10
    * — quantization must not cost recall at the gate SF; the underlying
    * integer representation is bit-gated by q170 on the same
    * [[graft.ext.Quantize.int8]] output. */
  val q172 = GQuery("q172_ann_lsh_q8", (s, d) => {
    val e = t(s, d, "embeddings")
    val probes = probesOf(e)
    val ann = Similarity.lshTopKQ8(e, probes, "vec_id", "embedding",
      "probe_id", "pv", k = 10, tables = 8, dim = 64)
    val exact = Similarity.bruteForceTopK(e, probes, "vec_id", "embedding",
      "probe_id", "pv", 10)
    Similarity.recallContract(ann, exact, "probe_id", "vec_id", k = 10,
      minHits = 2.0)
  }, Some(PipelineQueries.annContractSql))

  /** Q173 (T12′, production BPE encoder through the gate): train K=16
    * merges on a deterministic document slice, encode the WHOLE corpus
    * with [[BpeTrainer.encodePartitioned]] (the mapPartitions
    * heap-encoder — constant plan size at any K), and gate the
    * invariants DuckDB can recompute: every document round-trips
    * byte-exactly (token concatenation rebuilds the whitespace-stripped
    * text) and the corpus compresses vs raw characters. The
    * trie≡fold-encode equivalence itself is spec-pinned
    * (BpeTrainerSpec); this entry keeps the production encoder on the
    * per-round oracle treadmill. */
  val q173 = GQuery("q173_bpe_encode", (s, d) => {
    val docs = t(s, d, "documents").select(col("doc_id"), col("text"))
    val merges = BpeTrainer.train(
      docs.filter(col("doc_id") < 200), "text", numMerges = 16, minPairCount = 2)
    BpeTrainer.encodePartitioned(docs, "text", merges)
      .select(col("doc_id"), col("n_tokens"),
        (concat_ws("", col("tokens")) ===
          regexp_replace(col("text"), "\\s+", "")).as("ok"),
        length(regexp_replace(col("text"), "\\s+", "")).as("n_chars"))
      .agg(count(lit(1)).as("n_docs"),
        sum(when(col("ok"), 0L).otherwise(1L)).as("n_roundtrip_fail"),
        (sum(col("n_tokens")) < sum(col("n_chars"))).as("compressed"))
  },
    Some("""SELECT CAST(count(*) AS BIGINT) AS n_docs,
           |  CAST(0 AS BIGINT) AS n_roundtrip_fail,
           |  true AS compressed FROM documents""".stripMargin))

  val all: Seq[GQuery] = Seq(q78b, q78s, q172, q173)
}
