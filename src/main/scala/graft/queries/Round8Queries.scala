package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables

/** Round-8 declared queries: compressibility quality signal (LZ78) and
  * shard-parallel graph ANN (HNSW).
  */
object Round8Queries {

  private def t(s: SparkSession, d: String, n: String): DataFrame = Tables.load(s, d, n)

  /** Q218 (T23, LZ78 compressibility filter): per-document incremental-
    * parse phrase count ([[graft.ext.TextAnalysis.lz78Phrases]] — a
    * native codegen'd expression, one map-only projection over the
    * corpus like every TextAnalysis feature) plus the normalized ratio
    * and the band keep-flag both tails of which real pipelines drop
    * (machine repetition below, noise above). The parse is sequential
    * per string, NOT SQL-expressible → DECLARED rows-only (the
    * q164/q168 class); Lz78Spec pins phrase counts character-for-
    * character against an independently-written trie reference, and
    * the ratio/keep columns are pure SQL over the pinned count.
    * Deterministic, so the rows-only check hash-stabilizes. */
  val q218 = GQuery("q218_lz_compressibility", (s, d) => {
    import graft.ext.TextAnalysis
    t(s, d, "documents")
      .select(col("doc_id"), length(col("text")).as("n_chars"),
        TextAnalysis.lz78Phrases(col("text")).as("lz_phrases"),
        TextAnalysis.lz78Ratio(col("text")).as("lz_ratio"))
      .withColumn("keep",
        // band scaled to the synthetic corpus (ratios 0.38–0.67, median
        // 0.44 at sf0.01) so BOTH edges genuinely fire at the gate SF —
        // the Gopher word-count-band convention (q180)
        col("lz_ratio") >= 0.40 && col("lz_ratio") <= 0.55)
      .orderBy("doc_id")
  }, None)

  /** Q219 (N14, shard-parallel HNSW): the graph-based ANN family —
    * build per-shard navigable-small-world graphs ([[graft.ext.Hnsw]],
    * Malkov & Yashunin 2016) in one corpus pass, persist through
    * [[graft.ext.IndexStore]] (kind=hnsw, clustered by shard), reload,
    * scatter-gather search. Memoized per (session, dir): rep 1 pays
    * build+write+load, reps 2+ price steady-state serving (the
    * q177/q187 lifecycle). Gate = the q30-family recall contract with
    * floor 7/10 (measured minimum 9/10 at both gate SFs; LSH's floor is
    * 2/10 on the same corpus — the graph family earns its keep). */
  val q219 = GQuery("q219_ann_hnsw", (s, d) => {
    import graft.ext.{Hnsw, IndexStore, Similarity}
    val e = t(s, d, "embeddings")
    val probes = e.where(col("vec_id") < 5)
      .select(col("vec_id").as("probe_id"), col("embedding").as("pv"))
    val params = Hnsw.Params(m = 8, efConstruction = 64, efSearch = 48)
    val graph = Hnsw.cached(s.sparkContext.applicationId + ":hnsw:" + d) {
      val n = e.count()
      val shards = math.max(1L, n / 512L).toInt // ≥2 shards past 1k vectors
      val built = Hnsw.build(e, "vec_id", "embedding", shards, params)
      val dir = sys.props("java.io.tmpdir") +
        s"/graft_idx/hnsw_${math.abs(d.hashCode)}"
      IndexStore.writeHnsw(built, params, dir)
      IndexStore.loadHnsw(s, dir)._1
    }
    val ann = Hnsw.search(graph, probes, "probe_id", "pv", k = 10, params)
    val exact = Similarity.bruteForceTopK(e, probes, "vec_id", "embedding",
      "probe_id", "pv", 10)
    Similarity.recallContract(ann, exact, "probe_id", "vec_id", k = 10,
      minHits = 7.0)
  }, Some(PipelineQueries.annContractSql))

  val all: Seq[GQuery] = Seq(q218, q219)
}
