package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables

/** Round-13 declared queries: the index-bundle compaction lifecycle
  * (L18 — [[graft.ext.IndexStore.compact]] folds every family's
  * `inc/<token>/` chain back into one re-clustered base; VERDICT r12
  * What's-wrong #2). */
object Round13Queries {

  private def t(s: SparkSession, d: String, n: String): DataFrame = Tables.load(s, d, n)

  /** Q237 (L18, serving through a COMPACTED bundle): q233's incremental
    * BM25 lifecycle extended by the missing maintenance step — build on
    * the base slice, TWO chained appends, then
    * [[graft.ext.IndexStore.compact]] folds the increment chain into
    * one term-clustered base (per-increment df rows folded
    * vocabulary-sized, (nDocs, sumDl) untouched in meta, the whole
    * swap one meta CAS) — and q191's query serves through the RELOADED
    * compacted bundle. Compaction is load-identical by construction
    * (the live row set is unioned and re-clustered, never recomputed),
    * so q191's full-corpus oracle carries over VERBATIM — hash-exact,
    * not a contract. IndexStoreCompactSpec pins load/search equality,
    * GC state, post-compact appends, and kill-before-commit inertness
    * for every family; this gate pins the end-to-end serve path. */
  val q237 = GQuery("q237_bm25_compacted", (s, d) => {
    import graft.ext.{IndexStore, InvertedIndex}
    val docs = t(s, d, "documents").select(col("doc_id"), col("text"))
    val idx = InvertedIndex.cached(
        s.sparkContext.applicationId + ":invcmp:" + d) {
      val maxId = docs.agg(max(col("doc_id"))).head().getLong(0)
      val cutA = maxId - 2 * (maxId / 5)
      val cutB = maxId - maxId / 5
      val dir = sys.props("java.io.tmpdir") +
        s"/graft_idx/invcmp_${Registry.pathKey(d)}"
      IndexStore.writeInverted(
        InvertedIndex.build(docs.where(col("doc_id") < cutA),
          "doc_id", "text"), dir)
      IndexStore.appendInverted(
        docs.where(col("doc_id") >= cutA && col("doc_id") < cutB),
        "doc_id", "text", dir)
      IndexStore.appendInverted(docs.where(col("doc_id") >= cutB),
        "doc_id", "text", dir)
      IndexStore.compact(s, dir)
      IndexStore.loadInverted(s, dir)
    }
    InvertedIndex.bm25(idx, Seq("spark", "window", "hash"), topK = 20)
  }, Round7Queries.q191.oracle)

  val all: Seq[GQuery] = Seq(q237)
}
