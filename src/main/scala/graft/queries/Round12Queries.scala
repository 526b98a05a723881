package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables

/** Round-12 declared queries: the stored-MinHash pruned serving path
  * (D14′ — the last stored index family gains probed-key scan pruning,
  * the searchPruned/q187 discipline; measured decade-flat in BASELINE
  * §Round 12). */
object Round12Queries {

  private def t(s: SparkSession, d: String, n: String): DataFrame = Tables.load(s, d, n)

  /** Q236 (D14′, pruned stored-MinHash serving): q190's incremental
    * near-dup probe served through the DURABLE bundle with the probe
    * band keys pushed into the band-clustered bands scan
    * ([[graft.ext.MinHashIndex.probePruned]] — a bounded probes×bands
    * key collect becomes a per-band `band_key IN (...)` predicate that
    * row-group-skips the stored table; past
    * `graft.minhash.maxProbeKeys` the accelerator is skipped loudly and
    * the equi-join alone serves). Pruning selects a SUPERSET of the
    * join keys and the exact-Jaccard verify is verbatim, so q190's
    * exhaustive all-pairs oracle carries over VERBATIM — hash-exact,
    * not a contract. Lifecycle: build on the sub-400 corpus, store,
    * reload (the q233/q234 stored-serving convention); MinHashIndexSpec
    * pins pruned ≡ plain, the pushed predicate, and the over-bound
    * fallback. */
  val q236 = GQuery("q236_neardup_pruned", (s, d) => {
    import graft.ext.{IndexStore, MinHashIndex}
    val docs = t(s, d, "documents").select(col("doc_id"), col("text"))
    val idx = MinHashIndex.cached(
        s.sparkContext.applicationId + ":mhstore:" + d) {
      val dir = sys.props("java.io.tmpdir") +
        s"/graft_idx/mhstore_${Registry.pathKey(d)}"
      val built = MinHashIndex.build(docs.filter(col("doc_id") < 400),
        "doc_id", "text")
      IndexStore.writeMinhash(built, dir)
      MinHashIndex.drop(built) // serving reads the bundle, not the build
      IndexStore.loadMinhash(s, dir)
    }
    MinHashIndex.probePruned(idx, docs.filter(col("doc_id") >= 400),
        "doc_id", "text", threshold = 0.8)
      .orderBy("id_a", "id_b")
  }, Round7Queries.q190.oracle)

  val all: Seq[GQuery] = Seq(q236)
}
