package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables

/** Round-14 declared queries: the fingerprinted MinHash verify side
  * (D14′ — the gsf100 MinhashProbe finding that the doc-clustered
  * shingle-STRING fetch dominates probe_full at 2.5M docs, attacked by
  * storing each doc's shingle set as its sorted 64-bit base-hash
  * array; BASELINE §Round 14 measured 2.0× on the full probe path). */
object Round14Queries {

  private def t(s: SparkSession, d: String, n: String): DataFrame = Tables.load(s, d, n)

  /** Q238 (D14′, incremental near-dup through the FINGERPRINTED stored
    * bundle): q190's production crawl-dedup lifecycle served from
    * [[graft.ext.IndexStore.writeMinhashFp]] — the corpus indexed once
    * with fingerprint verify sides, only the increment sketched per
    * probe, candidates exact-verified by Jaccard over 64-bit
    * fingerprint sets. The oracle is q190's VERBATIM: DuckDB computes
    * the exhaustive corpus×increment all-pairs Jaccard over the shingle
    * STRINGS, so the hash-exact match is itself the proof that
    * fingerprint Jaccard reproduces string Jaccard on real data (a
    * 64-bit collision inside one pair's union — ~m²/2⁶⁴ ≈ 1e-15 — is
    * the only divergence, the q26 miss-probability class). Memoized per
    * (session, dir): rep 1 pays build+write+load, reps 2+ price the
    * fingerprinted steady state beside q190's string-path readings. */
  val q238 = GQuery("q238_incremental_neardup_fp", (s, d) => {
    import graft.ext.{IndexStore, MinHashIndex}
    val docs = t(s, d, "documents").select(col("doc_id"), col("text"))
    val idx = MinHashIndex.cachedFp(
        s.sparkContext.applicationId + ":mhfp:" + d) {
      val built = MinHashIndex.build(docs.filter(col("doc_id") < 400),
        "doc_id", "text")
      val dir = sys.props("java.io.tmpdir") +
        s"/graft_idx/mhfp_${Registry.pathKey(d)}"
      IndexStore.writeMinhashFp(built, dir)
      MinHashIndex.drop(built)
      IndexStore.loadMinhashFp(s, dir)
    }
    MinHashIndex.probeFp(idx, docs.filter(col("doc_id") >= 400),
        "doc_id", "text", threshold = 0.8)
      .orderBy("id_a", "id_b")
  }, Round7Queries.q190.oracle)

  val all: Seq[GQuery] = Seq(q238)
}
