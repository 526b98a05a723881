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

  /** Q239 (M2‴, REAL video frame decode — MJPEG/AVI): the declared-stub
    * half of M2 closed by the honest zero-dependency route: the JDK
    * ships no H.264 codec (MP4 stays container-only, q163), but
    * Motion-JPEG frames ARE baseline JPEGs. One synthesized REAL AVI
    * per doc id (solid-gray JPEG frames — gray survives 4:2:0
    * subsampling exactly, so the decode error is just the luma DC
    * quantizer), every frame decoded through the actual JDK decoder,
    * and the gate checks the q116 contract: frame inventory and
    * dimensions are pure functions of the id DuckDB recomputes
    * codec-free, and the decoded mean luma lands inside the stated
    * ±2.5 DC-quantization band (boolean in-plan, the contract-row
    * pattern). */
  val q239 = GQuery("q239_avi_frame_decode", (s, d) => {
    import graft.ext.Multimodal
    val ids = t(s, d, "documents").select(col("doc_id")).where(col("doc_id") < 60)
    val media = Multimodal.synthesizeAvi(s, ids, "doc_id")
    Multimodal.sampleAviFrames(s, media, stride = 1, maxFrames = 8).toDF()
      .select(col("media_id"), col("frame_index"), col("width"), col("height"),
        (col("decode_ok") &&
          abs(col("mean_luma") - (lit(16.0) +
            lit(16.0) * pmod(col("media_id") + col("frame_index"), lit(13L))))
            < 2.5).as("luma_ok"))
      .orderBy("media_id", "frame_index")
  },
    Some("""WITH ids AS (SELECT doc_id AS media_id FROM documents WHERE doc_id < 60),
           |f AS (SELECT media_id,
           |        unnest(generate_series(0, CAST(media_id % 4 AS BIGINT))) AS frame_index
           |      FROM ids)
           |SELECT media_id, frame_index,
           |  CAST(8 + media_id % 8 AS BIGINT) AS width,
           |  CAST(8 + (media_id // 8) % 8 AS BIGINT) AS height,
           |  true AS luma_ok
           |FROM f ORDER BY media_id, frame_index""".stripMargin))

  /** Q240 (M2⁗, AVI container parse): the 'avih' header fields plus the
    * movi-list video-chunk census (ground truth over the advisory
    * header count) — every output a pure function of the id, full
    * oracle (the q163 shape for RIFF instead of ISO BMFF). */
  val q240 = GQuery("q240_avi_container", (s, d) => {
    import graft.ext.Multimodal
    val ids = t(s, d, "documents").select(col("doc_id")).where(col("doc_id") < 60)
    val media = Multimodal.synthesizeAvi(s, ids, "doc_id")
    Multimodal.decodeAvi(s, media).toDF()
      .select(col("media_id"), col("decode_ok"),
        col("us_per_frame"), col("total_frames"),
        col("n_streams").cast("long").as("n_streams"),
        col("width").cast("long").as("width"),
        col("height").cast("long").as("height"),
        col("n_video_chunks"))
      .orderBy("media_id")
  },
    Some("""SELECT doc_id AS media_id, true AS decode_ok,
           |  CAST(40000 AS BIGINT) AS us_per_frame,
           |  CAST(1 + doc_id % 4 AS BIGINT) AS total_frames,
           |  CAST(1 AS BIGINT) AS n_streams,
           |  CAST(8 + doc_id % 8 AS BIGINT) AS width,
           |  CAST(8 + (doc_id // 8) % 8 AS BIGINT) AS height,
           |  CAST(1 + doc_id % 4 AS BIGINT) AS n_video_chunks
           |FROM documents WHERE doc_id < 60 ORDER BY media_id""".stripMargin))

  val all: Seq[GQuery] = Seq(q238, q239, q240)
}
