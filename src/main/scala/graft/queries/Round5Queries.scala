package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType

import graft.Tables
import graft.ext.Multimodal

/** Round-5 declared queries: the MP4 container-metadata surface (M2's
  * video half, previously a declared stub — now a real ISO BMFF box walk)
  * gated through the oracle with the q116 synthesize-then-recompute
  * pattern.
  */
object Round5Queries {

  private def t(s: SparkSession, d: String, n: String): DataFrame = Tables.load(s, d, n)

  /** Q163 (M2″, MP4 container metadata through the gate): synthesize one
    * genuine (minimal, well-formed) MP4 box tree per document id, corrupt
    * every 10th container by truncation mid-box, and run the REAL
    * `ftyp`/`moov` box-walk decoder ([[Multimodal.decodeMp4]]). Every
    * decoded property — brand, timescale, duration, track count, codec
    * fourccs in track order — is a pure function of the id, so DuckDB
    * recomputes the whole table without a parser; truncated blobs must
    * come back `decode_ok=false` with zeroed metadata (corrupt blobs are
    * data, not task failures). Narrow maps end-to-end: synthesize →
    * corrupt → decode never shuffles, and the blob never survives past
    * the decoder. */
  val q163 = GQuery("q163_mp4_metadata", (s, d) => {
    val ids = t(s, d, "documents").select(col("doc_id"))
    val mp4s = Multimodal.synthesizeMp4(s, ids, "doc_id")
    val maybeCorrupt = mp4s.withColumn("media",
      when(col("media_id") % 10 === 0, expr("substring(media, 1, 20)"))
        .otherwise(col("media")))
    Multimodal.decodeMp4(s, maybeCorrupt).toDF()
      .select(col("media_id"), col("decode_ok"), col("major_brand"),
        col("timescale"), col("duration_ms"),
        col("n_tracks").cast(LongType).as("n_tracks"), col("codecs"))
      .orderBy("media_id")
  },
    Some("""WITH c AS (SELECT doc_id,
           |    CASE (doc_id + 0) % 3 WHEN 0 THEN 'avc1' WHEN 1 THEN 'mp4a' ELSE 'hev1' END AS c0,
           |    CASE (doc_id + 1) % 3 WHEN 0 THEN 'avc1' WHEN 1 THEN 'mp4a' ELSE 'hev1' END AS c1,
           |    CASE (doc_id + 2) % 3 WHEN 0 THEN 'avc1' WHEN 1 THEN 'mp4a' ELSE 'hev1' END AS c2,
           |    doc_id % 10 = 0 AS corrupt
           |  FROM documents)
           |SELECT doc_id AS media_id,
           |  NOT corrupt AS decode_ok,
           |  CASE WHEN corrupt THEN '' ELSE 'isom' END AS major_brand,
           |  CAST(CASE WHEN corrupt THEN 0 ELSE 1000 END AS BIGINT) AS timescale,
           |  CAST(CASE WHEN corrupt THEN 0
           |       ELSE 500 + (doc_id * 37) % 90000 END AS BIGINT) AS duration_ms,
           |  CAST(CASE WHEN corrupt THEN 0 ELSE 1 + doc_id % 3 END AS BIGINT) AS n_tracks,
           |  CASE WHEN corrupt THEN ''
           |       WHEN doc_id % 3 = 0 THEN c0
           |       WHEN doc_id % 3 = 1 THEN c0 || ',' || c1
           |       ELSE c0 || ',' || c1 || ',' || c2 END AS codecs
           |FROM c ORDER BY media_id""".stripMargin))

  /** Q164 (D5′, embedding near-dup — the SCALE path, benchable): the
    * LSH-bucketed candidate stage + exact-cosine verify tail
    * ([[graft.ext.Dedup.embeddingNearDupLsh]]), the form a 100 TB corpus
    * actually runs — q29's exact all-pairs twin is the ground truth and
    * intentionally quadratic (its oracle needs exactness), so the scaling
    * checkpoint (BASELINE.md) times THIS query instead. Deterministic
    * (seed-42 hyperplanes; every emitted pair is exact-verified ≥
    * threshold — zero false positives by construction), but candidate
    * recall is a property of the LSH draw, not SQL-expressible — so this
    * entry declares no oracle and takes the rows-only check; DedupSpec
    * holds its recall contract against the exact path. */
  val q164 = GQuery("q164_embedding_neardup_lsh", (s, d) =>
    graft.ext.Dedup.embeddingNearDupLsh(
      t(s, d, "embeddings"), "vec_id", "embedding", 0.4)
      .orderBy("id_a", "id_b"),
    None)

  val all: Seq[GQuery] = Seq(q163, q164)
}
