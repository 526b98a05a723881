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

  /** Q241 (N15, binary quantization + Hamming — the EXACT half): packed
    * sign-bit signatures and the Hamming top-10 per probe, both
    * recomputed end-to-end by DuckDB from the raw floats (sign packing
    * into 32-bit lanes, popcount-of-xor, identical tie-break) — integer
    * outputs only, hash-exact. This gates the quantizer and the
    * shortlist kernel; q242 gates the full serve path's recall. */
  val q241 = GQuery("q241_bq_hamming_topk", (s, d) => {
    import graft.ext.BqIndex
    val e = t(s, d, "embeddings")
    val sigs = BqIndex.signatures(e, "vec_id", "embedding", dim = 64)
    val probes = e.where(col("vec_id") < 5)
      .select(col("vec_id").as("probe_id"), col("embedding").as("pv"))
    BqIndex.hammingShortlist(sigs, probes, "vec_id", "probe_id", "pv",
        keep = 10, dim = 64)
      .select(col("pid").as("probe_id"), col("vec_id"), col("hamming"))
      .orderBy("probe_id", "hamming", "vec_id")
  },
    Some("""WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
           |sig AS (SELECT vec_id,
           |  list_transform(range(2), w ->
           |    list_sum(list_transform(range(32), i ->
           |      CASE WHEN v[w*32 + i + 1] > 0 THEN (1::BIGINT << i)
           |           ELSE 0::BIGINT END))::BIGINT) AS s
           |  FROM e)
           |SELECT p.vec_id AS probe_id, c.vec_id AS vec_id,
           |  CAST(bit_count(xor(p.s[1], c.s[1])) +
           |       bit_count(xor(p.s[2], c.s[2])) AS BIGINT) AS hamming
           |FROM sig p JOIN sig c ON p.vec_id < 5 AND c.vec_id <> p.vec_id
           |QUALIFY row_number() OVER (PARTITION BY p.vec_id
           |                           ORDER BY hamming, c.vec_id) <= 10
           |ORDER BY probe_id, hamming, vec_id""".stripMargin))

  /** Q242 (N15, the SERVE half): top-10 through the durable BQ bundle —
    * Hamming shortlist over the stored 16-byte/vector packed table,
    * shortlist ids pushed into the id-sorted float table, exact cosine
    * re-rank — under the q30-family recall contract (exactly k results
    * per probe, ≥ minHits of the exact top-10; floor 2/10 with margin
    * under the measured 4/10 minimum at the gate SF). Memoized per
    * (session, dir): rep 1 pays build+write+load, reps 2+ price the
    * steady serve. */
  val q242 = GQuery("q242_bq_ann_serve", (s, d) => {
    import graft.ext.{BqIndex, IndexStore, Similarity}
    val e = t(s, d, "embeddings")
    val b = BqIndex.cached(s.sparkContext.applicationId + ":bq:" + d) {
      val dir = sys.props("java.io.tmpdir") +
        s"/graft_idx/bq_${Registry.pathKey(d)}"
      IndexStore.writeBq(e, "vec_id", "embedding", dim = 64, dir)
      IndexStore.loadBq(s, dir)
    }
    val probes = e.where(col("vec_id") < 5)
      .select(col("vec_id").as("probe_id"), col("embedding").as("pv"))
    val ann = BqIndex.searchStored(b, probes, "vec_id", "embedding",
      "probe_id", "pv", k = 10, rerankFactor = 4)
    val exact = Similarity.bruteForceTopK(e, probes, "vec_id", "embedding",
      "probe_id", "pv", 10)
    Similarity.recallContract(ann, exact, "probe_id", "vec_id",
      k = 10, minHits = 2.0)
  }, Some(PipelineQueries.annContractSql))

  /** Q243 (D16, quality-argmax near-dup representative): q64's
    * end-to-end corpus near-dup removal with the keep policy a curation
    * pipeline actually wants — inside each cluster keep the LONGEST doc
    * (n_chars desc, ties min-id) instead of the min-id one. Summarized
    * per language with an id-sum pinning the exact member set; oracle is
    * q64's recursive-CTE closure with the argmax winner recomputed per
    * component. */
  val q243 = GQuery("q243_dedup_keep_best",
    (s, d) => graft.ext.Dedup.dropNearDuplicatesKeepBest(
        t(s, d, "documents"), "doc_id", "text", keepCol = "n_chars",
        threshold = 0.8, shingleK = 3, numHashes = 128, bands = 32)
      .groupBy("lang")
      .agg(count(lit(1)).as("n_docs"), sum(col("doc_id")).as("id_sum"))
      .orderBy("lang"),
    Some(s"""WITH RECURSIVE ${PipelineQueries.duckShingles3},
            |p AS (SELECT a.doc_id AS id_a, b.doc_id AS id_b
            |      FROM s a JOIN s b ON a.doc_id < b.doc_id
            |      WHERE round(len(list_intersect(a.sh, b.sh))::DOUBLE
            |              / len(list_distinct(list_concat(a.sh, b.sh))), 6) >= 0.8),
            |e AS (SELECT id_a AS src, id_b AS dst FROM p
            |      UNION SELECT id_b, id_a FROM p),
            |reach AS (
            |  SELECT src AS node, src AS r FROM e
            |  UNION
            |  SELECT e.dst AS node, reach.r FROM reach JOIN e ON e.src = reach.node),
            |comp AS (SELECT node, min(r) AS component FROM reach GROUP BY node),
            |w AS (SELECT d.doc_id
            |      FROM documents d JOIN comp c ON d.doc_id = c.node
            |      QUALIFY row_number() OVER (PARTITION BY c.component
            |        ORDER BY d.n_chars DESC, d.doc_id) = 1)
            |SELECT lang, count(*) AS n_docs, CAST(sum(doc_id) AS BIGINT) AS id_sum
            |FROM documents
            |WHERE doc_id NOT IN (SELECT node FROM comp)
            |   OR doc_id IN (SELECT doc_id FROM w)
            |GROUP BY lang ORDER BY lang""".stripMargin))

  /** Q244 (T24, Unicode-script profile): per-doc codepoint counts by
    * script class rolled up LONG-FORM — one row per (lang, class) with
    * a single summed count. Both sides count EXPLICIT codepoint ranges
    * (JDK `\uXXXX` here, RE2 `\x{...}` in the twin — same ranges,
    * different spelling): named script properties (`\p{IsLatin}` vs
    * `\p{Latin}`) read each engine's frozen Unicode table and skew by
    * Unicode version. Round-16 restructure (VERDICT r15 #1) after two
    * rounds of local-green/driver-red on the wide rollup: (a) LONG form
    * — a driver mismatch now localizes to one (lang, class) row instead
    * of one opaque 8-column row; (b) `space` is an EXPLICIT class (it
    * previously entered only through `other = length − …`, coupling
    * every class's error into one column); (c) every twin aggregate is
    * cast `::BIGINT` — q244 was the ONLY gated twin leaving `sum
    * (BIGINT)` as DuckDB HUGEINT (INT128), whose client-side rendering
    * (HUGEINT → float in common fetch paths) hash-mismatches on
    * IDENTICAL values, the one suspect that survives identical regex
    * semantics; (d) the dominant-script/mixed derivation moved to the
    * data-independent fixed-literal gate [[Round16Queries.q258]]. */
  val q244 = GQuery("q244_script_profile", (s, d) => {
    import graft.ext.TextAnalysis
    val prof = TextAnalysis.scriptProfile(col("text"))
    t(s, d, "documents")
      .select(col("doc_id") +: col("lang") +:
        prof.map { case (n, c) => c.as(n) }: _*)
      .selectExpr("lang",
        "stack(5, 'latin', latin_cnt, 'han', han_cnt, 'digit', digit_cnt, " +
          "'space', space_cnt, 'other', other_cnt) AS (class, cnt)")
      .groupBy("lang", "class")
      .agg(count(lit(1)).as("n_docs"), sum(col("cnt")).as("cnt_sum"))
      .orderBy("lang", "class")
  },
    Some("""WITH p AS (SELECT doc_id, lang,
           |    len(regexp_extract_all(text, '[A-Za-z\x{00C0}-\x{00D6}\x{00D8}-\x{00F6}\x{00F8}-\x{02AF}\x{1E00}-\x{1EFF}]'))::BIGINT AS latin_cnt,
           |    len(regexp_extract_all(text, '[\x{3400}-\x{4DBF}\x{4E00}-\x{9FFF}\x{F900}-\x{FAD9}]'))::BIGINT AS han_cnt,
           |    len(regexp_extract_all(text, '[0-9]'))::BIGINT AS digit_cnt,
           |    len(regexp_extract_all(text, '[ \t\n\r\f]'))::BIGINT AS space_cnt,
           |    length(text)::BIGINT AS n FROM documents),
           |u AS (SELECT lang, 'latin' AS class, latin_cnt AS cnt FROM p
           |      UNION ALL SELECT lang, 'han', han_cnt FROM p
           |      UNION ALL SELECT lang, 'digit', digit_cnt FROM p
           |      UNION ALL SELECT lang, 'space', space_cnt FROM p
           |      UNION ALL SELECT lang, 'other',
           |        n - latin_cnt - han_cnt - digit_cnt - space_cnt FROM p)
           |SELECT lang, class, count(*)::BIGINT AS n_docs,
           |  CAST(sum(cnt) AS BIGINT) AS cnt_sum
           |FROM u GROUP BY lang, class
           |ORDER BY lang, class""".stripMargin))

  /** Q245 (N16, IVF-routed BQ serve): top-10 through the stored routed
    * bundle — trained-centroid routing (q78's operating point:
    * 8 centroids / Lloyd 2 / nprobe 3) over centroid-clustered PACKED
    * signatures, Hamming shortlist inside the probed lists only, float
    * re-rank over the shortlist-id-pushed fetch — under the q30-family
    * recall contract. The composition's recall is bounded by its two
    * knobs independently (routing admits the lists, BQ ranks inside
    * them); floor 1.5/10 (integer hits ⇒ ≥2 required), recall_ok
    * measured green at sf0.001 and the sf0.01 gate. Memoized per
    * (session, dir): rep 1 pays
    * Lloyd+write+load, reps 2+ price the routed steady state. */
  val q245 = GQuery("q245_ivfbq_ann_serve", (s, d) => {
    import graft.ext.{BqIndex, IndexStore, Similarity}
    val e = t(s, d, "embeddings")
    val b = BqIndex.cachedRouted(s.sparkContext.applicationId + ":ivfbq:" + d) {
      val dir = sys.props("java.io.tmpdir") +
        s"/graft_idx/ivfbq_${Registry.pathKey(d)}"
      IndexStore.writeIvfBq(e, "vec_id", "embedding", dim = 64,
        nCentroids = 8, lloydIters = 2, dir)
      IndexStore.loadIvfBq(s, dir)
    }
    val probes = e.where(col("vec_id") < 5)
      .select(col("vec_id").as("probe_id"), col("embedding").as("pv"))
    val ann = BqIndex.searchRouted(b, probes, "vec_id", "embedding",
      "probe_id", "pv", k = 10, nprobe = 3, rerankFactor = 4)
    val exact = Similarity.bruteForceTopK(e, probes, "vec_id", "embedding",
      "probe_id", "pv", 10)
    Similarity.recallContract(ann, exact, "probe_id", "vec_id",
      k = 10, minHits = 1.5)
  }, Some(PipelineQueries.annContractSql))

  /** Q246 (M5, REAL EXIF parse): synthesized REAL JPEGs carry a REAL
    * TIFF-in-APP1 EXIF segment (byte order alternating II/MM by id
    * parity — the gate proves BOTH endian paths), and the byte-walking
    * parser recovers orientation/make/datetime. Every output is a pure
    * function of the id, so DuckDB restates the whole table
    * arithmetic-only — hash-exact, the q163/q240 container pattern for
    * the metadata plane. */
  val q246 = GQuery("q246_exif_parse", (s, d) => {
    import graft.ext.Multimodal
    val ids = t(s, d, "documents").select(col("doc_id")).where(col("doc_id") < 60)
    val media = Multimodal.synthesizeJpegWithExif(s, ids, "doc_id")
    Multimodal.exifMeta(s, media).toDF()
      .select(col("media_id"), col("exif_ok"), col("byte_order"),
        col("orientation").cast("long").as("orientation"),
        col("make"), col("datetime"))
      .orderBy("media_id")
  },
    Some("""SELECT doc_id AS media_id, true AS exif_ok,
           |  CASE WHEN doc_id % 2 = 0 THEN 'II' ELSE 'MM' END AS byte_order,
           |  CAST(1 + doc_id % 8 AS BIGINT) AS orientation,
           |  'cam_' || CAST(doc_id % 5 AS VARCHAR) AS make,
           |  '2024:01:' || lpad(CAST(1 + doc_id % 28 AS VARCHAR), 2, '0')
           |    || ' 00:00:00' AS datetime
           |FROM documents WHERE doc_id < 60 ORDER BY media_id""".stripMargin))

  /** Q247 (ST18's decay law, gated): the trending-terms score law
    * score_t = Σ n_b·decay^(t−b) computed by the declarative batch twin
    * ([[graft.streaming.TrendingTerms.scoresBatch]] — the same law the
    * stream ≡ batch spec pins the stateful operator against) over the
    * events table: term = event_type, tick = epoch-day of ts, n = daily
    * count. decay = 0.5 keeps every per-term product an exact dyadic
    * double, so both engines sum identically; the shared 1e-9 rounding
    * is applied to bit-identical doubles on both sides. */
  val q247 = GQuery("q247_trending_decay", (s, d) => {
    import graft.streaming.TrendingTerms
    import s.implicits._
    val daily = t(s, d, "events")
      .groupBy(col("event_type").as("term"),
        datediff(to_date(col("ts")), lit("1970-01-01")).cast("long").as("tick"))
      .agg(count(lit(1)).as("n"))
      .as[TrendingTerms.TermEvent]
    TrendingTerms.scoresBatch(daily, decay = 0.5).toDF()
      .orderBy("term", "tick")
  },
    Some("""WITH p AS (SELECT event_type AS term,
           |    CAST(CAST(CAST(ts AS TIMESTAMP) AS DATE)
           |         - DATE '1970-01-01' AS BIGINT) AS tick,
           |    count(*) AS n
           |  FROM events GROUP BY 1, 2)
           |SELECT a.term, a.tick,
           |  round(sum(b.n * power(0.5, a.tick - b.tick)) * 1e9) / 1e9 AS score
           |FROM p a JOIN p b ON a.term = b.term AND b.tick <= a.tick
           |GROUP BY a.term, a.tick ORDER BY a.term, a.tick""".stripMargin))

  val all: Seq[GQuery] =
    Seq(q238, q239, q240, q241, q242, q243, q244, q245, q246, q247)
}
