package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables
import graft.bi.{ChartCompiler, ChartSpec, Metric}
import graft.engine.Seed
import graft.ext.{Dedup, Multimodal, Similarity, Splits, TextAnalysis}

/** Declared queries Q26–Q39: the training-data-pipeline operator surface
  * (dedup family, ANN family, text analysis, multimodal plumbing, BI chart
  * compiler) over the driver corpora. SURVEY.md §2.11.
  *
  * Oracle discipline: sketch-accelerated operators (MinHash-LSH, SimHash,
  * LSH/IVF-ANN) emit *exactly-verified* outputs where possible so the
  * DuckDB twin can compute the same result exhaustively; purely approximate
  * outputs (ANN top-k, SimHash pairs) are declared oracle-less (rows-only
  * driver check) and are instead recall/property-tested in the ScalaTest
  * specs against their exact baselines.
  */
object PipelineQueries {

  private def t(s: SparkSession, d: String, n: String): DataFrame = Tables.load(s, d, n)

  /** DuckDB CTE producing distinct word-3-shingle sets per doc (twin of
    * TextPrep.shingles(text, 3)). Shared with AdvancedQueries (q56 clusters
    * the same near-dup pair set q26 emits). */
  private[queries] val duckShingles3 =
    """t AS (SELECT doc_id, string_split_regex(lower(trim(text)), '\s+') AS w
      |      FROM documents),
      |s AS (SELECT doc_id,
      |        list_distinct([w[i] || ' ' || w[i+1] || ' ' || w[i+2]
      |                       for i in range(1, len(w) - 1)]) AS sh
      |      FROM t WHERE len(w) >= 3)""".stripMargin

  /** Q26 (dedup / MinHash+LSH): near-duplicate pairs at 3-gram Jaccard
    * ≥ 0.8. Candidates via 128-hash 32-band MinHash LSH, verified exactly;
    * the oracle computes the same set by exhaustive all-pairs Jaccard
    * (miss probability of the LSH stage at j=0.8 is ≈5e-8). */
  val q26 = GQuery("q26_minhash_neardup",
    (s, d) => Dedup.minHashLshPairs(t(s, d, "documents"), "doc_id", "text",
        threshold = 0.8, shingleK = 3, numHashes = 128, bands = 32)
      .orderBy("id_a", "id_b"),
    Some(s"""WITH $duckShingles3,
            |p AS (SELECT a.doc_id AS id_a, b.doc_id AS id_b,
            |        round(len(list_intersect(a.sh, b.sh))::DOUBLE
            |              / len(list_distinct(list_concat(a.sh, b.sh))), 6) AS jaccard
            |      FROM s a JOIN s b ON a.doc_id < b.doc_id)
            |SELECT id_a, id_b, jaccard FROM p WHERE jaccard >= 0.8
            |ORDER BY id_a, id_b""".stripMargin))

  /** Q27 (dedup / SimHash): recall contract of the 64-bit SimHash banded
    * candidate generator against the exhaustive exact-Jaccard pair set.
    * The candidate pairs themselves are engine-specific (xxhash64 sketch),
    * so the CHECKED output is the q13 pattern: the oracle recomputes the
    * ground truth (all-pairs Jaccard ≥ 0.8 — real exhaustive work in
    * DuckDB) and states the contract `recall_ok`; Spark measures actual
    * recall of the SimHash candidates (≥ 0.8, the same floor DedupSpec
    * asserts; measured 0.92 at the gate SF). A bucketing or sketch
    * regression flips `recall_ok` false and the gate goes red. */
  val q27 = GQuery("q27_simhash_neardup", (s, d) => {
    val docs = t(s, d, "documents")
    val cands = Dedup.simHashPairs(docs, "doc_id", "text", maxHamming = 8)
      .select("id_a", "id_b")
    val exact = Dedup.minHashLshPairs(docs, "doc_id", "text",
        threshold = 0.8, shingleK = 3, numHashes = 128, bands = 32)
      .select("id_a", "id_b")
    exact.join(cands.withColumn("__hit", lit(1)), Seq("id_a", "id_b"), "left")
      .agg(count(lit(1)).as("n_exact_pairs"), count(col("__hit")).as("__n_found"))
      .select(col("n_exact_pairs"),
        (col("__n_found") >= col("n_exact_pairs") * lit(0.8)).as("recall_ok"))
  },
    Some(s"""WITH $duckShingles3,
            |p AS (SELECT a.doc_id AS id_a, b.doc_id AS id_b,
            |        round(len(list_intersect(a.sh, b.sh))::DOUBLE
            |              / len(list_distinct(list_concat(a.sh, b.sh))), 6) AS jaccard
            |      FROM s a JOIN s b ON a.doc_id < b.doc_id)
            |SELECT count(*) AS n_exact_pairs, true AS recall_ok
            |FROM p WHERE jaccard >= 0.8""".stripMargin))

  /** Q28 (dedup / n-gram Jaccard primitive): exact 3-gram Jaccard for an
    * explicit blocked pair list (consecutive doc ids — the shape of any
    * externally-blocked verification join). */
  val q28 = GQuery("q28_ngram_jaccard", (s, d) => {
    val docs = t(s, d, "documents")
    val pairs = docs.select(col("doc_id").as("id_a"), (col("doc_id") + 1).as("id_b"))
      .where(col("id_a") < 100)
    Dedup.ngramJaccard(docs, pairs, "doc_id", "text", 3)
      .orderBy("id_a", "id_b")
  },
    Some(s"""WITH $duckShingles3,
            |pairs AS (SELECT doc_id AS id_a, doc_id + 1 AS id_b FROM documents WHERE doc_id < 100)
            |SELECT p.id_a, p.id_b,
            |  round(len(list_intersect(a.sh, b.sh))::DOUBLE
            |        / len(list_distinct(list_concat(a.sh, b.sh))), 6) AS jaccard
            |FROM pairs p JOIN s a ON a.doc_id = p.id_a JOIN s b ON b.doc_id = p.id_b
            |ORDER BY id_a, id_b""".stripMargin))

  /** Q29 (dedup / embedding near-dup): exact all-pairs cosine ≥ 0.4
    * (threshold calibrated to the uniform-random driver vectors; real
    * corpora use ≥0.95 with the LSH candidate stage swapped in). */
  val q29 = GQuery("q29_embedding_neardup",
    (s, d) => Dedup.embeddingNearDup(t(s, d, "embeddings"), "vec_id", "embedding", 0.4)
      .orderBy("id_a", "id_b"),
    Some("""WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings)
           |SELECT a.vec_id AS id_a, b.vec_id AS id_b,
           |  round(list_inner_product(a.v, b.v) /
           |        (sqrt(list_inner_product(a.v, a.v)) * sqrt(list_inner_product(b.v, b.v))), 6) AS cos_sim
           |FROM e a JOIN e b ON a.vec_id < b.vec_id
           |WHERE round(list_inner_product(a.v, b.v) /
           |        (sqrt(list_inner_product(a.v, a.v)) * sqrt(list_inner_product(b.v, b.v))), 6) >= 0.4
           |ORDER BY id_a, id_b""".stripMargin))

  /** Shared oracle for the ANN contract queries: the contract itself
    * (5 probes × exactly 10 results × recall over floor). */
  private[queries] val annContractSql =
    """SELECT vec_id AS probe_id, CAST(10 AS BIGINT) AS n_results, true AS recall_ok
      |FROM embeddings WHERE vec_id < 5 ORDER BY probe_id""".stripMargin

  /** Q30 (similarity / LSH-ANN): recall contract of the bucketed
    * approximate top-10 (exact re-rank) vs the in-plan brute-force top-10 —
    * [[Similarity.recallContract]]. Floor 2/10 per probe (measured minimum
    * 3/10 at the gate SF; random-candidate floor ≈ 1.2/10). Bucket bits
    * are occupancy-auto-sized from the corpus row count (parquet footer
    * stats, no count() job) — the q164 scaling fix applied to the ANN
    * path, so candidate volume stays flat as the corpus grows. */
  val q30 = GQuery("q30_ann_lsh_topk", (s, d) => {
    val e = t(s, d, "embeddings")
    val probes = e.where(col("vec_id") < 5)
      .select(col("vec_id").as("probe_id"), col("embedding").as("pv"))
    val ann = Similarity.lshTopK(e, probes, "vec_id", "embedding", "probe_id", "pv",
      k = 10, tables = 8, dim = 64)
    val exact = Similarity.bruteForceTopK(e, probes, "vec_id", "embedding", "probe_id", "pv", 10)
    Similarity.recallContract(ann, exact, "probe_id", "vec_id", k = 10, minHits = 2.0)
  }, Some(annContractSql))

  /** Q31 (similarity / IVF-ANN): recall contract of the inverted-file
    * approximate top-10 (nprobe=6 of 16 centroids). Floor 1.5/10 per probe
    * (measured minimum 2/10 at the gate SF; nprobe=4 cleared it there but
    * dipped below on the sf0.001 data draw — random-init centroids are
    * draw-sensitive, so the declared query probes 6 lists to hold the
    * floor across scale dirs while staying genuinely approximate). */
  val q31 = GQuery("q31_ann_ivf_topk", (s, d) => {
    val e = t(s, d, "embeddings")
    val probes = e.where(col("vec_id") < 5)
      .select(col("vec_id").as("probe_id"), col("embedding").as("pv"))
    val ann = Similarity.ivfTopK(e, probes, "vec_id", "embedding", "probe_id", "pv",
      k = 10, nCentroids = 16, nprobe = 6)
    val exact = Similarity.bruteForceTopK(e, probes, "vec_id", "embedding", "probe_id", "pv", 10)
    Similarity.recallContract(ann, exact, "probe_id", "vec_id", k = 10, minHits = 1.5)
  }, Some(annContractSql))

  /** Q32 (text analysis / language-ID): marker-word heuristic vs the stored
    * label, confusion counts. (The driver corpus is synthetic word-salad,
    * so the interesting property is determinism, not accuracy.) */
  val q32 = GQuery("q32_langid",
    (s, d) => t(s, d, "documents")
      .select(col("lang"), TextAnalysis.langId(col("text")).as("pred_lang"))
      .groupBy("lang", "pred_lang").agg(count(lit(1)).as("cnt"))
      .orderBy("lang", "pred_lang"),
    Some("""WITH t AS (SELECT lang, list_distinct(string_split_regex(lower(trim(text)), '\s+')) AS w
           |           FROM documents),
           |h AS (SELECT lang,
           |        len(list_intersect(w, ['the','a','and','of','to','is'])) AS h_en,
           |        len(list_intersect(w, ['der','die','das','und','ist','ein'])) AS h_de,
           |        len(list_intersect(w, ['el','la','de','que','y','es'])) AS h_es,
           |        len(list_intersect(w, ['le','la','les','et','est','une'])) AS h_fr,
           |        len(list_intersect(w, ['的','是','了','在','我','有'])) AS h_zh
           |      FROM t),
           |p AS (SELECT lang, CASE
           |        WHEN h_en = greatest(h_en,h_de,h_es,h_fr,h_zh) AND h_en > 0 THEN 'en'
           |        WHEN h_de = greatest(h_en,h_de,h_es,h_fr,h_zh) AND h_de > 0 THEN 'de'
           |        WHEN h_es = greatest(h_en,h_de,h_es,h_fr,h_zh) AND h_es > 0 THEN 'es'
           |        WHEN h_fr = greatest(h_en,h_de,h_es,h_fr,h_zh) AND h_fr > 0 THEN 'fr'
           |        WHEN h_zh = greatest(h_en,h_de,h_es,h_fr,h_zh) AND h_zh > 0 THEN 'zh'
           |        ELSE 'und' END AS pred_lang
           |      FROM h)
           |SELECT lang, pred_lang, count(*) AS cnt FROM p
           |GROUP BY lang, pred_lang ORDER BY lang, pred_lang""".stripMargin))

  /** Q33 (text analysis / quality scoring): per-doc features + composite
    * score — length, punctuation ratio, stopword ratio, mean token length. */
  val q33 = GQuery("q33_quality_score", (s, d) => {
    val docs = t(s, d, "documents")
    val feats = TextAnalysis.qualityFeatures(col("text"))
    docs.select(
        col("doc_id") +: feats.map { case (n, c) => c.as(n) } :+
          TextAnalysis.qualityScore(col("text")).as("quality"): _*)
      .orderBy("doc_id")
  },
    Some("""WITH f AS (
           |  SELECT doc_id,
           |    length(text) AS n_chars,
           |    len(string_split_regex(lower(trim(text)), '\s+')) AS n_tokens,
           |    length(text) - length(regexp_replace(text, '[.,;:!?''"()\[\]{}-]', '', 'g')) AS n_punct,
           |    len(list_filter(string_split_regex(lower(trim(text)), '\s+'),
           |        tok -> list_contains(['the','a','and','of','to','is'], tok))) AS n_stop,
           |    length(regexp_replace(lower(trim(text)), '\s+', '', 'g')) AS n_nonws
           |  FROM documents),
           |g AS (
           |  SELECT doc_id, n_chars, n_tokens,
           |    round(n_punct::DOUBLE / greatest(n_chars, 1), 6) AS punct_ratio,
           |    round(n_stop::DOUBLE / greatest(n_tokens, 1), 6) AS stop_ratio,
           |    round(n_nonws::DOUBLE / greatest(n_tokens, 1), 6) AS mean_tok_len
           |  FROM f)
           |SELECT doc_id, n_chars, n_tokens, punct_ratio, stop_ratio, mean_tok_len,
           |  round(greatest(least(least(n_chars::DOUBLE / 400.0, 1.0)
           |    - least(punct_ratio * 5.0, 1.0) * 0.5 + stop_ratio * 0.2, 1.0), 0.0), 6) AS quality
           |FROM g ORDER BY doc_id""".stripMargin))

  /** Q34 (text analysis / fingerprinting): min-md5-over-5-shingles document
    * fingerprint (portable 1-hash MinHash) + cluster sizes. */
  val q34 = GQuery("q34_fingerprint", (s, d) => {
    val fp = TextAnalysis.withFingerprint(
        t(s, d, "documents").select("doc_id", "text"), "text", 5, "fp")
      .select("doc_id", "fp")
    fp.groupBy("fp").agg(count(lit(1)).as("cluster_size"), min(col("doc_id")).as("min_doc_id"))
      .orderBy("min_doc_id")
  },
    Some("""WITH t AS (SELECT doc_id, text, string_split_regex(lower(trim(text)), '\s+') AS w
           |           FROM documents),
           |s AS (SELECT doc_id,
           |        CASE WHEN len(w) >= 5 THEN
           |          list_min(list_transform(
           |            list_distinct([w[i]||' '||w[i+1]||' '||w[i+2]||' '||w[i+3]||' '||w[i+4]
           |                           for i in range(1, len(w) - 3)]),
           |            x -> md5(x)))
           |        ELSE md5(lower(trim(text))) END AS fp
           |      FROM t)
           |SELECT fp, count(*) AS cluster_size, min(doc_id) AS min_doc_id
           |FROM s GROUP BY fp ORDER BY min_doc_id""".stripMargin))

  /** Q35 (text analysis / token counting): whitespace vs BPE-ish
    * pre-tokenizer counts per language. */
  val q35 = GQuery("q35_token_counting",
    (s, d) => t(s, d, "documents")
      .select(col("lang"),
        TextAnalysis.wsTokenCount(col("text")).as("ws_toks"),
        TextAnalysis.bpeishTokenCount(col("text")).as("bpe_toks"))
      .groupBy("lang")
      .agg(sum(col("ws_toks")).as("ws_total"), sum(col("bpe_toks")).as("bpe_total"),
        count(lit(1)).as("doc_cnt"))
      .orderBy("lang"),
    Some("""SELECT lang,
           |  CAST(SUM(len(string_split_regex(lower(trim(text)), '\s+'))) AS BIGINT) AS ws_total,
           |  CAST(SUM(len(regexp_extract_all(lower(text), '[a-z]+|[0-9]+|[^a-z0-9\s]'))) AS BIGINT) AS bpe_total,
           |  count(*) AS doc_cnt
           |FROM documents GROUP BY lang ORDER BY lang""".stripMargin))

  /** Q36 (multimodal / metadata): opaque-binary media table over the doc
    * corpus — digest + size without touching payload semantics. */
  val q36 = GQuery("q36_media_metadata",
    (s, d) => Multimodal.mediaMetadata(
        Multimodal.asMediaTable(t(s, d, "documents"), "doc_id", "text"))
      .orderBy("media_id"),
    Some("""SELECT doc_id AS media_id,
           |  CASE doc_id % 4 WHEN 0 THEN 'png' WHEN 1 THEN 'jpeg' WHEN 2 THEN 'wav' ELSE 'mp4' END AS format,
           |  CAST(octet_length(encode(text)) AS BIGINT) AS n_bytes,
           |  sha256(text) AS digest
           |FROM documents ORDER BY media_id""".stripMargin))

  /** Q37 (multimodal / frame sampling): every 2nd 32-byte chunk as a
    * "frame"; per-media frame counts (plumbing check, stub codec). */
  val q37 = GQuery("q37_frame_sample",
    (s, d) => Multimodal.sampleFrames(
        Multimodal.asMediaTable(t(s, d, "documents"), "doc_id", "text"),
        frameBytes = 32, stride = 2)
      .groupBy("media_id").agg(count(lit(1)).as("n_frames"))
      .orderBy("media_id"),
    Some("""SELECT doc_id AS media_id,
           |  greatest(CAST(octet_length(encode(text)) AS BIGINT) // 32 - 1, 0) // 2 + 1 AS n_frames
           |FROM documents ORDER BY media_id""".stripMargin))

  /** Q38 (BI / raw chart): ChartCompiler lowering of a Superset raw-mode
    * form_data (all_columns + order + row_limit, init_db.py:151-154). */
  val q38 = GQuery("q38_chart_compiler_raw",
    (s, _) => ChartCompiler.compile(s,
      ChartSpec(datasource = "events", queryMode = "raw",
        allColumns = Seq("id", "ts", "event_type", "amount"),
        orderBy = Seq(("id", true)), rowLimit = 50),
      _ => Seed.events(s)),
    Some(SeedSql.withDemo(
      "SELECT id, ts, event_type, amount FROM demo_events ORDER BY id LIMIT 50")))

  /** Q39 (BI / aggregate chart): agg-mode form_data — groupby + metrics +
    * time range + order-by-metric-desc (init_db.py:145-153). */
  val q39 = GQuery("q39_chart_compiler_agg",
    (s, _) => ChartCompiler.compile(s,
      ChartSpec(datasource = "events", queryMode = "aggregate",
        groupby = Seq("event_type"),
        metrics = Seq(Metric("count", None, "cnt"),
          Metric("min", Some("amount"), "min_amount"),
          Metric("max", Some("amount"), "max_amount")),
        timeColumn = Some("ts"),
        timeRange = Some(("2025-12-10 00:00:00", "2026-01-01 00:00:00")),
        orderBy = Seq(("cnt", false), ("event_type", true)), rowLimit = 100),
      _ => Seed.events(s)),
    Some(SeedSql.withDemo(
      """SELECT event_type, count(*) AS cnt, min(amount) AS min_amount, max(amount) AS max_amount
        |FROM demo_events
        |WHERE ts >= TIMESTAMP '2025-12-10 00:00:00' AND ts < TIMESTAMP '2026-01-01 00:00:00'
        |GROUP BY event_type ORDER BY cnt DESC, event_type LIMIT 100""".stripMargin)))

  /** Q42 (BI / time-grain + percent metrics): agg-mode form_data with
    * `time_grain_sqla` bucketing (date_trunc dimension, Superset's
    * `__timestamp` alias) and a percent-of-total metric twin
    * (init_db.py:145-153 fields `time_grain_sqla`, `percent_metrics`). */
  val q42 = GQuery("q42_chart_timegrain",
    (s, _) => ChartCompiler.compile(s,
      ChartSpec(datasource = "events", queryMode = "aggregate",
        metrics = Seq(Metric("count", None, "cnt")),
        percentMetrics = Seq(Metric("count", None, "cnt")),
        timeColumn = Some("ts"), timeGrain = Some("day"),
        orderBy = Seq(("__timestamp", true)), rowLimit = 100),
      _ => Seed.events(s))
      .withColumn("pct_cnt", round(col("pct_cnt"), 6)),
    Some(SeedSql.withDemo(
      """SELECT date_trunc('day', ts) AS __timestamp, count(*) AS cnt,
        |  round(count(*) / sum(count(*)) OVER (), 6) AS pct_cnt
        |FROM demo_events GROUP BY 1 ORDER BY __timestamp LIMIT 100""".stripMargin)))

  /** Q43 (pipeline / deterministic splits): 80/10/10 train/val/test
    * assignment as a pure function of doc_id (portable md5-prefix mode, so
    * the oracle reproduces the exact assignment; thresholds
    * 0.8→'cccccccc', 0.9→'e6666666' — lowercase-hex string order IS
    * numeric order). */
  val q43 = GQuery("q43_train_val_test",
    (s, d) => Splits.assign(t(s, d, "documents"), "doc_id",
        Seq(("train", 8), ("val", 1), ("test", 1)), portable = true)
      .groupBy("split").agg(count(lit(1)).as("cnt"))
      .orderBy("split"),
    Some("""WITH s AS (SELECT CASE
           |    WHEN substr(md5(CAST(doc_id AS VARCHAR)), 1, 8) < 'cccccccc' THEN 'train'
           |    WHEN substr(md5(CAST(doc_id AS VARCHAR)), 1, 8) < 'e6666666' THEN 'val'
           |    ELSE 'test' END AS split
           |  FROM documents)
           |SELECT split, count(*) AS cnt FROM s GROUP BY split ORDER BY split""".stripMargin))

  /** Q44 (streaming/state twin): gap-based sessionization of the events
    * table — the batch ground truth of Sessionize.stream
    * (flatMapGroupsWithState). 6-hour gap over the driver event cadence. */
  val q44 = GQuery("q44_sessionize",
    (s, d) => graft.streaming.Sessionize.batch(
        t(s, d, "events").select("user_id", "ts"), gapMinutes = 360)
      .select(col("user_id"), col("session_start"), col("session_end"), col("n_events"))
      .orderBy("user_id", "session_start"),
    Some("""WITH e AS (SELECT user_id, CAST(ts AS TIMESTAMP) AS ts FROM events),
           |g AS (SELECT user_id, ts,
           |    CASE WHEN lag(ts) OVER w IS NULL
           |         OR epoch_us(ts) - epoch_us(lag(ts) OVER w) > 21600000000 THEN 1
           |         ELSE 0 END AS new_s
           |  FROM e WINDOW w AS (PARTITION BY user_id ORDER BY ts)),
           |s AS (SELECT user_id, ts,
           |    SUM(new_s) OVER (PARTITION BY user_id ORDER BY ts
           |                     ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS sid
           |  FROM g)
           |SELECT user_id, min(ts) AS session_start, max(ts) AS session_end,
           |  count(*) AS n_events
           |FROM s GROUP BY user_id, sid ORDER BY user_id, session_start""".stripMargin))

  /** Q47 (text analysis / normalization): canonical ingest normalization —
    * control-strip → NFC (native expression) → whitespace collapse → trim;
    * emitted as per-doc normalized length + an unchanged flag so the oracle
    * verifies the exact transform, not just counts. */
  val q47 = GQuery("q47_normalize_text",
    (s, d) => t(s, d, "documents")
      .select(col("doc_id"),
        length(TextAnalysis.normalizeText(col("text"))).as("norm_len"),
        (TextAnalysis.normalizeText(col("text")) === col("text")).as("unchanged"))
      .orderBy("doc_id"),
    Some("""SELECT doc_id,
           |  length(trim(regexp_replace(nfc_normalize(regexp_replace(text, '[\x00-\x1f]', ' ', 'g')), '\s+', ' ', 'g'))) AS norm_len,
           |  trim(regexp_replace(nfc_normalize(regexp_replace(text, '[\x00-\x1f]', ' ', 'g')), '\s+', ' ', 'g')) = text AS unchanged
           |FROM documents ORDER BY doc_id""".stripMargin))

  val all: Seq[GQuery] = Seq(q26, q27, q28, q29, q30, q31, q32, q33, q34,
    q35, q36, q37, q38, q39, q42, q43, q44, q47)
}
