package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.Tables
import graft.ext.{Chunker, CorpusStats, Dedup, TextAnalysis}

/** Declared queries Q103–Q110: corpus-preparation operators a training-data
  * pipeline runs between raw ingest and packing — chunking, per-source
  * caps, cross-doc boilerplate, incremental dedup, vocabulary + OOV,
  * deterministic negative sampling, length profiling. All oracle-checked
  * against DuckDB over the same parquet.
  */
object CorpusQueries {

  private def t(s: SparkSession, d: String, n: String): DataFrame = Tables.load(s, d, n)

  private val tokensSql = "string_split_regex(lower(trim(text)), '\\s+')"

  /** Q103 (chunking): 64-token windows, stride 48, per document — the
    * RAG/context-window preparation op. Chunk content is verified by md5
    * so the oracle checks the actual text of every chunk, not just its
    * coordinates. Narrow plan: tokenize → explode start grid → slice;
    * zero shuffles before the (display-only) sort. */
  val q103 = GQuery("q103_chunk_overlap", (s, d) => {
    Chunker.chunk(t(s, d, "documents"), "doc_id", "text", 64, 48)
      .select(col("doc_id"), col("chunk_start"), col("n_tokens"),
        md5(col("chunk_text")).as("chunk_md5"))
      .orderBy("doc_id", "chunk_start")
  },
    Some(s"""WITH t AS (SELECT doc_id, $tokensSql AS w FROM documents),
            |s AS (SELECT doc_id, w, len(w) AS n FROM t),
            |c AS (SELECT doc_id, g.start AS chunk_start,
            |             least(64, n - g.start) AS n_tokens, w
            |      FROM s, LATERAL (SELECT unnest(generate_series(0, n - 1, 48)) AS start) g
            |      WHERE g.start = 0 OR least(64, n - g.start) > 16)
            |SELECT doc_id, CAST(chunk_start AS BIGINT) AS chunk_start,
            |       CAST(n_tokens AS BIGINT) AS n_tokens,
            |       md5(array_to_string(list_slice(w, chunk_start + 1, chunk_start + n_tokens), ' ')) AS chunk_md5
            |FROM c ORDER BY doc_id, chunk_start""".stripMargin))

  /** Q104 (per-source caps): keep the 10 highest-quality docs per source
    * (the per-domain cap every web-scale corpus applies so no domain
    * dominates), then summarize the kept set. Quality ordering is the
    * round-6 quality score — identical expression both engines — with
    * doc_id as total tie-break; the kept sums aggregate in DECIMAL so
    * the per-source average is summation-order-independent. The window is
    * partitioned by source (never global). */
  val q104 = GQuery("q104_source_caps", (s, d) => {
    val q = round(TextAnalysis.qualityScore(col("text")), 6)
    val w = Window.partitionBy(col("source"))
      .orderBy(col("__q").desc, col("doc_id"))
    t(s, d, "documents")
      .withColumn("__q", q)
      .withColumn("__rn", row_number().over(w))
      .filter(col("__rn") <= 10)
      .groupBy(col("source"))
      .agg(
        count(lit(1)).as("n_kept"),
        round(sum(col("__q").cast("decimal(10,6)")).cast("double")
          / count(lit(1)), 6).as("avg_quality"),
        min(col("doc_id")).as("min_doc_id"))
      .orderBy("source")
  },
    Some("""WITH f AS (
           |  SELECT doc_id, source,
           |    length(text) AS n_chars,
           |    len(string_split_regex(lower(trim(text)), '\s+')) AS n_tokens,
           |    length(text) - length(regexp_replace(text, '[.,;:!?''"()\[\]{}-]', '', 'g')) AS n_punct,
           |    len(list_filter(string_split_regex(lower(trim(text)), '\s+'),
           |        tok -> list_contains(['the','a','and','of','to','is'], tok))) AS n_stop
           |  FROM documents),
           |g AS (
           |  SELECT doc_id, source,
           |    round(greatest(least(least(n_chars::DOUBLE / 400.0, 1.0)
           |      - least(round(n_punct::DOUBLE / greatest(n_chars, 1), 6) * 5.0, 1.0) * 0.5
           |      + round(n_stop::DOUBLE / greatest(n_tokens, 1), 6) * 0.2, 1.0), 0.0), 6) AS q
           |  FROM f),
           |r AS (
           |  SELECT *, row_number() OVER (PARTITION BY source
           |                               ORDER BY q DESC, doc_id) AS rn
           |  FROM g)
           |SELECT source, count(*) AS n_kept,
           |  round(CAST(sum(CAST(q AS DECIMAL(10,6))) AS DOUBLE) / count(*), 6) AS avg_quality,
           |  min(doc_id) AS min_doc_id
           |FROM r WHERE rn <= 10
           |GROUP BY source ORDER BY source""".stripMargin))

  /** Q105 (cross-doc boilerplate): per-document share of distinct 5-grams
    * occurring in ≥3 documents corpus-wide — the CCNet-style boilerplate
    * signal. Inverted-index shape: explode → df count → join back. */
  val q105 = GQuery("q105_boilerplate", (s, d) => {
    CorpusStats.boilerplateFraction(t(s, d, "documents"), "doc_id", "text",
        k = 5, minDocs = 3)
      .orderBy("doc_id")
  },
    Some(s"""WITH t AS (SELECT doc_id, $tokensSql AS w FROM documents),
            |sh AS (SELECT doc_id,
            |         unnest(list_distinct([w[i]||' '||w[i+1]||' '||w[i+2]||' '||w[i+3]||' '||w[i+4]
            |                               for i in range(1, len(w) - 3)])) AS shingle
            |       FROM t WHERE len(w) >= 5),
            |df AS (SELECT shingle, count(*) AS ndocs FROM sh GROUP BY shingle)
            |SELECT sh.doc_id, count(*) AS n_shingles,
            |  CAST(sum(CASE WHEN df.ndocs >= 3 THEN 1 ELSE 0 END) AS BIGINT) AS n_boiler,
            |  round(sum(CASE WHEN df.ndocs >= 3 THEN 1 ELSE 0 END)::DOUBLE / count(*), 6) AS boiler_frac
            |FROM sh JOIN df USING (shingle)
            |GROUP BY sh.doc_id ORDER BY sh.doc_id""".stripMargin))

  /** Q106 (incremental dedup): docs with doc_id % 5 = 0 arrive as the
    * incoming batch against the rest as the curated corpus; a batch row
    * is new iff its exact content key is unseen AND it is the batch's
    * min-id holder of that key. Per-language ingest summary. */
  val q106 = GQuery("q106_incremental_dedup", (s, d) => {
    val docs = t(s, d, "documents")
    val incoming = docs.filter(pmod(col("doc_id"), lit(5)) === 0)
    val seen = docs.filter(pmod(col("doc_id"), lit(5)) =!= 0)
    Dedup.incrementalNew(incoming, seen, "doc_id", "text")
      .groupBy(col("lang"))
      .agg(count(lit(1)).as("n_incoming"),
        sum(when(col("is_new"), 1L).otherwise(0L)).as("n_new"))
      .orderBy("lang")
  },
    Some("""WITH seen AS (
           |  SELECT DISTINCT md5(text) AS key FROM documents WHERE doc_id % 5 <> 0),
           |inc AS (
           |  SELECT doc_id, lang, md5(text) AS key,
           |         row_number() OVER (PARTITION BY md5(text) ORDER BY doc_id) AS rn
           |  FROM documents WHERE doc_id % 5 = 0)
           |SELECT lang, count(*) AS n_incoming,
           |  CAST(sum(CASE WHEN seen.key IS NULL AND rn = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_new
           |FROM inc LEFT JOIN seen USING (key)
           |GROUP BY lang ORDER BY lang""".stripMargin))

  /** Q107 (vocabulary build): top-500 tokens by corpus frequency with
    * contiguous 1-based ids in (count desc, token asc) order. The id
    * window runs on the already-cut 500 rows (bounded by construction),
    * never on the corpus. */
  val q107 = GQuery("q107_vocab_build", (s, d) => {
    CorpusStats.buildVocab(t(s, d, "documents"), "text", 500)
      .select("token_id", "token", "cnt")
      .orderBy("token_id")
  },
    Some(s"""WITH c AS (
            |  SELECT t.token, count(*) AS cnt
            |  FROM (SELECT unnest($tokensSql) AS token FROM documents) t
            |  GROUP BY t.token),
            |r AS (SELECT token, cnt,
            |        row_number() OVER (ORDER BY cnt DESC, token) AS token_id
            |      FROM c)
            |SELECT token_id, token, cnt FROM r
            |WHERE token_id <= 500 ORDER BY token_id""".stripMargin))

  /** Q108 (OOV rate): per-language out-of-vocabulary token share against
    * a top-20 vocabulary (cut below the corpus's distinct-token count so
    * the rate is non-degenerate). The vocabulary broadcasts; one explode,
    * one broadcast join, one agg. */
  val q108 = GQuery("q108_oov_rate", (s, d) => {
    val docs = t(s, d, "documents")
    CorpusStats.oovRate(docs, "lang", "text",
        CorpusStats.buildVocab(docs, "text", 20))
      .orderBy("lang")
  },
    Some(s"""WITH c AS (
            |  SELECT t.token, count(*) AS cnt
            |  FROM (SELECT unnest($tokensSql) AS token FROM documents) t
            |  GROUP BY t.token),
            |v AS (SELECT token FROM c ORDER BY cnt DESC, token LIMIT 20),
            |tok AS (SELECT lang, unnest($tokensSql) AS token FROM documents)
            |SELECT lang, count(*) AS n_tokens,
            |  CAST(sum(CASE WHEN v.token IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_oov,
            |  round(sum(CASE WHEN v.token IS NULL THEN 1 ELSE 0 END)::DOUBLE / count(*), 6) AS oov_rate
            |FROM tok LEFT JOIN v USING (token)
            |GROUP BY lang ORDER BY lang""".stripMargin))

  /** Q109 (negative sampling): for each probe doc (doc_id % 50 = 0), the
    * 5 pseudo-random negatives drawn by md5(probe:candidate) order from
    * other sources — the deterministic contrastive-pair draw (same salt →
    * same training set on every run and every cluster size). Probes
    * broadcast against one corpus scan; per-probe top-5 via a
    * probe-partitioned window. */
  val q109 = GQuery("q109_negative_sampling", (s, d) => {
    val docs = t(s, d, "documents").select(
      col("doc_id"), col("source"))
    val probes = docs.filter(pmod(col("doc_id"), lit(50)) === 0)
      .select(col("doc_id").as("probe_id"), col("source").as("probe_source"))
    val w = Window.partitionBy(col("probe_id")).orderBy(col("draw"))
    docs.crossJoin(broadcast(probes))
      .filter(col("source") =!= col("probe_source"))
      .withColumn("draw",
        md5(concat(col("probe_id").cast("string"), lit(":"), col("doc_id").cast("string"))))
      .withColumn("rnk", row_number().over(w))
      .filter(col("rnk") <= 5)
      .select(col("probe_id"), col("doc_id").as("neg_id"), col("rnk"))
      .orderBy("probe_id", "rnk")
  },
    Some("""WITH probes AS (
           |  SELECT doc_id AS probe_id, source AS probe_source
           |  FROM documents WHERE doc_id % 50 = 0),
           |cand AS (
           |  SELECT probe_id, doc_id AS neg_id,
           |         md5(CAST(probe_id AS VARCHAR) || ':' || CAST(doc_id AS VARCHAR)) AS draw
           |  FROM documents, probes WHERE source <> probe_source),
           |r AS (SELECT probe_id, neg_id,
           |        row_number() OVER (PARTITION BY probe_id ORDER BY draw) AS rnk
           |      FROM cand)
           |SELECT probe_id, neg_id, CAST(rnk AS INT) AS rnk FROM r
           |WHERE rnk <= 5 ORDER BY probe_id, rnk""".stripMargin))

  /** Q110 (length profile): log2-bucketed document-length histogram per
    * language — the distribution snapshot a mix designer reads before
    * setting packing and truncation lengths. floor(log2(n+1)) is exact
    * IEEE on integer inputs, so bucket edges agree across engines. */
  val q110 = GQuery("q110_length_histogram", (s, d) => {
    t(s, d, "documents")
      .withColumn("bucket", floor(log2(col("n_chars") + 1)).cast("long"))
      .groupBy(col("lang"), col("bucket"))
      .agg(count(lit(1)).as("n_docs"),
        min(col("n_chars")).as("min_chars"),
        max(col("n_chars")).as("max_chars"))
      .orderBy("lang", "bucket")
  },
    Some("""SELECT lang, CAST(floor(log2(n_chars + 1)) AS BIGINT) AS bucket,
           |  count(*) AS n_docs, min(n_chars) AS min_chars, max(n_chars) AS max_chars
           |FROM documents
           |GROUP BY lang, bucket ORDER BY lang, bucket""".stripMargin))

  /** Q115 (training order): seeded pseudo-random permutation + round-robin
    * shard assignment — the global shuffle a training run feeds its data
    * loaders, as a pure deterministic plan (`Splits.trainingOrder`). Rank
    * runs per shard AFTER the split, so no global sort ranks the corpus
    * through one task. */
  val q115 = GQuery("q115_training_order", (s, d) => {
    graft.ext.Splits.trainingOrder(
        t(s, d, "documents").select("doc_id"), "doc_id", nShards = 8, seed = 7)
      .select(col("shard"), col("pos_in_shard"), col("doc_id"))
      .orderBy("shard", "pos_in_shard")
  },
    Some("""WITH d AS (
           |  SELECT doc_id, md5('7:' || CAST(doc_id AS VARCHAR)) AS draw FROM documents),
           |s AS (
           |  SELECT doc_id, draw,
           |         CAST(('0x' || substring(draw, 9, 4))::BIGINT % 8 AS INT) AS shard
           |  FROM d)
           |SELECT shard,
           |  CAST(row_number() OVER (PARTITION BY shard ORDER BY draw, doc_id) - 1 AS INT) AS pos_in_shard,
           |  doc_id
           |FROM s ORDER BY shard, pos_in_shard""".stripMargin))

  /** Q116 (real-codec round-trip through the oracle): synthesize a genuine
    * solid-color PNG per doc id (JDK ImageIO encode), decode it back with
    * the REAL image decoder, and emit the decoded dimensions + mean luma.
    * Because the synthetic image is a pure function of the id, DuckDB
    * verifies the whole encode→decode path arithmetically, with no codec
    * of its own — the strongest check a codec can get from a SQL oracle.
    * Luma is a 3-decimal rational, so round-4 sits far from any round-half
    * boundary. */
  val q116 = GQuery("q116_image_roundtrip", (s, d) => {
    import graft.ext.Multimodal
    val ids = t(s, d, "documents").select("doc_id").filter(col("doc_id") < 100)
    val media = Multimodal.synthesizeImages(s, ids, "doc_id")
    Multimodal.decodeImages(s, media).toDF()
      .filter(col("decode_ok"))
      .select(col("media_id"), col("width"), col("height"),
        round(col("mean_luma"), 4).as("mean_luma"))
      .orderBy("media_id")
  },
    Some("""SELECT doc_id AS media_id,
           |  CAST(8 + doc_id % 8 AS INT) AS width,
           |  CAST(8 + (doc_id // 8) % 8 AS INT) AS height,
           |  round(0.299 * ((doc_id * 37) % 256)
           |      + 0.587 * ((doc_id * 59) % 256)
           |      + 0.114 * ((doc_id * 83) % 256), 4) AS mean_luma
           |FROM documents WHERE doc_id < 100 ORDER BY media_id""".stripMargin))

  /** Q122 (BI / series_limit): timeseries chart keeping only the top-3
    * event-type series by total count — Superset's series_limit lowering:
    * a bounded ranking aggregate over the grouped result + broadcast semi
    * join, never a window over the full series set. */
  val q122 = GQuery("q122_chart_series_limit", (s, d) => {
    import graft.bi.{ChartCompiler, ChartSpec, Metric}
    ChartCompiler.compile(s,
      ChartSpec(datasource = "events", queryMode = "aggregate",
        groupby = Seq("event_type"),
        metrics = Seq(Metric("count", None, "cnt")),
        timeColumn = Some("ts"), timeGrain = Some("day"),
        seriesLimit = Some(3),
        orderBy = Seq(("__timestamp", true), ("event_type", true)),
        rowLimit = 1000),
      name => t(s, d, name))
  },
    Some("""WITH daily AS (
           |  SELECT date_trunc('day', CAST(ts AS TIMESTAMP)) AS __timestamp,
           |         event_type, count(*) AS cnt
           |  FROM events GROUP BY 1, 2),
           |top3 AS (
           |  SELECT event_type FROM daily
           |  GROUP BY event_type
           |  ORDER BY sum(cnt) DESC, event_type LIMIT 3)
           |SELECT __timestamp, event_type, cnt
           |FROM daily WHERE event_type IN (SELECT event_type FROM top3)
           |ORDER BY __timestamp, event_type LIMIT 1000""".stripMargin))

  /** Shared ordered-bigram pair stream: one tokenizer pass, positional
    * zip via an index transform, explode_outer (never plain explode — the
    * inferred size>0 filter re-runs the tokenizer at the scan, the q105
    * trap). */
  private def bigrams(s: SparkSession, d: String): DataFrame = {
    val docs = t(s, d, "documents").select("text")
    docs.withColumn("__toks", graft.ext.TextPrep.tokens(col("text")))
      .withColumn("__n", size(col("__toks")))
      .withColumn("bg",
        explode_outer(when(col("__n") >= 2,
          transform(sequence(lit(1), col("__n") - 1),
            i => struct(element_at(col("__toks"), i).as("a"),
              element_at(col("__toks"), i + 1).as("b"))))))
      .filter(col("bg").isNotNull)
      .select(col("bg.a").as("a"), col("bg.b").as("b"))
  }

  private val bigramsSql =
    """SELECT bg.a, bg.b FROM (
      |  SELECT unnest([struct_pack(a := w[i], b := w[i+1])
      |                 for i in range(1, len(w))]) AS bg
      |  FROM (SELECT string_split_regex(lower(trim(text)), '\s+') AS w
      |        FROM documents)
      |  WHERE len(w) >= 2)""".stripMargin

  /** Q123 (bigram LM stats): the top-3 continuations of each token with
    * conditional probabilities — the n-gram language-model estimation
    * pass (tokenizer/bigram statistics a corpus team ships with every
    * release). One explode, one (a,b) count with map-side combine, an
    * a-keyed window for both the per-token total and the top-3 cut. */
  val q123 = GQuery("q123_bigram_lm", (s, d) => {
    val counts = bigrams(s, d).groupBy("a", "b").agg(count(lit(1)).as("cnt"))
    val wTot = Window.partitionBy(col("a"))
    val wRank = Window.partitionBy(col("a")).orderBy(col("cnt").desc, col("b"))
    counts
      .withColumn("a_total", sum(col("cnt")).over(wTot))
      .withColumn("rnk", row_number().over(wRank))
      .filter(col("rnk") <= 3)
      .select(col("a"), col("rnk"), col("b"), col("cnt"),
        round(col("cnt").cast("double") / col("a_total"), 6).as("cond_p"))
      .orderBy("a", "rnk")
  },
    Some(s"""WITH bg AS ($bigramsSql),
            |c AS (SELECT a, b, count(*) AS cnt FROM bg GROUP BY a, b),
            |r AS (SELECT a, b, cnt,
            |        sum(cnt) OVER (PARTITION BY a) AS a_total,
            |        row_number() OVER (PARTITION BY a ORDER BY cnt DESC, b) AS rnk
            |      FROM c)
            |SELECT a, CAST(rnk AS INT) AS rnk, b, cnt,
            |       round(cnt::DOUBLE / a_total, 6) AS cond_p
            |FROM r WHERE rnk <= 3 ORDER BY a, rnk""".stripMargin))

  /** Q124 (PMI collocations): pointwise mutual information of bigrams —
    * ln(N·c(a,b) / (c(a,·)·c(·,b))) — the classic collocation detector.
    * Marginals and the N scalar broadcast back onto the bigram counts;
    * log of identical IEEE doubles is identical, so round-6 is safe. */
  val q124 = GQuery("q124_pmi_collocations", (s, d) => {
    val bg = bigrams(s, d)
    val counts = bg.groupBy("a", "b").agg(count(lit(1)).as("cnt"))
    val aCounts = bg.groupBy("a").agg(count(lit(1)).as("a_cnt"))
    val bCounts = bg.groupBy("b").agg(count(lit(1)).as("b_cnt"))
    val total = bg.agg(count(lit(1)).as("n_total"))
    counts
      .join(broadcast(aCounts), "a")
      .join(broadcast(bCounts), "b")
      .crossJoin(broadcast(total))
      .filter(col("cnt") >= 5)
      .withColumn("pmi",
        round(log(col("cnt").cast("double") * col("n_total")
          / (col("a_cnt").cast("double") * col("b_cnt"))), 6))
      .select("a", "b", "cnt", "pmi")
      .orderBy(col("pmi").desc, col("a"), col("b"))
      .limit(20)
  },
    Some(s"""WITH bg AS ($bigramsSql),
            |c AS (SELECT a, b, count(*) AS cnt FROM bg GROUP BY a, b),
            |ac AS (SELECT a, count(*) AS a_cnt FROM bg GROUP BY a),
            |bc AS (SELECT b, count(*) AS b_cnt FROM bg GROUP BY b),
            |n AS (SELECT count(*) AS n_total FROM bg)
            |SELECT a, b, cnt,
            |  round(ln(cnt::DOUBLE * n_total / (a_cnt::DOUBLE * b_cnt)), 6) AS pmi
            |FROM c JOIN ac USING (a) JOIN bc USING (b), n
            |WHERE cnt >= 5
            |ORDER BY pmi DESC, a, b LIMIT 20""".stripMargin))

  /** Q125 (Zipf fit): rank-frequency regression slope over the token
    * distribution — the corpus-health diagnostic (natural text ≈ -1;
    * synthetic word salad is flatter). The rank window runs over the
    * vocabulary (bounded), never the token stream; the fit is a
    * partial-aggregable regr_slope. */
  val q125 = GQuery("q125_zipf_fit", (s, d) => {
    val counts = t(s, d, "documents")
      .select(explode(graft.ext.TextPrep.tokens(col("text"))).as("token"))
      .groupBy("token").agg(count(lit(1)).as("cnt"))
    val ranked = counts.withColumn("rank",
      row_number().over(Window.orderBy(col("cnt").desc, col("token"))))
    ranked.agg(
      count(lit(1)).as("vocab_size"),
      round(expr("regr_slope(ln(cnt), ln(rank))"), 6).as("zipf_slope"),
      round(expr("regr_r2(ln(cnt), ln(rank))"), 6).as("fit_r2"))
  },
    Some("""WITH c AS (
           |  SELECT t.token, count(*) AS cnt
           |  FROM (SELECT unnest(string_split_regex(lower(trim(text)), '\s+')) AS token
           |        FROM documents) t
           |  GROUP BY t.token),
           |r AS (SELECT cnt,
           |        row_number() OVER (ORDER BY cnt DESC, token) AS rank
           |      FROM c)
           |SELECT count(*) AS vocab_size,
           |  round(regr_slope(ln(cnt), ln(rank)), 6) AS zipf_slope,
           |  round(regr_r2(ln(cnt), ln(rank)), 6) AS fit_r2
           |FROM r""".stripMargin))

  val all: Seq[GQuery] = Seq(q103, q104, q105, q106, q107, q108, q109, q110,
    q115, q116, q122, q123, q124, q125)
}
