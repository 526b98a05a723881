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

  /** Q174 (D11, exact substring dedup): the Lee-et-al sliding-window
    * span remover ([[graft.ext.Dedup.substringDedup]]) — every token
    * covered by a repeated 8-gram whose first corpus occurrence is
    * elsewhere is cut, documents are rebuilt in place, and the rebuilt
    * text is verified by md5 so the oracle checks every byte of every
    * rewritten document. Complements q171: segment dedup tiles (stride =
    * window, boundary-straddling dupes survive), this slides (stride 1,
    * maximal duplicated spans are removed wherever they sit). */
  val q174 = GQuery("q174_substring_dedup", (s, d) =>
    graft.ext.Dedup.substringDedup(t(s, d, "documents"), "doc_id", "text", 8)
      .select(col("doc_id"), md5(col("text")).as("text_md5"),
        col("kept_tokens"), col("total_tokens"))
      .orderBy("doc_id"),
    Some("""WITH t AS (SELECT doc_id,
           |    string_split_regex(lower(trim(text)), '\s+') AS w
           |  FROM documents WHERE text IS NOT NULL),
           |wins AS (SELECT doc_id, g.pos AS pos,
           |    md5(array_to_string(list_slice(w, g.pos + 1, g.pos + 8), ' ')) AS h
           |  FROM t, LATERAL (SELECT unnest(generate_series(0, len(w) - 8)) AS pos) g
           |  WHERE len(w) >= 8),
           |dups AS (SELECT doc_id, pos FROM wins
           |  QUALIFY row_number() OVER (PARTITION BY h ORDER BY doc_id, pos) > 1),
           |toks AS (SELECT doc_id, i.i AS i, w[i.i + 1] AS tok
           |  FROM t, LATERAL (SELECT unnest(generate_series(0, len(w) - 1)) AS i) i),
           |kept AS (SELECT tk.doc_id, tk.i, tk.tok FROM toks tk
           |  WHERE NOT EXISTS (SELECT 1 FROM dups d
           |    WHERE d.doc_id = tk.doc_id AND tk.i BETWEEN d.pos AND d.pos + 7)),
           |re AS (SELECT doc_id, string_agg(tok, ' ' ORDER BY i) AS text2,
           |    count(*) AS kept FROM kept GROUP BY doc_id)
           |SELECT t.doc_id, md5(coalesce(re.text2, '')) AS text_md5,
           |  CAST(coalesce(re.kept, 0) AS BIGINT) AS kept_tokens,
           |  CAST(len(t.w) AS BIGINT) AS total_tokens
           |FROM t LEFT JOIN re ON t.doc_id = re.doc_id
           |ORDER BY t.doc_id""".stripMargin))

  /** Q175 (N8, product-quantization ANN): the compressed-domain tier —
    * per-subspace codebooks trained with joint Lloyd rounds
    * ([[graft.ext.Pq.train]]), the corpus stored as m=8 small ints
    * (32× fewer candidate-scan bytes than float at dim 64), probes
    * scored with ADC lookup tables, float re-rank of the shortlist.
    * Gated by the q30-family recall contract against the float
    * brute-force top-10; the lossless-alphabet exactness and code-range
    * invariants are spec-pinned (PqSpec). The index is built once per
    * (session, table dir) via [[graft.ext.Pq.cached]] — bench rep 1 pays
    * the train+encode, reps 2+ measure pure ADC search (the q78_search
    * placement discipline). */
  val q175 = GQuery("q175_ann_pq_adc", (s, d) => {
    val e = t(s, d, "embeddings")
    val probes = probesOf(e)
    val idx = graft.ext.Pq.cached(s.sparkContext.applicationId + ":" + d) {
      graft.ext.Pq.build(e, "vec_id", "embedding",
        m = 8, ksub = 16, iters = 2, dim = 64)
    }
    val ann = graft.ext.Pq.search(idx, e, probes, "vec_id", "embedding",
      "probe_id", "pv", k = 10)
    val exact = Similarity.bruteForceTopK(e, probes, "vec_id", "embedding",
      "probe_id", "pv", 10)
    Similarity.recallContract(ann, exact, "probe_id", "vec_id", k = 10,
      minHits = 2.0)
  }, Some(PipelineQueries.annContractSql))

  /** Q176 (L16′, Iceberg-metadata round-trip scan): a table is written,
    * MOR-deleted and MOR-upserted through [[graft.engine.Layout]], its
    * state exported as Iceberg v2 metadata, and then read back through
    * [[graft.engine.IcebergMeta.open]] — version-hint → metadata.json →
    * Avro manifest list → Avro manifests → parquet, with the v2
    * positional- and equality-delete semantics replayed from the spec
    * fields alone (no graft JSON consulted). The oracle recomputes the
    * expected post-delete post-upsert state from the raw table, so the
    * gate proves the exported metadata carries the FULL table state —
    * the interop claim, executed. */
  val q176 = GQuery("q176_iceberg_roundtrip", (s, d) => {
    import graft.engine.{IcebergMeta, Layout}
    val run = java.util.UUID.randomUUID().toString.replace("-", "").take(8)
    val table = s"iceq_$run"
    t(s, d, "documents").select(col("doc_id"), col("lang"), col("n_chars"))
      .repartition(4)
      .write.saveAsTable(table)
    Layout.snapshot(s, table, "t0")
    Layout.deleteWhereMor(s, table, col("doc_id") % 5 === 0)
    val updates = t(s, d, "documents")
      .select(col("doc_id"), col("lang"), col("n_chars"))
      .where(col("doc_id") < 40)
      .withColumn("n_chars", col("n_chars") + 1000000L)
    Layout.upsertMor(s, table, updates, "doc_id")
    IcebergMeta.emit(s, table)
    IcebergMeta.open(s, table)
      .groupBy(col("lang"))
      .agg(count(lit(1)).as("n_docs"), sum(col("n_chars")).as("sum_chars"))
      .orderBy("lang")
  },
    Some("""WITH cur AS (
           |  SELECT doc_id, lang, n_chars + 1000000 AS n_chars
           |  FROM documents WHERE doc_id < 40
           |  UNION ALL
           |  SELECT doc_id, lang, n_chars FROM documents
           |  WHERE doc_id % 5 <> 0 AND doc_id >= 40)
           |SELECT lang, count(*) AS n_docs,
           |  CAST(sum(n_chars) AS BIGINT) AS sum_chars
           |FROM cur GROUP BY lang ORDER BY lang""".stripMargin))

  /** Q177 (N2″, prebuilt-signature LSH search): the q30 family's missing
    * amortization — the round-6 sf1 checkpoint measured q30's in-query
    * signature scan as the dominant LINEAR term (exponent 0.98) once
    * auto-bits flattened the candidate stage. [[graft.ext.LshIndex]]
    * makes signatures index state: hashed once per (session, dir), a
    * search touches probe signatures + bucket-mates only. Same
    * hyperplanes, buckets, and exact re-rank as q30, so the recall
    * contract carries over; LshIndexSpec pins search ≡ lshTopK exactly. */
  val q177 = GQuery("q177_ann_lsh_prebuilt", (s, d) => {
    import graft.ext.LshIndex
    val e = t(s, d, "embeddings")
    val probes = probesOf(e)
    val idx = LshIndex.cached(s.sparkContext.applicationId + ":" + d) {
      LshIndex.build(e, "vec_id", "embedding", tables = 8, dim = 64)
    }
    val ann = LshIndex.search(idx, e, probes, "vec_id", "embedding",
      "probe_id", "pv", k = 10)
    val exact = Similarity.bruteForceTopK(e, probes, "vec_id", "embedding",
      "probe_id", "pv", 10)
    Similarity.recallContract(ann, exact, "probe_id", "vec_id", k = 10,
      minHits = 2.0)
  }, Some(PipelineQueries.annContractSql))

  /** Q178 (N9, IVF-PQ / IVFADC): the composition production ANN runs at
    * 10⁹ vectors (FAISS IndexIVFPQ): prebuilt IVF lists restrict
    * candidates to nprobe inverted lists, prebuilt PQ codes score the
    * survivors in the compressed domain (m LUT lookups each), float
    * touches only the re-rank shortlist. Neither stage is corpus-sized
    * at query time ([[graft.ext.Pq.searchIvfAdc]]). Same recall-contract
    * gate; the widened nprobe/rerank knobs buy back the compounded
    * approximation (IVF candidate loss × ADC ranking noise). */
  val q178 = GQuery("q178_ann_ivf_pq", (s, d) => {
    import graft.ext.{IvfIndex, Pq}
    val e = t(s, d, "embeddings")
    val probes = probesOf(e)
    val ivf = IvfIndex.cached(s.sparkContext.applicationId + ":" + d) {
      IvfIndex.buildTrained(e, "vec_id", "embedding",
        nCentroids = 8, lloydIters = 2)
    }
    val pq = Pq.cached(s.sparkContext.applicationId + ":" + d) {
      Pq.build(e, "vec_id", "embedding", m = 8, ksub = 16, iters = 2, dim = 64)
    }
    val ann = Pq.searchIvfAdc(ivf, pq, e, probes, "vec_id", "embedding",
      "probe_id", "pv", k = 10, nprobe = 4, rerankFactor = 8)
    val exact = Similarity.bruteForceTopK(e, probes, "vec_id", "embedding",
      "probe_id", "pv", 10)
    Similarity.recallContract(ann, exact, "probe_id", "vec_id", k = 10,
      minHits = 2.0)
  }, Some(PipelineQueries.annContractSql))

  /** Q179 (D12, SemDeDup): semantic dedup by k-means clustering +
    * within-cluster τ-similar removal (Abbas et al. 2023,
    * arXiv:2303.09540 — [[graft.ext.SemDedup]]). k scales as N/256
    * (constant expected cluster size, so the per-cluster quadratic
    * factor never grows), N from parquet footer stats — no count() job.
    * The gate is the q30-family contract shape, recomputed in-plan from
    * the verdict + embeddings alone: per cluster, no τ-similar kept
    * pair survives and every dropped point has an earlier τ-similar
    * same-cluster witness; the oracle states the same k constant-true
    * rows (k recomputed by DuckDB from the same count/256 formula). */
  val q179 = GQuery("q179_semdedup", (s, d) => {
    import graft.ext.SemDedup
    val e = t(s, d, "embeddings")
    // k capped at 2^16: past that the centroid broadcast itself becomes
    // the bottleneck (k·dim doubles) — the paper's regime (fixed k ≈ 11k
    // at 1.3B embeddings) accepts growing cluster sizes instead
    val k = semdedupK(e)
    val verdict = SemDedup.dedup(e, "vec_id", "embedding",
      k = k, lloydIters = 2, tau = 0.4)
    SemDedup.contract(verdict, e, "vec_id", "embedding", k = k, tau = 0.4)
  },
    Some("""SELECT CAST(row_number() OVER (ORDER BY vec_id) - 1 AS BIGINT) AS cluster_id,
           |  true AS kept_ok, true AS dropped_ok
           |FROM embeddings
           |QUALIFY cluster_id < (SELECT least(65536, greatest(8, CAST(floor(count(*)/256) AS BIGINT))) FROM embeddings)
           |ORDER BY cluster_id""".stripMargin))

  /** The q179 family's shared k formula: N/256 (constant expected
    * cluster size) from footer stats, capped at 2^16 (centroid
    * broadcast bound). */
  private def semdedupK(e: DataFrame): Int =
    math.min(65536L, math.max(8L, graft.engine.TableStats.rowCountNoJob(e) / 256)).toInt

  /** Q179_BUILD (k-means clustering build, priced alone): the SemDeDup
    * fit+assign state built eagerly ([[graft.ext.SemDedup.cluster]]
    * materializes the corpus pass), round-tripped through
    * [[graft.ext.IndexStore]] `kind=kmeans` so this entry also exercises
    * the durable path, and summarized by invariants the oracle can
    * recompute from the corpus alone: k from the same N/256 formula,
    * every vector on exactly one cluster. The q78_build precedent —
    * the round-6 verdict's bench-placement critique of q179 ("What's
    * wrong #2") closed the same way. */
  val q179b = GQuery("q179_build", (s, d) => {
    import graft.ext.{IndexStore, SemDedup}
    val e = t(s, d, "embeddings")
    val k = semdedupK(e)
    val c = SemDedup.cluster(e, "vec_id", "embedding", k = k, lloydIters = 2)
    val dir = sys.props("java.io.tmpdir") +
      s"/graft_idx/kmeans_${Registry.pathKey(d)}"
    IndexStore.writeKmeans(c, dir)
    SemDedup.drop(c)
    val loaded = IndexStore.loadKmeans(s, dir)
    val nAssigned = loaded.assignment.count()
    import s.implicits._
    Seq((k.toLong, nAssigned)).toDF("k", "n_assigned")
  },
    Some("""SELECT (SELECT least(65536, greatest(8, CAST(floor(count(*)/256) AS BIGINT)))
           |        FROM embeddings) AS k,
           |  CAST(count(*) AS BIGINT) AS n_assigned FROM embeddings""".stripMargin))

  /** Q179_SEARCH (SemDeDup against a PREBUILT clustering): the k-means
    * state is built once per (session, table dir) via
    * [[graft.ext.SemDedup.cached]] and reused — bench rep 1 pays the
    * fit, reps 2+ measure the cluster-local pair stage alone, which is
    * the steady state of a pipeline that refreshes its clustering far
    * less often than it dedups increments. Same contract and oracle as
    * q179 (identical clustering discipline, so the invariants carry). */
  val q179s = GQuery("q179_search", (s, d) => {
    import graft.ext.SemDedup
    val e = t(s, d, "embeddings")
    val k = semdedupK(e)
    val c = SemDedup.cached(s.sparkContext.applicationId + ":" + d) {
      SemDedup.cluster(e, "vec_id", "embedding", k = k, lloydIters = 2)
    }
    val verdict = SemDedup.dedupClustered(e, "embedding", c, tau = 0.4)
    SemDedup.contract(verdict, e, "vec_id", "embedding", k = k, tau = 0.4)
  },
    Some("""SELECT CAST(row_number() OVER (ORDER BY vec_id) - 1 AS BIGINT) AS cluster_id,
           |  true AS kept_ok, true AS dropped_ok
           |FROM embeddings
           |QUALIFY cluster_id < (SELECT least(65536, greatest(8, CAST(floor(count(*)/256) AS BIGINT))) FROM embeddings)
           |ORDER BY cluster_id""".stripMargin))

  /** Q180 (T13, Gopher rule battery): the heuristic quality filter of
    * Rae et al. 2021 §A1.1 as one map-only staged projection —
    * [[graft.ext.TextQuality.gopherFilter]]. Word-count bounds are
    * scaled to the synthetic corpus (paper: [50, 100k]) so the gate SF
    * exercises both keep and drop; every other threshold is the
    * paper's. Fully SQL-expressible, so the oracle recomputes every
    * feature, rule boolean, and the keep conjunction. */
  val q180 = GQuery("q180_gopher_rules", (s, d) =>
    graft.ext.TextQuality.gopherFilter(
      t(s, d, "documents"), "doc_id", "text").orderBy("doc_id"),
    Some("""WITH t AS (SELECT doc_id, text,
           |    string_split_regex(lower(trim(text)), '\s+') AS w,
           |    string_split(text, chr(10)) AS ln
           |  FROM documents),
           |f AS (SELECT doc_id,
           |    CAST(len(w) AS BIGINT) AS word_count,
           |    length(regexp_replace(lower(trim(text)), '\s+', '', 'g'))::DOUBLE
           |      / greatest(len(w), 1) AS mean_word_len_raw,
           |    ((length(text) - length(replace(text, '#', '')))
           |      + (length(text) - length(replace(text, '...', ''))) / 3)::DOUBLE
           |      / greatest(len(w), 1) AS symbol_ratio_raw,
           |    len(list_filter(ln, l -> regexp_matches(trim(l), '^[-•*]')))::DOUBLE
           |      / greatest(len(ln), 1) AS bullet_frac_raw,
           |    len(list_filter(ln, l -> regexp_matches(l, '\.\.\.$')))::DOUBLE
           |      / greatest(len(ln), 1) AS ell_frac_raw,
           |    len(list_filter(w, tk -> regexp_matches(tk, '[a-z]')))::DOUBLE
           |      / greatest(len(w), 1) AS alpha_frac_raw,
           |    CAST(len(list_filter(w, tk ->
           |      list_contains(['the','a','and','of','to','is'], tk))) AS BIGINT)
           |      AS stop_word_count
           |  FROM t)
           |SELECT doc_id, word_count,
           |  round(mean_word_len_raw, 6) AS mean_word_len,
           |  round(symbol_ratio_raw, 6) AS symbol_ratio,
           |  round(bullet_frac_raw, 6) AS bullet_line_frac,
           |  round(ell_frac_raw, 6) AS ellipsis_line_frac,
           |  round(alpha_frac_raw, 6) AS alpha_word_frac,
           |  stop_word_count,
           |  (word_count BETWEEN 20 AND 90) AS r_words,
           |  (mean_word_len_raw BETWEEN 3.0 AND 10.0) AS r_mean_len,
           |  (symbol_ratio_raw < 0.1) AS r_symbols,
           |  (bullet_frac_raw < 0.9) AS r_bullets,
           |  (ell_frac_raw < 0.3) AS r_ellipsis,
           |  (alpha_frac_raw > 0.8) AS r_alpha,
           |  (stop_word_count >= 2) AS r_stops,
           |  ((word_count BETWEEN 20 AND 90) AND (mean_word_len_raw BETWEEN 3.0 AND 10.0)
           |    AND (symbol_ratio_raw < 0.1) AND (bullet_frac_raw < 0.9)
           |    AND (ell_frac_raw < 0.3) AND (alpha_frac_raw > 0.8)
           |    AND (stop_word_count >= 2)) AS keep
           |FROM f ORDER BY doc_id""".stripMargin))

  /** Q181 (T14, CCNet perplexity buckets): add-α bigram-LM scoring of
    * every document plus head/middle/tail terciles (Wenzek et al. 2020)
    * — [[graft.ext.TextQuality.perplexityBuckets]]. Log-probs are
    * rounded per-row then DECIMAL-summed (order-independent), and the
    * tercile is the closed form ⌊rank·3/n⌋ over a sharded prefix-sum
    * rank — no global single-task window; the oracle states the same
    * closed form over row_number(). */
  val q181 = GQuery("q181_perplexity_buckets", (s, d) =>
    graft.ext.TextQuality.perplexityBuckets(
      t(s, d, "documents"), "doc_id", "text").orderBy("doc_id"),
    Some("""WITH bg AS (
           |  SELECT doc_id, bg.a AS a, bg.b AS b FROM (
           |    SELECT doc_id, unnest([struct_pack(a := w[i], b := w[i+1])
           |                           for i in range(1, len(w))]) AS bg
           |    FROM (SELECT doc_id, string_split_regex(lower(trim(text)), '\s+') AS w
           |          FROM documents)
           |    WHERE len(w) >= 2)),
           |c AS (SELECT a, b, count(*) AS ab_cnt FROM bg GROUP BY a, b),
           |ac AS (SELECT a, count(*) AS a_cnt FROM bg GROUP BY a),
           |v AS (SELECT count(DISTINCT tok) AS v FROM (
           |  SELECT a AS tok FROM bg UNION ALL SELECT b FROM bg)),
           |lp AS (SELECT bg.doc_id,
           |    CAST(round(ln((c.ab_cnt + 0.5) / (ac.a_cnt + 0.5 * v.v)), 6)
           |      AS DECIMAL(24,6)) AS lp
           |  FROM bg JOIN c USING (a, b) JOIN ac USING (a) CROSS JOIN v),
           |pd AS (SELECT doc_id, count(*) AS n_bigrams,
           |    round(exp(-(sum(lp)::DOUBLE) / count(*)), 4) AS ppl
           |  FROM lp GROUP BY doc_id),
           |rk AS (SELECT doc_id, n_bigrams, ppl,
           |    row_number() OVER (ORDER BY ppl, doc_id) - 1 AS rnk,
           |    count(*) OVER () AS n
           |  FROM pd)
           |SELECT doc_id, n_bigrams, ppl,
           |  CASE floor(rnk * 3 / n) WHEN 0 THEN 'head' WHEN 1 THEN 'middle'
           |    ELSE 'tail' END AS bucket
           |FROM rk ORDER BY doc_id""".stripMargin))

  /** Q182 (D13, bloom-filter decontamination): the zero-shuffle
    * contamination pre-filter — the benchmark set's distinct 5-shingle
    * hashes go into ONE bloom filter (Spark's `BloomFilterAggregate`,
    * 16 MB cap), and the corpus streams through a map-only
    * `might_contain` probe; no corpus-side join or shuffle at all
    * ([[graft.ext.Decontaminate.bloomContaminationFlags]]). One-sided
    * error in the safe direction: no false negatives, so `no_missed`
    * must hold by construction; `fp_bounded` caps over-dropping at 5%.
    * Test set = every 50th document; exact contaminated set recomputed
    * in-plan on shingle STRINGS (hash-independent) for the gate. */
  val q182 = GQuery("q182_bloom_decontaminate", (s, d) => {
    val docs = t(s, d, "documents")
    val test = docs.filter(col("doc_id") % 50 === 0)
    graft.ext.Decontaminate.bloomContract(docs, test, "doc_id", "text",
      shingleK = 5, fpBound = 0.05)
  },
    Some("""WITH t AS (SELECT doc_id,
           |    string_split_regex(lower(trim(text)), '\s+') AS w
           |  FROM documents),
           |sh AS (SELECT doc_id,
           |    unnest(list_distinct([w[i]||' '||w[i+1]||' '||w[i+2]||' '||w[i+3]||' '||w[i+4]
           |                          for i in range(1, len(w) - 3)])) AS sh
           |  FROM t WHERE len(w) >= 5),
           |test AS (SELECT DISTINCT sh FROM sh WHERE doc_id % 50 = 0),
           |cont AS (SELECT count(DISTINCT s.doc_id) AS n_contaminated
           |         FROM sh s JOIN test USING (sh)),
           |nc AS (SELECT count(*) AS n_corpus FROM t WHERE len(w) >= 5)
           |SELECT nc.n_corpus, cont.n_contaminated,
           |  true AS no_missed, true AS fp_bounded
           |FROM nc, cont""".stripMargin))

  /** Q183 (A20, KMV corpus-overlap sketch): bottom-k distinct-hash
    * Jaccard between two corpus halves ([[graft.ext.Kmv]], Beyer et al.
    * 2007) — the pre-dedup overlap estimate. The estimate rides the
    * sketch (k = 256 rows of state, one slim distinct shuffle); the
    * exact twin is computed in-plan for the contract only, so `est_ok`
    * is the single sketch-dependent column and the oracle restates the
    * exact Jaccard plus `true` (the q129/q138 approximate-op
    * discipline). Tolerance 0.12 ≈ 4 standard errors at k=256.
    * 64-bit shingle-hash collisions are accepted (≲10⁻⁷ at sf0.1). */
  val q183 = GQuery("q183_kmv_overlap", (s, d) => {
    val docs = t(s, d, "documents")
      .withColumn("grp", when(length(col("source")) === 4, "a").otherwise("b"))
    graft.ext.Kmv.jaccardContract(docs, "grp", "text", grpA = "a",
      shingleK = 3, k = 256, tol = 0.12, grpB = "b")
  },
    Some("""WITH t AS (SELECT
           |    CASE WHEN length(source) = 4 THEN 'a' ELSE 'b' END AS grp,
           |    string_split_regex(lower(trim(text)), '\s+') AS w
           |  FROM documents),
           |s AS (SELECT DISTINCT grp,
           |    unnest(list_distinct([w[i]||' '||w[i+1]||' '||w[i+2]
           |                          for i in range(1, len(w) - 1)])) AS sh
           |  FROM t WHERE len(w) >= 3),
           |m AS (SELECT sh,
           |    max(CASE WHEN grp = 'a' THEN 1 ELSE 0 END) AS in_a,
           |    max(CASE WHEN grp = 'b' THEN 1 ELSE 0 END) AS in_b
           |  FROM s GROUP BY sh)
           |SELECT CAST(256 AS BIGINT) AS k,
           |  round(sum(in_a * in_b)::DOUBLE
           |    / sum(CASE WHEN in_a + in_b > 0 THEN 1 ELSE 0 END), 6) AS exact_jaccard,
           |  true AS est_ok
           |FROM m""".stripMargin))

  /** Q184 (P7, temperature-scaled source mixing): the GPT-3/PaLM data-mix
    * schedule — share of source s ∝ n_s^0.7, targets apportioned to a
    * fixed total by largest remainder (exactly Σ=200 when every source is
    * big enough), each source keeping its target smallest md5-draw docs
    * ([[graft.ext.Splits.temperatureMix]]). Fully deterministic (portable
    * md5 draw, shares rounded to 6 before ranking), so the oracle
    * reproduces the exact selected set. Per-source ranks ride the sharded
    * prefix-sum scan, not a one-task-per-source window. */
  val q184 = GQuery("q184_temperature_mix", (s, d) =>
    graft.ext.Splits.temperatureMix(
      t(s, d, "documents"), "source", "doc_id",
      total = 200L, tau = 0.7, shards = 8)
      .orderBy("source", "doc_id"),
    Some("""WITH c AS (SELECT source, count(*) AS n FROM documents GROUP BY source),
           |p AS (SELECT source, n,
           |    pow(n, 0.7) / sum(pow(n, 0.7)) OVER () AS p FROM c),
           |x AS (SELECT source, round(p * 200, 6) AS x FROM p),
           |t AS (SELECT source, floor(x) AS base,
           |    round(x - floor(x), 6) AS rem FROM x),
           |r AS (SELECT source, base,
           |    row_number() OVER (ORDER BY rem DESC, source) AS rr,
           |    200 - sum(base) OVER () AS short FROM t),
           |tt AS (SELECT source,
           |    CAST(base + CASE WHEN rr <= short THEN 1 ELSE 0 END AS BIGINT)
           |      AS target FROM r),
           |rk AS (SELECT source, doc_id,
           |    row_number() OVER (PARTITION BY source
           |      ORDER BY substr(md5(CAST(doc_id AS VARCHAR)), 1, 8), doc_id) - 1
           |      AS rnk
           |  FROM documents)
           |SELECT rk.source, rk.doc_id FROM rk JOIN tt USING (source)
           |WHERE rnk < target ORDER BY source, doc_id""".stripMargin))

  val all: Seq[GQuery] = Seq(q78b, q78s, q172, q173, q174, q175, q176, q177,
    q178, q179, q179b, q179s, q180, q181, q182, q183, q184)
}
