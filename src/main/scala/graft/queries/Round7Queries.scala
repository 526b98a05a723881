package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables
import graft.ext.UnigramLm

/** Round-7 declared queries: the unigram-LM (SentencePiece) tokenizer
  * family — the major subword family missing next to BPE (q168/q173).
  */
object Round7Queries {

  private def t(s: SparkSession, d: String, n: String): DataFrame = Tables.load(s, d, n)

  /** Q185 (T15, unigram-LM training): hard-EM over the Zipf-bounded
    * word table ([[graft.ext.UnigramLm]], Kudo 2018) on a deterministic
    * document slice. EM argmax + prune is not SQL-expressible, so this
    * is a DECLARED rows-only gate (the q164/q168 class); the
    * vocabulary's correctness contract lives in UnigramLmSpec, which
    * pins piece-for-piece equality against an independent single-node
    * reference. Output: (rank, piece, log_prob) — deterministic, so the
    * rows-only check still hash-stabilizes across runs. */
  val q185 = GQuery("q185_unigram_train", (s, d) => {
    import s.implicits._
    val docs = t(s, d, "documents").select(col("doc_id"), col("text"))
    UnigramLm.train(docs.filter(col("doc_id") < 200), "text",
      vocabSize = 64, maxPieceLen = 5, seedSize = 256, emIters = 1)
      .map(p => (p.rank, p.piece, BigDecimal(p.logProb)
        .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble))
      .toDF("rank", "piece", "log_prob")
      .orderBy("rank")
  }, None)

  /** Q186 (T15′, unigram Viterbi encoder through the gate): train on
    * the q185 slice, segment the WHOLE corpus with
    * [[UnigramLm.segmentPartitioned]] (broadcast vocab + per-partition
    * DP — constant plan size at any vocabulary), and gate the
    * invariants DuckDB can recompute: byte-exact round-trip (piece
    * concatenation rebuilds the whitespace-stripped text — the Viterbi
    * cover guarantee) and corpus-level compression vs raw characters
    * (multi-piece wins must actually apply). The q173 shape. */
  val q186 = GQuery("q186_unigram_encode", (s, d) => {
    val docs = t(s, d, "documents").select(col("doc_id"), col("text"))
    val vocab = UnigramLm.train(docs.filter(col("doc_id") < 200), "text",
      vocabSize = 64, maxPieceLen = 5, seedSize = 256, emIters = 1)
    UnigramLm.segmentPartitioned(docs, "text", vocab, maxPieceLen = 5)
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

  /** Q187 (N11, bucket-pruned search over a STORED LSH index): the full
    * durable serving path — build once, persist through
    * [[graft.ext.IndexStore]], reload, and search with the probe buckets
    * PUSHED INTO the parquet scan ([[graft.ext.LshIndex.searchPruned]]):
    * the stored table is clustered+sorted by (table_id, bucket), so
    * row-group stats skip everything outside the probed buckets and the
    * scan reads O(selected buckets), not O(N) — the remaining linear
    * term of the steady-state searches in BASELINE §sf10. Memoized per
    * (session, dir): rep 1 pays build+write+load, reps 2+ price the
    * pruned steady state. Same recall contract as the q30 family. */
  val q187 = GQuery("q187_ann_lsh_pruned", (s, d) => {
    import graft.ext.{IndexStore, LshIndex, Similarity}
    val e = t(s, d, "embeddings")
    val probes = e.where(col("vec_id") < 5)
      .select(col("vec_id").as("probe_id"), col("embedding").as("pv"))
    val idx = LshIndex.cached(s.sparkContext.applicationId + ":pruned:" + d) {
      val built = LshIndex.build(e, "vec_id", "embedding", tables = 8, dim = 64)
      val dir = sys.props("java.io.tmpdir") +
        s"/graft_idx/lsh_${math.abs(d.hashCode)}"
      IndexStore.writeLsh(built, dir)
      LshIndex.drop(built)
      IndexStore.loadLsh(s, dir)
    }
    val ann = LshIndex.searchPruned(idx, e, probes,
      "vec_id", "embedding", "probe_id", "pv", k = 10)
    val exact = Similarity.bruteForceTopK(e, probes, "vec_id", "embedding",
      "probe_id", "pv", 10)
    Similarity.recallContract(ann, exact, "probe_id", "vec_id", k = 10,
      minHits = 2.0)
  }, Some(PipelineQueries.annContractSql))

  /** Q188 (T16, WordPiece training): likelihood-scored merges
    * ([[graft.ext.WordPiece]], Schuster & Nakajima 2012 — the BERT
    * tokenizer) on the q185 document slice. The iterative argmax is not
    * SQL-expressible → DECLARED rows-only (the q168 class); WordPieceSpec
    * pins merge-for-merge equality vs an independent reference. Output:
    * (rank, left, right, n, score) — deterministic. */
  val q188 = GQuery("q188_wordpiece_train", (s, d) => {
    import graft.ext.WordPiece
    import s.implicits._
    val docs = t(s, d, "documents").select(col("doc_id"), col("text"))
    WordPiece.train(docs.filter(col("doc_id") < 200), "text",
      numMerges = 16, minPairCount = 2)
      .map(m => (m.rank, m.left, m.right, m.count, BigDecimal(m.score)
        .setScale(9, BigDecimal.RoundingMode.HALF_UP).toDouble))
      .toDF("rank", "left", "right", "n", "score")
      .orderBy("rank")
  }, None)

  /** Q189 (T16′, WordPiece greedy encoder through the gate): merges from
    * the slice, ALPHABET from the full corpus (character coverage is a
    * cheap full pass — so no [UNK] can fire and every word round-trips),
    * greedy longest-match encode of the whole corpus. Oracle gates the
    * q173/q186 invariants: strip-`##` concatenation rebuilds the
    * whitespace-stripped text byte-exactly, and the corpus compresses. */
  val q189 = GQuery("q189_wordpiece_encode", (s, d) => {
    import graft.ext.WordPiece
    val docs = t(s, d, "documents").select(col("doc_id"), col("text"))
    val merges = WordPiece.train(docs.filter(col("doc_id") < 200), "text",
      numMerges = 16, minPairCount = 2)
    val pieces = WordPiece.vocab(docs, "text", merges)
    WordPiece.encodeGreedy(docs, "text", pieces)
      .select(col("doc_id"), col("n_tokens"),
        (concat_ws("", transform(col("tokens"),
          tk => regexp_replace(tk, "^##", ""))) ===
          regexp_replace(col("text"), "\\s+", "")).as("ok"),
        length(regexp_replace(col("text"), "\\s+", "")).as("n_chars"))
      .agg(count(lit(1)).as("n_docs"),
        sum(when(col("ok"), 0L).otherwise(1L)).as("n_roundtrip_fail"),
        (sum(col("n_tokens")) < sum(col("n_chars"))).as("compressed"))
  },
    Some("""SELECT CAST(count(*) AS BIGINT) AS n_docs,
           |  CAST(0 AS BIGINT) AS n_roundtrip_fail,
           |  true AS compressed FROM documents""".stripMargin))

  /** Q190 (D14, incremental near-dup against an indexed corpus): the
    * production crawl-dedup shape — the corpus (doc_id < 400) is indexed
    * ONCE ([[graft.ext.MinHashIndex]], memoized per session/dir: bench
    * rep 1 pays it, reps 2+ price the steady state), and only the new
    * increment (doc_id ≥ 400) is sketched per probe; candidates verify
    * by exact Jaccard against the index's stored shingle sets. Oracle:
    * exhaustive corpus×increment all-pairs Jaccard in DuckDB (the q26
    * discipline — LSH miss probability at j ≥ 0.8 is ≈5e-8, and the
    * emitted pairs are exact-verified, so the sets hash-match). */
  val q190 = GQuery("q190_incremental_neardup", (s, d) => {
    import graft.ext.MinHashIndex
    val docs = t(s, d, "documents").select(col("doc_id"), col("text"))
    val idx = MinHashIndex.cached(s.sparkContext.applicationId + ":" + d) {
      MinHashIndex.build(docs.filter(col("doc_id") < 400), "doc_id", "text")
    }
    MinHashIndex.probe(idx, docs.filter(col("doc_id") >= 400),
        "doc_id", "text", threshold = 0.8)
      .orderBy("id_a", "id_b")
  },
    Some(s"""WITH ${PipelineQueries.duckShingles3},
            |p AS (SELECT a.doc_id AS id_a, b.doc_id AS id_b,
            |        round(len(list_intersect(a.sh, b.sh))::DOUBLE
            |              / len(list_distinct(list_concat(a.sh, b.sh))), 6) AS jaccard
            |      FROM s a JOIN s b ON a.doc_id < 400 AND b.doc_id >= 400)
            |SELECT id_a, id_b, jaccard FROM p WHERE jaccard >= 0.8
            |ORDER BY id_a, id_b""".stripMargin))

  /** Q191 (R2, BM25 against a stored inverted index): the serving form
    * of q55 — postings built once per (session, dir) via
    * [[graft.ext.InvertedIndex.cached]] (rep 1 pays the build, reps 2+
    * price the steady state: a term-pruned postings read + a
    * vocabulary-row broadcast, independent of corpus size for fixed
    * terms), scoring expression-for-expression the q55 BM25, so the q55
    * oracle carries over verbatim. */
  val q191 = GQuery("q191_bm25_indexed", (s, d) => {
    import graft.ext.InvertedIndex
    val docs = t(s, d, "documents").select(col("doc_id"), col("text"))
    val idx = InvertedIndex.cached(s.sparkContext.applicationId + ":" + d) {
      InvertedIndex.build(docs, "doc_id", "text")
    }
    InvertedIndex.bm25(idx, Seq("spark", "window", "hash"), topK = 20)
  },
    Some("""WITH t AS (SELECT doc_id, string_split_regex(lower(trim(text)), '\s+') AS w
           |           FROM documents),
           |d AS (SELECT doc_id, len(w) AS dl FROM t),
           |c AS (SELECT count(*) AS n_docs, avg(dl) AS avgdl FROM d),
           |p AS (SELECT doc_id, tok AS term, count(*) AS tf
           |      FROM t, unnest(w) AS u(tok)
           |      WHERE tok IN ('spark', 'window', 'hash') GROUP BY doc_id, tok),
           |f AS (SELECT term, count(*) AS df FROM p GROUP BY term),
           |sc AS (SELECT p.doc_id,
           |         ln((c.n_docs - f.df + 0.5) / (f.df + 0.5) + 1)
           |           * (p.tf * 2.2)
           |           / (p.tf + 1.2 * (1 - 0.75 + 0.75 * d.dl / c.avgdl)) AS s
           |       FROM p JOIN f USING (term) JOIN d USING (doc_id) CROSS JOIN c)
           |SELECT doc_id, round(sum(s), 6) AS bm25 FROM sc GROUP BY doc_id
           |ORDER BY bm25 DESC, doc_id LIMIT 20""".stripMargin))

  /** Q192 (T17, DSIR importance resampling): select the k raw documents
    * whose hashed-n-gram distribution best matches a target slice
    * ([[graft.ext.Dsir]], Xie et al. 2023). Target = the `lang='en'`
    * slice standing in for the paper's "wiki-like" target corpus; the
    * hash-match against DuckDB validates every stage — md5 bucket
    * hashing, the two smoothed multinomials, the decimal per-doc
    * log-weight sums, and the deterministic Gumbel top-k — end to end. */
  val q192 = GQuery("q192_dsir_select", (s, d) => {
    import graft.ext.Dsir
    val docs = t(s, d, "documents").select(col("doc_id"), col("lang"), col("text"))
    Dsir.select(docs, col("lang") === "en", "doc_id", "text",
      k = 100, buckets = 10000, alpha = 1.0)
  },
    Some("""WITH w AS (SELECT doc_id, lang = 'en' AS is_t,
           |                  string_split_regex(lower(trim(text)), '\s+') AS ws
           |           FROM documents),
           |ng AS (SELECT doc_id, is_t, tok AS ng FROM w, unnest(ws) AS u(tok)
           |       UNION ALL
           |       SELECT doc_id, is_t, ws[i] || ' ' || ws[i+1] AS ng
           |       FROM w, unnest(range(1, len(ws))) AS r(i)),
           |b AS (SELECT doc_id, is_t,
           |             ('0x' || substring(md5(ng), 1, 8))::BIGINT % 10000 AS bkt
           |      FROM ng),
           |pb AS (SELECT bkt, count(*) AS rc,
           |              sum(CASE WHEN is_t THEN 1 ELSE 0 END) AS tc
           |       FROM b GROUP BY bkt),
           |tot AS (SELECT sum(rc) AS rn, sum(tc) AS tn FROM pb),
           |lw AS (SELECT bkt,
           |         round(ln((tc + 1.0) / (tn + 1.0 * 10000))
           |             - ln((rc + 1.0) / (rn + 1.0 * 10000)), 6)::DECIMAL(24,6) AS lr
           |       FROM pb CROSS JOIN tot),
           |doc AS (SELECT b.doc_id, sum(lw.lr) AS logw
           |        FROM b JOIN lw USING (bkt) GROUP BY b.doc_id),
           |g AS (SELECT doc_id, logw,
           |        logw + round(-ln(-ln((('0x' || substring(md5('dsir:' || doc_id::VARCHAR), 1, 8))::BIGINT + 0.5)
           |                             / 4294967296.0)), 6)::DECIMAL(24,6) AS gkey
           |      FROM doc)
           |SELECT doc_id, round(logw::DOUBLE, 6) AS logw,
           |       round(gkey::DOUBLE, 6) AS gkey
           |FROM g ORDER BY gkey DESC, doc_id LIMIT 100""".stripMargin))

  /** Q193 (T18, fastText-style quality classifier): distill the Gopher
    * rule battery (q180) into a trained linear scorer
    * ([[graft.ext.QualityClassifier]], Joulin et al. 2016) — weak labels
    * from `gopherFilter.keep`, full-batch logistic regression over
    * hashed n-gram features PLUS the two saturated length ramps at the
    * Gopher band cutoffs (20/90 — the gate corpus's label signal is
    * length-dominated, and normalized bag-of-n-grams is length-blind by
    * construction), then score the corpus and emit the top-50 by
    * probability. Iterative GD is not SQL-expressible, so this is a
    * DECLARED rows-only gate (the q164/q168/q185/q188 class); the
    * training procedure's correctness contract lives in
    * QualityClassifierSpec (weight-for-weight equality vs an independent
    * single-node reference + a separable-corpus accuracy floor).
    * Training is memoized per (session, dir) — the q191 lifecycle
    * split — so bench reps 2+ price steady-state scoring. Output is
    * deterministic (full-batch GD + decimal sums), so the rows-only
    * check still hash-stabilizes across runs. */
  val q193 = GQuery("q193_quality_classifier", (s, d) => {
    import graft.ext.{QualityClassifier, TextQuality}
    val docs = t(s, d, "documents").select(col("doc_id"), col("text"))
    val labels = TextQuality.gopherFilter(docs, "doc_id", "text")
      .select(col("doc_id"), col("keep"))
    val model = QualityClassifier.cached(s.sparkContext.applicationId + ":" + d) {
      QualityClassifier.train(docs.join(labels, Seq("doc_id")), "keep",
        "doc_id", "text", buckets = 1024, iters = 100, lr = 0.5,
        statRamps = Seq(20.0, -90.0), adagrad = true)
    }
    val scored = QualityClassifier.score(model, docs, "doc_id", "text")
      .join(labels.withColumnRenamed("keep", "label"), Seq("doc_id"))
    // Transparency columns: threshold agreement vs the weak label and the
    // all-true base rate ride along on every row, so the gate artifact
    // itself shows the distillation beat predicting the majority class
    // (0.84 vs 0.67 at sf0.01 — a linear probe cannot express the rule
    // CONJUNCTION exactly, so sub-1.0 agreement is the honest ceiling).
    val agg = scored.agg(
      round(avg(when((col("prob") >= 0.5) === col("label"), 1.0)
        .otherwise(0.0)), 4).as("agreement"),
      round(avg(when(col("label"), 1.0).otherwise(0.0)), 4).as("base_rate"))
    scored.crossJoin(broadcast(agg))
      .orderBy(col("prob").desc, col("doc_id"))
      .limit(50)
  }, None)

  /** Q194 (T17′, incremental DSIR scoring against a STORED model): the
    * serving form of q192 — the crawl-selection steady state scores each
    * new increment against a model fit ONCE on the existing corpus
    * (doc_id < 400 here), persisted through [[graft.ext.IndexStore]]
    * (kind=dsir) and reloaded across JVMs; only the increment
    * (doc_id ≥ 400) is ever n-gram-hashed. Buckets the model corpus
    * never produced take the closed-form smoothing default (rc = tc = 0
    * log-ratio) — the oracle recomputes model, default, and scores from
    * the same slices, so the hash-match covers the left-join + coalesce
    * path too. Memoized per (session, dir): rep 1 pays fit+store+load,
    * reps 2+ price steady-state scoring (the q190/q191 discipline). */
  val q194 = GQuery("q194_dsir_stored", (s, d) => {
    import graft.ext.{Dsir, IndexStore}
    val docs = t(s, d, "documents").select(col("doc_id"), col("lang"), col("text"))
    val model = Dsir.cachedModel(s.sparkContext.applicationId + ":" + d) {
      val m = Dsir.fit(docs.filter(col("doc_id") < 400),
        col("lang") === "en", "doc_id", "text", buckets = 10000, alpha = 1.0)
      val dir = sys.props("java.io.tmpdir") +
        s"/graft_idx/dsir_${math.abs(d.hashCode)}"
      IndexStore.writeDsir(m, dir)
      IndexStore.loadDsir(s, dir)
    }
    Dsir.scoreWith(model, docs.filter(col("doc_id") >= 400), "doc_id", "text")
      .select(col("doc_id"), col("n_ngrams"),
        round(col("__logw").cast("double"), 6).as("logw"))
      .orderBy("doc_id")
  },
    Some("""WITH w AS (SELECT doc_id, lang = 'en' AS is_t,
           |                  string_split_regex(lower(trim(text)), '\s+') AS ws
           |           FROM documents),
           |ng AS (SELECT doc_id, is_t, tok AS ng FROM w, unnest(ws) AS u(tok)
           |       UNION ALL
           |       SELECT doc_id, is_t, ws[i] || ' ' || ws[i+1] AS ng
           |       FROM w, unnest(range(1, len(ws))) AS r(i)),
           |b AS (SELECT doc_id, is_t,
           |             ('0x' || substring(md5(ng), 1, 8))::BIGINT % 10000 AS bkt
           |      FROM ng),
           |pb AS (SELECT bkt, count(*) AS rc,
           |              sum(CASE WHEN is_t THEN 1 ELSE 0 END) AS tc
           |       FROM b WHERE doc_id < 400 GROUP BY bkt),
           |tot AS (SELECT sum(rc) AS rn, sum(tc) AS tn FROM pb),
           |lw AS (SELECT bkt,
           |         round(ln((tc + 1.0) / (tn + 1.0 * 10000))
           |             - ln((rc + 1.0) / (rn + 1.0 * 10000)), 6)::DECIMAL(24,6) AS lr
           |       FROM pb CROSS JOIN tot),
           |dflt AS (SELECT round(ln(1.0 / (tn + 1.0 * 10000))
           |               - ln(1.0 / (rn + 1.0 * 10000)), 6)::DECIMAL(24,6) AS lr
           |         FROM tot),
           |inc AS (SELECT doc_id, bkt FROM b WHERE doc_id >= 400),
           |sc AS (SELECT inc.doc_id, count(*) AS n_ngrams,
           |              sum(coalesce(lw.lr, dflt.lr)) AS logw
           |       FROM inc LEFT JOIN lw USING (bkt) CROSS JOIN dflt
           |       GROUP BY inc.doc_id)
           |SELECT doc_id, n_ngrams, round(logw::DOUBLE, 6) AS logw
           |FROM sc ORDER BY doc_id""".stripMargin))

  val all: Seq[GQuery] = Seq(q185, q186, q187, q188, q189, q190, q191, q192,
    q193, q194)
}
