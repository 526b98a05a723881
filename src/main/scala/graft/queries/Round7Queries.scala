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
    * document slice. EM argmax + prune is not SQL-expressible, so the
    * gate states the TRAIN-SIDE CONTRACT as a row (the q168/q30
    * pattern): `n_singles` — the single-codepoint piece count — is
    * recomputed INDEPENDENTLY by DuckDB as the slice's distinct
    * character count (the alphabet-coverage guarantee: training always
    * retains the full alphabet, which is what makes Viterbi segmentation
    * total); the multi-piece inventory is non-empty and within the
    * requested budget; ranks are contiguous with log-probs
    * non-increasing; and the distribution is normalized (Σ exp(logProb)
    * = 1 — `normalize` computes log(n/total) over the kept inventory).
    * UnigramLmSpec still pins piece-for-piece equality against an
    * independent single-node reference. */
  val q185 = GQuery("q185_unigram_train", (s, d) => {
    import s.implicits._
    val docs = t(s, d, "documents").select(col("doc_id"), col("text"))
    val slice = docs.filter(col("doc_id") < 200)
    val pieces = UnigramLm.train(slice, "text",
      vocabSize = 64, maxPieceLen = 5, seedSize = 256, emIters = 1)
    def cps(p: String): Int = p.codePointCount(0, p.length)
    val singles = pieces.filter(p => cps(p.piece) == 1).map(_.piece).toSet
    val nMultis = pieces.size - singles.size
    val ranksOk = pieces.map(_.rank) == (0 until pieces.size) &&
      pieces.sliding(2).forall(w => w.size < 2 || w(0).logProb >= w(1).logProb)
    val normOk =
      math.abs(pieces.iterator.map(p => math.exp(p.logProb)).sum - 1.0) < 1e-6
    val lenOk = pieces.forall(p => cps(p.piece) >= 1 && cps(p.piece) <= 5)
    // the alphabet must be EXACTLY the slice's character set (same split
    // discipline as UnigramLm.wordCounts/alphabet) — DuckDB recounts it
    val charSet = slice
      .select(explode(split(col("text"), "\\s+")).as("w"))
      .filter(length(col("w")) > 0)
      .select(explode(filter(split(col("w"), ""), c => c =!= "")).as("c"))
      .distinct().collect().map(_.getString(0)).toSet
    Seq((singles.size.toLong, charSet == singles,
        nMultis > 0 && nMultis <= 64, ranksOk, normOk, lenOk))
      .toDF("n_singles", "alphabet_ok", "multi_budget_ok",
        "ranks_ok", "normalized_ok", "piece_len_ok")
  },
    Some("""WITH w AS (SELECT unnest(string_split_regex(text, '\s+')) AS w
           |          FROM documents WHERE doc_id < 200 AND text IS NOT NULL),
           |c AS (SELECT unnest(string_split(w, '')) AS c FROM w WHERE len(w) > 0)
           |SELECT CAST(count(DISTINCT c) AS BIGINT) AS n_singles,
           |  true AS alphabet_ok, true AS multi_budget_ok, true AS ranks_ok,
           |  true AS normalized_ok, true AS piece_len_ok FROM c""".stripMargin))

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
    * [[graft.ext.IndexStore]], reload, search with the probe buckets
    * PUSHED INTO the parquet scan. Round 11 serves through the
    * BUCKET-CLUSTERED bundle ([[graft.ext.LshIndex.searchBucketed]] over
    * [[graft.ext.IndexStore.writeLshBucketed]]): vectors stored BESIDE
    * their (table_id, bucket) assignment, so the probed buckets' pruned
    * scan yields signatures AND vectors in one pass — no second fetch
    * join, no candidate-id collect; one row-group serves one probe's
    * whole candidate set (the lever BASELINE §q187 named after the
    * round-8 id-sorted fetch, [[graft.ext.LshIndex.searchStored]],
    * still converged with q177 at sf10 — the fetch dominated).
    * searchStored remains the layout of record when ×tables vector
    * duplication is unaffordable (LshIndexSpec keeps both exact).
    * Memoized per (session, dir): rep 1 pays build+write+load, reps 2+
    * price the pruned steady state. Same recall contract as the q30
    * family. */
  val q187 = GQuery("q187_ann_lsh_pruned", (s, d) => {
    import graft.ext.{IndexStore, LshIndex, Similarity}
    val e = t(s, d, "embeddings")
    val probes = e.where(col("vec_id") < 5)
      .select(col("vec_id").as("probe_id"), col("embedding").as("pv"))
    val bucketed = LshIndex.cachedBucketed(
        s.sparkContext.applicationId + ":bucketed:" + d) {
      val built = LshIndex.build(e, "vec_id", "embedding", tables = 8, dim = 64)
      val dir = sys.props("java.io.tmpdir") +
        s"/graft_idx/lshb_${Registry.pathKey(d)}"
      IndexStore.writeLshBucketed(built, e, "vec_id", "embedding", dir)
      LshIndex.drop(built)
      IndexStore.loadLshBucketed(s, dir)
    }
    val ann = LshIndex.searchBucketed(bucketed, probes,
      "vec_id", "embedding", "probe_id", "pv", k = 10)
    val exact = Similarity.bruteForceTopK(e, probes, "vec_id", "embedding",
      "probe_id", "pv", 10)
    Similarity.recallContract(ann, exact, "probe_id", "vec_id", k = 10,
      minHits = 2.0)
  }, Some(PipelineQueries.annContractSql))

  /** Q188 (T16, WordPiece training): likelihood-scored merges
    * ([[graft.ext.WordPiece]], Schuster & Nakajima 2012 — the BERT
    * tokenizer) on the q185 document slice. The iterative argmax is not
    * SQL-expressible → the gate states the TRAIN-SIDE CONTRACT as a row
    * (the q168 pattern): exactly the 16 requested merges landed, ranks
    * are contiguous, every winning pair count clears the floor, and
    * every likelihood score sits in (0, 1] — score = n/(nl·nr) with
    * n ≤ min(nl, nr), so a score above 1 or at 0 would mean the count
    * join itself is broken. The greedy-encode round-trip over the FULL
    * corpus is q189's gate; WordPieceSpec pins merge-for-merge equality
    * vs an independent reference. */
  val q188 = GQuery("q188_wordpiece_train", (s, d) => {
    import graft.ext.WordPiece
    import s.implicits._
    val docs = t(s, d, "documents").select(col("doc_id"), col("text"))
    val merges = WordPiece.train(docs.filter(col("doc_id") < 200), "text",
      numMerges = 16, minPairCount = 2)
    val ranksOk = merges.map(_.rank) == (0 until merges.size)
    val countsOk = merges.forall(_.count >= 2L)
    val scoresOk = merges.forall(m => m.score > 0.0 && m.score <= 1.0)
    Seq((merges.size.toLong, ranksOk, countsOk, scoresOk))
      .toDF("n_merges", "ranks_ok", "counts_ok", "scores_ok")
  },
    Some("""SELECT CAST(16 AS BIGINT) AS n_merges, true AS ranks_ok,
           |  true AS counts_ok, true AS scores_ok""".stripMargin))

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
    * construction), then score the corpus. Iterative GD is not
    * SQL-expressible, so the gate states the SERVE-SIDE CONTRACT as a
    * row (the q168/q185 pattern): every document scores (n_docs matches
    * DuckDB's count), every probability is a probability (0 ≤ p ≤ 1 —
    * a broken sigmoid or feature join shows up here), threshold
    * agreement with the weak label clears 0.75 (measured 0.84 at the
    * gate SF; a linear probe cannot express the rule CONJUNCTION
    * exactly, so sub-1.0 is the honest ceiling), and agreement BEATS the
    * all-true base rate (0.67) — the distillation genuinely learned,
    * not just predicted the majority class. The training procedure's
    * correctness contract lives in QualityClassifierSpec
    * (weight-for-weight equality vs an independent single-node reference
    * + a separable-corpus accuracy floor). Training is memoized per
    * (session, dir) — the q191 lifecycle split — so bench reps 2+ price
    * steady-state scoring. */
  private def qclfModel(s: SparkSession, d: String) = {
    import graft.ext.{IndexStore, QualityClassifier, TextQuality}
    QualityClassifier.cached(s.sparkContext.applicationId + ":" + d) {
      val docs = t(s, d, "documents").select(col("doc_id"), col("text"))
      val labels = TextQuality.gopherFilter(docs, "doc_id", "text")
        .select(col("doc_id"), col("keep"))
      val m = QualityClassifier.train(docs.join(labels, Seq("doc_id")), "keep",
        "doc_id", "text", buckets = 1024, iters = 100, lr = 0.5,
        statRamps = Seq(20.0, -90.0), adagrad = true)
      // Durable lifecycle (the q179/q194 discipline): the trained scorer
      // round-trips IndexStore kind=logreg, so what q193 serves is the
      // STORED model, not driver memory.
      val dir = sys.props("java.io.tmpdir") +
        s"/graft_idx/qclf_${Registry.pathKey(d)}"
      IndexStore.writeLogreg(m, dir)
      IndexStore.loadLogreg(s, dir)
    }
  }

  /** Q193_BUILD (T18 training, priced alone — VERDICT r7 #4): fit the
    * q193 classifier, persist it through [[graft.ext.IndexStore]]
    * (kind=logreg), reload, and emit SQL-recomputable invariants
    * (bucket count, weight vector length = buckets + 2 ramps, corpus
    * size). Memoized per (session, dir) and shared with
    * q193_quality_classifier, which sorts after this entry in the bench:
    * rep 1 here prices the 100-iteration fit visibly, and the scoring
    * gate benches at its real steady-state cost (the q179_build /
    * q179_search shape). */
  val q193b = GQuery("q193_build", (s, d) => {
    val m = qclfModel(s, d)
    val nDocs = t(s, d, "documents").count()
    import s.implicits._
    Seq((m.buckets.toLong, m.weights.length.toLong + 1L, nDocs))
      .toDF("buckets", "n_weights", "n_docs")
  },
    Some("""SELECT CAST(1024 AS BIGINT) AS buckets,
           |  CAST(1024 + 2 + 1 AS BIGINT) AS n_weights,
           |  CAST(count(*) AS BIGINT) AS n_docs FROM documents""".stripMargin))

  val q193 = GQuery("q193_quality_classifier", (s, d) => {
    import graft.ext.{QualityClassifier, TextQuality}
    val docs = t(s, d, "documents").select(col("doc_id"), col("text"))
    val labels = TextQuality.gopherFilter(docs, "doc_id", "text")
      .select(col("doc_id"), col("keep"))
    val model = qclfModel(s, d)
    QualityClassifier.score(model, docs, "doc_id", "text")
      .join(labels.withColumnRenamed("keep", "label"), Seq("doc_id"))
      .agg(count(lit(1)).as("n_docs"),
        sum(when(col("prob") < 0.0 || col("prob") > 1.0, 1L).otherwise(0L))
          .as("n_prob_oob"),
        avg(when((col("prob") >= 0.5) === col("label"), 1.0)
          .otherwise(0.0)).as("__agreement"),
        avg(when(col("label"), 1.0).otherwise(0.0)).as("__base_rate"))
      .select(col("n_docs"), col("n_prob_oob"),
        (col("__agreement") >= 0.75).as("agreement_ok"),
        (col("__agreement") > col("__base_rate")).as("beats_base_rate"))
  },
    Some("""SELECT CAST(count(*) AS BIGINT) AS n_docs,
           |  CAST(0 AS BIGINT) AS n_prob_oob, true AS agreement_ok,
           |  true AS beats_base_rate FROM documents""".stripMargin))

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
        s"/graft_idx/dsir_${Registry.pathKey(d)}"
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

  /** Unrolled power-iteration twin of [[graft.ext.PageRank.run]]: DuckDB
    * has no iterative aggregation, so each iteration is a generated CTE —
    * identical exact micro-unit integer arithmetic (half-up integer
    * splits, BIGINT sums, `(85·m + 50) // 100` damping; `//` is DuckDB's
    * floor division ≡ Spark's `div` on the non-negative operands here). */
  private def pagerankOracle(iters: Int): String = {
    val steps = (1 to iters).map { i =>
      s"""r$i AS (SELECT n.id,
         |  150000 + (85 * coalesce(s.m, 0) + 50) // 100 AS ri
         |FROM n LEFT JOIN (
         |  SELECT e.dst AS id,
         |         sum((2 * p.ri + d.outdeg) // (2 * d.outdeg)) AS m
         |  FROM r${i - 1} p JOIN e ON e.src = p.id JOIN deg d ON d.id = p.id
         |  GROUP BY e.dst) s ON s.id = n.id)""".stripMargin
    }.mkString(",\n")
    s"""WITH cp AS (SELECT DISTINCT o_custkey * 2 AS src, l_partkey * 2 + 1 AS dst
       |            FROM orders JOIN lineitem ON l_orderkey = o_orderkey),
       |e AS (SELECT src, dst FROM cp
       |      UNION ALL SELECT dst AS src, src AS dst FROM cp),
       |n AS (SELECT DISTINCT src AS id FROM e),
       |deg AS (SELECT src AS id, count(*) AS outdeg FROM e GROUP BY src),
       |r0 AS (SELECT id, CAST(1000000 AS BIGINT) AS ri FROM n),
       |$steps
       |SELECT id AS node_id, CAST(ri AS DOUBLE) / 1000000.0 AS rank_score
       |FROM r$iters
       |ORDER BY rank_score DESC, node_id LIMIT 100""".stripMargin
  }

  /** Q195 (G2, PageRank): 5 power iterations (10 through round 7; halved with the oracle regenerated to fit the driver bench budget — VERDICT r7 #3) over the bidirectional
    * customer↔part purchase graph ([[graft.ext.PageRank]]) — two slim
    * exchanges per iteration (N-row rank join + partial-aggregated
    * contribution shuffle), per-iteration localCheckpoint, and EXACT
    * integer micro-unit arithmetic end-to-end, so the result is
    * bit-identical across engines and partitionings by construction. The
    * symmetric gate graph has no sinks; dangling redistribution is
    * spec-held (PageRankSpec vs an independent adjacency-map reference).
    * Top-100 by (rank desc, id) — a TakeOrdered, never a global sort. */
  val q195 = GQuery("q195_pagerank", (s, d) => {
    import graft.ext.PageRank
    val g = PageRank.purchaseGraph(t(s, d, "orders"), t(s, d, "lineitem"))
    PageRank.run(g, "src", "dst", iters = 5)
      .select(col("id").as("node_id"), col("r").as("rank_score"))
      .orderBy(col("rank_score").desc, col("node_id")).limit(100)
  }, Some(pagerankOracle(5)))

  /** Q196 (ER1, blocked fuzzy entity match): Jaro–Winkler name matching
    * over the distinct part names, blocked on the last name token — the
    * equi-join-on-block-key shape that replaces the O(n²) all-pairs scan
    * ([[graft.ext.EntityResolution]]); the JW score is a native codegen'd
    * expression ([[org.apache.spark.sql.graft.JaroWinkler]]) evaluated
    * inside the join's whole-stage span, semantics pinned to DuckDB's
    * `jaro_winkler_similarity` (StringSimSpec probe vectors). */
  val q196 = GQuery("q196_er_fuzzy_match", (s, d) => {
    import graft.ext.{EntityResolution, TextPrep}
    val names = t(s, d, "part").select(col("p_name")).distinct()
      .select(col("p_name").as("pid"), col("p_name").as("pname"))
    EntityResolution.fuzzyMatches(names, "pid", "pname",
        element_at(TextPrep.tokens(col("pname")), -1), threshold = 0.5)
      .select(col("name_a"), col("name_b"), col("jw_sim"))
      .orderBy("name_a", "name_b")
  },
    Some("""WITH n AS (SELECT DISTINCT p_name FROM part),
           |b AS (SELECT p_name,
           |        list_extract(string_split_regex(lower(trim(p_name)), '\s+'), -1) AS blk
           |      FROM n)
           |SELECT a.p_name AS name_a, b2.p_name AS name_b,
           |  round(jaro_winkler_similarity(a.p_name, b2.p_name), 6) AS jw_sim
           |FROM b a JOIN b b2 ON a.blk = b2.blk AND a.p_name < b2.p_name
           |WHERE round(jaro_winkler_similarity(a.p_name, b2.p_name), 6) >= 0.5
           |ORDER BY name_a, name_b""".stripMargin))

  /** Q197 (R3, hybrid retrieval / RRF fusion): fuse the q55 sparse BM25
    * top-20 with a dense cosine top-20 (probe = vec 0) by Reciprocal Rank
    * Fusion ([[graft.ext.HybridRetrieval]], Cormack 2009) — the standard
    * RAG serving composition over the engine's two retriever families.
    * Fusion itself touches only the two 20-row lists; reciprocal ranks
    * are rounded rationals DECIMAL-summed, so the fused ordering is
    * engine-stable. */
  val q197 = GQuery("q197_hybrid_rrf", (s, d) => {
    import graft.ext.{HybridRetrieval, Relevance}
    import graft.functions.VectorFunctions
    val sparse = Relevance.bm25TopK(t(s, d, "documents"), "doc_id", "text",
      Seq("spark", "window", "hash"), topK = 20)
    val e = t(s, d, "embeddings")
    val probe = e.where(col("vec_id") === 0).select(col("embedding").as("pv"))
    val dense = e.crossJoin(broadcast(probe))
      .select(col("vec_id").as("doc_id"),
        round(VectorFunctions.cosine(col("embedding"), col("pv")), 6).as("cs"))
      .orderBy(col("cs").desc, col("doc_id")).limit(20)
    HybridRetrieval.rrfFuse(Seq(
      HybridRetrieval.ranked(sparse, "doc_id", "bm25"),
      HybridRetrieval.ranked(dense, "doc_id", "cs")), "doc_id", topK = 10)
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
           |       FROM p JOIN f USING (term) JOIN d USING (doc_id) CROSS JOIN c),
           |sp AS (SELECT doc_id, round(sum(s), 6) AS bm25 FROM sc GROUP BY doc_id
           |       ORDER BY bm25 DESC, doc_id LIMIT 20),
           |spr AS (SELECT doc_id, row_number() OVER (ORDER BY bm25 DESC, doc_id) AS rnk
           |        FROM sp),
           |e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
           |pr AS (SELECT v AS pv FROM e WHERE vec_id = 0),
           |dn AS (SELECT e.vec_id AS doc_id,
           |         round(list_inner_product(e.v, pr.pv) /
           |               (sqrt(list_inner_product(e.v, e.v))
           |                * sqrt(list_inner_product(pr.pv, pr.pv))), 6) AS cs
           |       FROM e CROSS JOIN pr ORDER BY cs DESC, doc_id LIMIT 20),
           |dnr AS (SELECT doc_id, row_number() OVER (ORDER BY cs DESC, doc_id) AS rnk
           |        FROM dn),
           |a AS (SELECT doc_id, rnk FROM spr UNION ALL SELECT doc_id, rnk FROM dnr)
           |SELECT doc_id, CAST(sum(CAST(round(1.0 / (60 + rnk), 6) AS DECIMAL(18,6)))
           |                    AS DOUBLE) AS rrf
           |FROM a GROUP BY doc_id ORDER BY rrf DESC, doc_id LIMIT 10""".stripMargin))

  /** Q198 (A21, exact heavy hitters): every token with count·200 > total
    * over the document corpus — per-partition Misra–Gries candidates (no
    * exchange) + exact recount of the bounded candidate set
    * ([[graft.ext.HeavyHitters]]): the distinct-token table never crosses
    * a shuffle. Output is the EXACT frequent set (integer threshold
    * arithmetic), so the oracle is a plain GROUP BY ... HAVING. */
  val q198 = GQuery("q198_heavy_hitters", (s, d) => {
    import graft.ext.{HeavyHitters, TextPrep}
    val toks = t(s, d, "documents")
      .select(explode(TextPrep.tokens(col("text"))).as("token"))
    HeavyHitters.frequentItems(toks, "token", k = 200)
  },
    Some("""WITH tok AS (SELECT unnest(string_split_regex(lower(trim(text)), '\s+')) AS token
           |            FROM documents),
           |tot AS (SELECT count(*) AS n FROM tok)
           |SELECT token AS item, count(*) AS cnt
           |FROM tok CROSS JOIN tot GROUP BY token, tot.n
           |HAVING count(*) * 200 > tot.n
           |ORDER BY cnt DESC, item""".stripMargin))

  /** Unrolled twin of [[graft.ext.PageRank.personalized]]: the uniform
    * oracle with the teleport base concentrated on the seed list —
    * `sb = (150000·N) // |S∩graph|` on seeds, 0 elsewhere; r⁰ IS the
    * teleport vector. Same exact integer arithmetic. */
  private def pprOracle(iters: Int, seeds: Seq[Long]): String = {
    val in = seeds.mkString("(", ", ", ")")
    val steps = (1 to iters).map { i =>
      s"""r$i AS (SELECT n.id,
         |  (CASE WHEN n.id IN $in THEN sb.sb ELSE 0 END)
         |    + (85 * coalesce(s.m, 0) + 50) // 100 AS ri
         |FROM n CROSS JOIN sb LEFT JOIN (
         |  SELECT e.dst AS id,
         |         sum((2 * p.ri + d.outdeg) // (2 * d.outdeg)) AS m
         |  FROM r${i - 1} p JOIN e ON e.src = p.id JOIN deg d ON d.id = p.id
         |  GROUP BY e.dst) s ON s.id = n.id)""".stripMargin
    }.mkString(",\n")
    s"""WITH cp AS (SELECT DISTINCT o_custkey * 2 AS src, l_partkey * 2 + 1 AS dst
       |            FROM orders JOIN lineitem ON l_orderkey = o_orderkey),
       |e AS (SELECT src, dst FROM cp
       |      UNION ALL SELECT dst AS src, src AS dst FROM cp),
       |n AS (SELECT DISTINCT src AS id FROM e),
       |deg AS (SELECT src AS id, count(*) AS outdeg FROM e GROUP BY src),
       |sb AS (SELECT (150000 * (SELECT count(*) FROM n))
       |              // (SELECT count(*) FROM n WHERE id IN $in) AS sb),
       |r0 AS (SELECT id, CASE WHEN id IN $in THEN sb.sb ELSE 0 END AS ri
       |       FROM n CROSS JOIN sb),
       |$steps
       |SELECT id AS node_id, CAST(ri AS DOUBLE) / 1000000.0 AS rank_score
       |FROM r$iters
       |ORDER BY rank_score DESC, node_id LIMIT 100""".stripMargin
  }

  /** Q199 (G3, personalized PageRank): teleport mass concentrated on 5
    * seed customers ([[graft.ext.PageRank.personalized]]) — the
    * seed-expansion primitive of graph-based data selection (rank by
    * random-walk proximity to a trusted seed set). Same two-exchange
    * iteration and exact integer micro-unit arithmetic as q195; the
    * seed-restart dangling convention is spec-held (the symmetric gate
    * graph has no sinks). */
  val q199 = GQuery("q199_pagerank_personalized", (s, d) => {
    import graft.ext.PageRank
    val g = PageRank.purchaseGraph(t(s, d, "orders"), t(s, d, "lineitem"))
    PageRank.personalized(g, "src", "dst",
        seeds = Seq(2L, 4L, 6L, 8L, 10L), iters = 5)
      .select(col("id").as("node_id"), col("r").as("rank_score"))
      .orderBy(col("rank_score").desc, col("node_id")).limit(100)
  }, Some(pprOracle(5, Seq(2L, 4L, 6L, 8L, 10L))))

  /** Q200 (G4, item co-occurrence mining): top co-purchased part pairs
    * by basket support over customer baskets, promiscuous baskets
    * (> 60 distinct parts) dropped BEFORE the pair join — the explicit
    * quadratic-fanout cap ([[graft.ext.CoOccurrence]]); pair counts are
    * map-side-combined, top-k is a TakeOrdered with a total (support,
    * item_a, item_b) order. */
  val q200 = GQuery("q200_cooccurrence", (s, d) => {
    import graft.ext.CoOccurrence
    val m = t(s, d, "orders").join(t(s, d, "lineitem"),
        col("o_orderkey") === col("l_orderkey"))
      .select(col("o_custkey").as("basket"), col("l_partkey").as("item"))
    CoOccurrence.topPairs(m, "basket", "item", maxBasketSize = 60, topK = 50)
  },
    Some("""WITH m AS (SELECT DISTINCT o_custkey AS b, l_partkey AS i
           |           FROM orders JOIN lineitem ON l_orderkey = o_orderkey),
           |ok AS (SELECT b FROM m GROUP BY b HAVING count(*) <= 60),
           |c AS (SELECT m.b, m.i FROM m JOIN ok USING (b))
           |SELECT a.i AS item_a, b2.i AS item_b, count(*) AS support
           |FROM c a JOIN c b2 ON a.b = b2.b AND a.i < b2.i
           |GROUP BY 1, 2
           |ORDER BY support DESC, item_a, item_b LIMIT 50""".stripMargin))

  /** Q201 (V4, PCA fit contract): fit k=8 principal components on the
    * 64-dim embedding corpus ([[graft.ext.Pca]] — one mapPartitions pass
    * over the d+d² sufficient statistics, driver-side LAPACK eigen) and
    * gate every property DuckDB can state without an eigensolver (the
    * q30 contract class): component count, orthonormality to 1e-9,
    * descending eigenvalues, non-negative spectrum, explained ratio in
    * (0, 1], and k=dim reconstruction ≈ 0 (the eigen-exactness witness).
    * Eigen decomposition itself is spec-held (PcaSpec vs an independent
    * single-node covariance+eigen reference). */
  val q201 = GQuery("q201_pca_contract", (s, d) => {
    import s.implicits._
    import graft.ext.Pca
    val e = t(s, d, "embeddings")
    val m = Pca.fit(e, "embedding", dim = 64, k = 8)
    val orthOk = (0 until m.k).forall { i =>
      (i until m.k).forall { j =>
        val dot = m.components(i).zip(m.components(j)).map(p => p._1 * p._2).sum
        math.abs(dot - (if (i == j) 1.0 else 0.0)) < 1e-9
      }
    }
    val sortedOk = m.eigenvalues.sliding(2).forall(w => w(0) >= w(1))
    val nonNegOk = m.eigenvalues.forall(_ >= 0.0)
    val ratioOk = m.explainedRatio > 0.0 && m.explainedRatio <= 1.0
    val reconFullOk = Pca.reconstructionError(e.select(
      col("embedding").cast("array<double>").as("v")), "v",
      Pca.fit(e, "embedding", 64, 64)) < 1e-9
    Seq((m.k.toLong, orthOk, sortedOk, nonNegOk, ratioOk, reconFullOk))
      .toDF("n_components", "orthonormal_ok", "sorted_ok", "nonneg_ok",
        "ratio_ok", "recon_full_ok")
  },
    Some("""SELECT CAST(8 AS BIGINT) AS n_components, true AS orthonormal_ok,
           |  true AS sorted_ok, true AS nonneg_ok, true AS ratio_ok,
           |  true AS recon_full_ok""".stripMargin))

  /** Q202 (N12, PCA-compressed ANN): brute-force candidate search in the
    * 16-dim PCA projection (4× fewer bytes per score) + exact full-space
    * re-rank of the top-80 candidates — the dimensionality-reduction
    * twin of the PQ-ADC pipeline (q175), same recall-contract gate as
    * the whole ANN family. The driver's uniform-random vectors are the
    * WORST case for PCA (near-flat spectrum — nothing to compress), so
    * the floor is the honest q30 2/10; structured corpora concentrate
    * variance and push recall toward 1. */
  val q202 = GQuery("q202_ann_pca", (s, d) => {
    import graft.ext.{Pca, Similarity}
    val e = t(s, d, "embeddings")
    val m = Pca.fit(e, "embedding", dim = 64, k = 16)
    val proj = Pca.project(e, "embedding", m, "pv16")
      .select(col("vec_id"), col("embedding"), col("pv16"))
    val probes = proj.where(col("vec_id") < 5)
      .select(col("vec_id").as("probe_id"), col("embedding").as("pv"),
        col("pv16").as("ppv16"))
    val cands = Similarity.bruteForceTopK(
      proj.select(col("vec_id"), col("pv16").as("embedding")),
      probes.select(col("probe_id"), col("ppv16").as("pv")),
      "vec_id", "embedding", "probe_id", "pv", 80)
    val reRanked = Similarity.bruteForceTopK(
      proj.join(cands.select("vec_id").distinct(), "vec_id")
        .select(col("vec_id"), col("embedding")),
      probes.select(col("probe_id"), col("pv")),
      "vec_id", "embedding", "probe_id", "pv", 10)
    val exact = Similarity.bruteForceTopK(e, probes.select(col("probe_id"),
      col("pv")), "vec_id", "embedding", "probe_id", "pv", 10)
    Similarity.recallContract(reRanked, exact, "probe_id", "vec_id", k = 10,
      minHits = 2.0)
  }, Some(PipelineQueries.annContractSql))

  /** Q203 (V5, ALS matrix factorization contract): factorize the
    * customer×part purchase-count matrix (rank 8, 3 alternations,
    * λ = 0.1 — [[graft.ext.Als]]) and gate what DuckDB can state: the
    * exact user/item universe sizes (SQL-recomputable) and the fit
    * contracts — finite factors, and ALS RMSE under 0.7× the global-mean
    * baseline RMSE (itself the stddev of the rating column). The
    * least-squares algebra is spec-held (AlsSpec: exact-recovery,
    * same-init single-node reference, monotone improvement). */
  val q203 = GQuery("q203_als_contract", (s, d) => {
    import s.implicits._
    import graft.ext.Als
    val ratings = t(s, d, "orders").join(t(s, d, "lineitem"),
        col("o_orderkey") === col("l_orderkey"))
      .groupBy(col("o_custkey").as("u"), col("l_partkey").as("i"))
      .agg(count(lit(1)).cast("double").as("r"))
      .localCheckpoint()
    val m = Als.train(ratings, "u", "i", "r", rank = 8, iters = 3, lambda = 0.1)
    val alsRmse = Als.rmse(m, ratings, "u", "i", "r")
    val stats = ratings.agg(
      countDistinct(col("u")).as("nu"), countDistinct(col("i")).as("ni"),
      stddev_pop(col("r")).as("base")).collect()(0)
    val finiteOk = m.userFactors.unionAll(m.itemFactors)
      .where(exists(col("f"), x => isnan(x) || x === Double.PositiveInfinity
        || x === Double.NegativeInfinity))
      .isEmpty
    Seq((stats.getLong(0), stats.getLong(1),
        alsRmse < stats.getDouble(2) * 0.7, finiteOk))
      .toDF("n_users", "n_items", "beats_baseline_ok", "finite_ok")
  },
    Some("""WITH r AS (SELECT o_custkey AS u, l_partkey AS i, count(*) AS r
           |           FROM orders JOIN lineitem ON l_orderkey = o_orderkey
           |           GROUP BY 1, 2)
           |SELECT CAST(count(DISTINCT u) AS BIGINT) AS n_users,
           |  CAST(count(DISTINCT i) AS BIGINT) AS n_items,
           |  true AS beats_baseline_ok, true AS finite_ok FROM r""".stripMargin))

  /** Q204 (G5, exact triangle census): triangles of the part
    * co-occurrence graph (support ≥ 3 under the q200 basket cap) via
    * degree-ordered orientation ([[graft.ext.GraphAlgos]]) — out-degree
    * O(√m) regardless of hubs, each triangle one wedge + one equi-join
    * closing-edge probe, no OR-joins, no double counting. Exact
    * integers end-to-end → plain SQL oracle. */
  val q204 = GQuery("q204_triangle_count", (s, d) => {
    import graft.ext.{CoOccurrence, GraphAlgos}
    val m = t(s, d, "orders").join(t(s, d, "lineitem"),
        col("o_orderkey") === col("l_orderkey"))
      .select(col("o_custkey").as("basket"), col("l_partkey").as("item"))
    val edges = CoOccurrence.pairCounts(m, "basket", "item", maxBasketSize = 60)
      .where(col("support") >= 3).select("item_a", "item_b")
    GraphAlgos.triangleCount(edges, "item_a", "item_b")
  },
    Some("""WITH m AS (SELECT DISTINCT o_custkey AS b, l_partkey AS i
           |           FROM orders JOIN lineitem ON l_orderkey = o_orderkey),
           |ok AS (SELECT b FROM m GROUP BY b HAVING count(*) <= 60),
           |c AS (SELECT m.b, m.i FROM m JOIN ok USING (b)),
           |e0 AS (SELECT a.i AS x, b2.i AS y FROM c a
           |       JOIN c b2 ON a.b = b2.b AND a.i < b2.i
           |       GROUP BY 1, 2 HAVING count(*) >= 3),
           |deg AS (SELECT n, count(*) AS dg FROM
           |          (SELECT x AS n FROM e0 UNION ALL SELECT y FROM e0)
           |        GROUP BY n),
           |dir AS (SELECT CASE WHEN (da.dg, e0.x) < (db.dg, e0.y)
           |                    THEN e0.x ELSE e0.y END AS src,
           |               CASE WHEN (da.dg, e0.x) < (db.dg, e0.y)
           |                    THEN e0.y ELSE e0.x END AS dst
           |        FROM e0 JOIN deg da ON da.n = e0.x
           |                JOIN deg db ON db.n = e0.y),
           |tri AS (SELECT w1.src FROM dir w1
           |        JOIN dir w2 ON w1.src = w2.src AND w1.dst <> w2.dst
           |        JOIN dir c3 ON c3.src = w1.dst AND c3.dst = w2.dst)
           |SELECT (SELECT CAST(count(*) AS BIGINT) FROM tri) AS n_triangles,
           |  (SELECT CAST(count(*) AS BIGINT) FROM e0) AS n_edges,
           |  (SELECT CAST(count(*) AS BIGINT) FROM
           |     (SELECT x AS n FROM e0 UNION SELECT y FROM e0)) AS n_nodes""".stripMargin))

  /** Q205 (G6, BFS hop distances): levels 0–4 from customer 1 (node 2)
    * over the purchase graph — per-level frontier equi-join + visited
    * anti-join, localCheckpoint per level ([[graft.ext.GraphAlgos
    * .bfsDistances]]). Exact integer distances → recursive-CTE oracle
    * (min hop per reached node). */
  val q205 = GQuery("q205_bfs_distances", (s, d) => {
    import graft.ext.{GraphAlgos, PageRank}
    val g = PageRank.purchaseGraph(t(s, d, "orders"), t(s, d, "lineitem"))
    // the purchase graph is symmetric and dup-free by construction (both
    // directions unioned over disjoint even/odd id spaces) — skip the
    // re-symmetrization (r18)
    GraphAlgos.bfsDistances(g, "src", "dst", source = 2L, maxDepth = 4,
      assumeSymmetric = true)
      .select(col("node").as("node_id"), col("dist"))
      .orderBy("node_id")
  },
    Some("""WITH RECURSIVE cp AS (SELECT DISTINCT o_custkey * 2 AS src,
           |                             l_partkey * 2 + 1 AS dst
           |            FROM orders JOIN lineitem ON l_orderkey = o_orderkey),
           |e AS (SELECT src, dst FROM cp UNION ALL SELECT dst, src FROM cp),
           |r AS (SELECT CAST(2 AS BIGINT) AS node, 0 AS d
           |      UNION
           |      SELECT e.dst, r.d + 1 FROM r JOIN e ON e.src = r.node
           |      WHERE r.d < 4)
           |SELECT node AS node_id, CAST(min(d) AS INT) AS dist
           |FROM r GROUP BY node ORDER BY node_id""".stripMargin))

  val all: Seq[GQuery] = Seq(q185, q186, q187, q188, q189, q190, q191, q192,
    q193b, q193, q194, q195, q196, q197, q198, q199, q200, q201, q202, q203,
    q204, q205)
}
