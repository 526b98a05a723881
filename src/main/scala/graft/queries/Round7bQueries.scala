package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables

/** Round-7 continuation (second session): Kneser–Ney LM scoring, C4 line
  * filters, positional phrase search, count–min sketch, leakage-safe
  * grouped splits.
  */
object Round7bQueries {

  private def t(s: SparkSession, d: String, n: String): DataFrame = Tables.load(s, d, n)

  /** The q206/q215 oracle: Kneser–Ney fit on doc_id < 50 at threshold
    * 30, scored over `scoreWhere`'s slice of the corpus. */
  private def knOracleSql(scoreWhere: String): String =
    s"""WITH tr AS (SELECT doc_id, string_split_regex(lower(trim(text)), '\\s+') AS w
           |            FROM documents WHERE doc_id < 50),
           |uc AS (SELECT tok, count(*) AS c
           |       FROM (SELECT unnest(w) AS tok FROM tr) GROUP BY tok),
           |voc AS (SELECT tok FROM uc WHERE c >= 30),
           |trbg AS (SELECT bg.ar AS ar, bg.br AS br FROM (
           |  SELECT unnest([struct_pack(ar := w[i], br := w[i+1])
           |                 for i in range(1, len(w))]) AS bg
           |  FROM tr WHERE len(w) >= 2)),
           |mbg AS (SELECT coalesce(va.tok, '<unk>') AS a,
           |               coalesce(vb.tok, '<unk>') AS b
           |        FROM trbg LEFT JOIN voc va ON trbg.ar = va.tok
           |                  LEFT JOIN voc vb ON trbg.br = vb.tok),
           |c AS (SELECT a, b, count(*) AS ab_cnt FROM mbg GROUP BY a, b),
           |ca AS (SELECT a, sum(ab_cnt) AS a_cnt, count(*) AS n1p_a FROM c GROUP BY a),
           |cb AS (SELECT b, count(*) AS n1p_b FROM c GROUP BY b),
           |tt AS (SELECT (SELECT count(*) FROM c) AS n1p_tot,
           |              (SELECT count(*) + 1 FROM voc) AS vp),
           |sc AS (SELECT doc_id, string_split_regex(lower(trim(text)), '\\s+') AS w
           |       FROM documents$scoreWhere),
           |sbg AS (SELECT doc_id, bg.ar AS ar, bg.br AS br FROM (
           |  SELECT doc_id, unnest([struct_pack(ar := w[i], br := w[i+1])
           |                         for i in range(1, len(w))]) AS bg
           |  FROM sc WHERE len(w) >= 2)),
           |smap AS (SELECT doc_id, coalesce(va.tok, '<unk>') AS a,
           |                coalesce(vb.tok, '<unk>') AS b
           |         FROM sbg LEFT JOIN voc va ON sbg.ar = va.tok
           |                  LEFT JOIN voc vb ON sbg.br = vb.tok),
           |lp AS (SELECT doc_id, a, b,
           |    CAST(round(ln(CASE WHEN ca.a_cnt IS NOT NULL
           |      THEN (greatest(coalesce(c.ab_cnt, 0) - 0.75, 0.0)
           |            + (0.75 * ca.n1p_a)
           |              * ((coalesce(cb.n1p_b, 0) + 1.0) / (tt.n1p_tot + tt.vp)))
           |           / ca.a_cnt
           |      ELSE (coalesce(cb.n1p_b, 0) + 1.0) / (tt.n1p_tot + tt.vp)
           |      END), 6) AS DECIMAL(24,6)) AS lp
           |  FROM smap LEFT JOIN c USING (a, b) LEFT JOIN ca USING (a)
           |       LEFT JOIN cb USING (b) CROSS JOIN tt)
           |SELECT doc_id, count(*) AS n_bigrams,
           |  CAST(sum(CASE WHEN a = '<unk>' OR b = '<unk>' THEN 1 ELSE 0 END)
           |    AS BIGINT) AS n_oov_bg,
           |  round(exp(-(sum(lp)::DOUBLE) / count(*)), 4) AS ppl
           |FROM lp GROUP BY doc_id ORDER BY doc_id""".stripMargin

  /** Q206 (T20, interpolated Kneser–Ney bigram perplexity): the KenLM
    * smoother CCNet filters with — absolute discount + continuation-count
    * backoff + hapax→`<unk>` vocabulary ([[graft.ext.KneserNey]]). The
    * model fits on a 50-document slice with a deliberately high frequency
    * threshold so the gate exercises every path: seen bigrams (the
    * discounted term), unseen bigrams over seen contexts (the λ(a)·Pcont
    * interpolation), and OOV tokens (the `<unk>` mapping — n_oov_bg is a
    * transparency column). Full oracle: DuckDB recomputes vocabulary,
    * all four count tables, the bit-identical ln P expression tree, the
    * DECIMAL(24,6) sums, and the rounded perplexities end-to-end. */
  val q206 = GQuery("q206_kneser_ney_ppl", (s, d) => {
    import graft.ext.KneserNey
    val docs = t(s, d, "documents").select(col("doc_id"), col("text"))
    val model = KneserNey.fit(docs.filter(col("doc_id") < 50),
      "doc_id", "text", minCount = 30, discount = 0.75)
    KneserNey.perplexity(docs, "doc_id", "text", model)
      .orderBy("doc_id")
  }, Some(knOracleSql("")))

  /** Q207 (T21, C4 line-level filters): the C4 cleaning battery
    * ([[graft.ext.C4Filters]], Raffel 2020 §2.2) — line-level terminal
    * punctuation / word-count / javascript rules plus page-level
    * lorem-ipsum / curly-brace / min-surviving-lines votes, emitting the
    * EDITED text. The synthetic corpus is single-line and punctuation-free,
    * so the gate derives a deterministic multi-line input in-plan on BOTH
    * engines — 6-token chunks sealed with ".\n" (leaving an unterminated
    * remainder line), a too-short punctuated line prepended on doc_id%83,
    * "lorem ipsum" / "{" injected on doc_id%97 / %89 — so every rule path
    * fires. Whole operator is one codegen'd projection (split → array
    * filter → array_join, no explode, no shuffle; C4FiltersSpec asserts
    * the exchange-free plan); oracle rebuilds the same input with RE2
    * syntax and md5-hashes the same edited text. */
  val q207 = GQuery("q207_c4_line_filters", (s, d) => {
    import graft.ext.C4Filters
    val docs = t(s, d, "documents")
    val t0 = concat(col("text"),
      when(col("doc_id") % 97 === 0, lit(" lorem ipsum")).otherwise(lit("")),
      when(col("doc_id") % 89 === 0, lit(" {")).otherwise(lit("")))
    val chunked = regexp_replace(t0,
      "(\\S+ \\S+ \\S+ \\S+ \\S+ \\S+) ", "$1.\n")
    val input = concat(
      when(col("doc_id") % 83 === 0, lit("short.\n")).otherwise(lit("")),
      chunked)
    C4Filters.c4Filter(docs.withColumn("c4_input", input),
        "doc_id", "c4_input")
      .select(col("doc_id"), col("n_lines"), col("n_kept"), col("keep"),
        md5(col("filtered_text")).as("filtered_md5"))
      .orderBy("doc_id")
  },
    Some("""WITH base AS (SELECT doc_id, text ||
           |    CASE WHEN doc_id % 97 = 0 THEN ' lorem ipsum' ELSE '' END ||
           |    CASE WHEN doc_id % 89 = 0 THEN ' {' ELSE '' END AS t0
           |  FROM documents),
           |inp AS (SELECT doc_id,
           |    CASE WHEN doc_id % 83 = 0 THEN 'short.' || chr(10) ELSE '' END ||
           |    regexp_replace(t0, '(\S+ \S+ \S+ \S+ \S+ \S+) ',
           |                   '\1.' || chr(10), 'g') AS t
           |  FROM base),
           |f AS (SELECT doc_id, t, string_split(t, chr(10)) AS ls,
           |    [l for l in string_split(t, chr(10))
           |     if regexp_matches(rtrim(l), '[.!?"]$')
           |        AND len(string_split_regex(trim(l), '\s+')) >= 5
           |        AND trim(l) <> ''
           |        AND instr(lower(l), 'javascript') = 0] AS kept
           |  FROM inp)
           |SELECT doc_id, CAST(len(ls) AS INT) AS n_lines,
           |  CAST(len(kept) AS INT) AS n_kept,
           |  (len(kept) >= 3 AND instr(lower(t), 'lorem ipsum') = 0
           |   AND instr(t, '{') = 0) AS keep,
           |  md5(coalesce(list_aggregate(kept, 'string_agg', chr(10)), ''))
    AS filtered_md5
           |FROM f ORDER BY doc_id""".stripMargin))

  /** Q208 (R4, exact phrase search over stored positional postings): the
    * proximity layer BM25 postings can't express —
    * [[graft.ext.InvertedIndex.buildPositional]] (one row per token
    * occurrence) persisted term-clustered through IndexStore, then
    * [[graft.ext.InvertedIndex.phraseCount]]: every per-term stream
    * re-keyed to the phrase's would-be start position so all n−1
    * adjacency joins share ONE (doc_id, pos) partitioning, with the
    * phrase's `term IN (...)` pushed into the stored scan (the
    * q187/q191 serving discipline). Gates a 2-term and a 3-term phrase
    * through the same index; memoized per (session, dir) so reps 2+
    * price steady-state. Full oracle: DuckDB rebuilds positions and
    * self-joins adjacency per phrase. */
  val q208 = GQuery("q208_phrase_search", (s, d) => {
    import graft.ext.{IndexStore, InvertedIndex}
    val docs = t(s, d, "documents")
    val pos = InvertedIndex.cachedPositional(
        s.sparkContext.applicationId + ":pos:" + d) {
      val dir = sys.props("java.io.tmpdir") +
        s"/graft_idx/pos_${Registry.pathKey(d)}"
      IndexStore.writePositional(
        InvertedIndex.buildPositional(docs, "doc_id", "text"), dir)
      IndexStore.loadPositional(s, dir)
    }
    val p2 = InvertedIndex.phraseCount(pos, Seq("value", "table"))
      .select(lit("value table").as("phrase"), col("doc_id"), col("n_occ"))
    val p3 = InvertedIndex.phraseCount(pos, Seq("a", "row", "fast"))
      .select(lit("a row fast").as("phrase"), col("doc_id"), col("n_occ"))
    p2.unionAll(p3).orderBy("phrase", "doc_id")
  },
    Some("""WITH tok AS (SELECT doc_id,
           |    string_split_regex(lower(trim(text)), '\s+') AS w
           |  FROM documents),
           |pos AS (SELECT doc_id, p.term AS term, p.pos AS pos FROM (
           |  SELECT doc_id, unnest([struct_pack(term := w[i], pos := i - 1)
           |                         for i in range(1, len(w) + 1)]) AS p
           |  FROM tok)),
           |m2 AS (SELECT p0.doc_id, count(*) AS n_occ
           |  FROM pos p0 JOIN pos p1
           |    ON p1.doc_id = p0.doc_id AND p1.pos = p0.pos + 1
           |  WHERE p0.term = 'value' AND p1.term = 'table'
           |  GROUP BY p0.doc_id),
           |m3 AS (SELECT p0.doc_id, count(*) AS n_occ
           |  FROM pos p0 JOIN pos p1
           |    ON p1.doc_id = p0.doc_id AND p1.pos = p0.pos + 1
           |  JOIN pos p2 ON p2.doc_id = p0.doc_id AND p2.pos = p0.pos + 2
           |  WHERE p0.term = 'a' AND p1.term = 'row' AND p2.term = 'fast'
           |  GROUP BY p0.doc_id)
           |SELECT phrase, doc_id, n_occ FROM (
           |  SELECT 'value table' AS phrase, doc_id, n_occ FROM m2
           |  UNION ALL SELECT 'a row fast', doc_id, n_occ FROM m3)
           |ORDER BY phrase, doc_id""".stripMargin))

  /** Q209 (A23, count–min sketch): approximate frequencies for every
    * key in d·w counters ([[graft.ext.CountMin]], Cormode &
    * Muthukrishnan 2005) — the mergeable point-query twin of q198's
    * exact Misra–Gries. Width 64 over the corpus vocabulary forces real
    * collisions, so the gate shows genuine one-sided error: per token,
    * the true count, the sketch estimate, and the never-undercounts
    * boolean. The hash family is the portable md5 draw salted by row
    * index, so DuckDB rebuilds the IDENTICAL sketch cells and the
    * compare is exact sketch equality, not a loose contract. */
  val q209 = GQuery("q209_count_min", (s, d) => {
    import graft.ext.{CountMin, TextPrep}
    val toks = t(s, d, "documents")
      .select(explode(TextPrep.tokens(col("text"))).as("token"))
    val sk = CountMin.sketch(toks, "token", depth = 4, width = 64)
    val truth = toks.groupBy("token").agg(count(lit(1)).as("true_cnt"))
    CountMin.estimate(sk, truth, "token", depth = 4, width = 64)
      .join(truth, Seq("token"))
      .select(col("token"), col("true_cnt"), col("est_cnt"),
        (col("est_cnt") >= col("true_cnt")).as("no_undercount"))
      .orderBy("token")
  },
    Some("""WITH tok AS (SELECT unnest(string_split_regex(lower(trim(text)), '\s+'))
           |              AS token FROM documents),
           |rows_ AS (SELECT unnest(range(0, 4)) AS row_id),
           |cells AS (SELECT r.row_id,
           |    ('0x' || substring(md5(r.row_id::VARCHAR || '|' || t.token), 1, 8))
           |      ::BIGINT % 64 AS bucket
           |  FROM tok t CROSS JOIN rows_ r),
           |sk AS (SELECT row_id, bucket, count(*) AS cnt
           |       FROM cells GROUP BY row_id, bucket),
           |truth AS (SELECT token, count(*) AS true_cnt FROM tok GROUP BY token),
           |qc AS (SELECT t.token, r.row_id,
           |    ('0x' || substring(md5(r.row_id::VARCHAR || '|' || t.token), 1, 8))
           |      ::BIGINT % 64 AS bucket
           |  FROM truth t CROSS JOIN rows_ r),
           |est AS (SELECT qc.token, min(coalesce(sk.cnt, 0)) AS est_cnt
           |  FROM qc LEFT JOIN sk USING (row_id, bucket) GROUP BY qc.token)
           |SELECT token, true_cnt, est_cnt,
           |  est_cnt >= true_cnt AS no_undercount
           |FROM est JOIN truth USING (token) ORDER BY token""".stripMargin))

  /** Q210 (P8, leakage-safe grouped split): train/val/test drawn on the
    * near-dup CLUSTER representative ([[graft.ext.Curate
    * .leakageSafeSplit]]) so near-duplicates never straddle an eval
    * boundary — the contamination mode a per-document draw (q43) cannot
    * prevent. Oracle: the q64 exact-Jaccard + recursive-CTE component
    * machinery (LSH candidates are exact-verified, so emitted components
    * coincide), then the q43 portable md5 thresholds on the
    * representative. Hash-exact per document: (doc_id, rep, split). */
  val q210 = GQuery("q210_leakage_safe_split", (s, d) =>
    graft.ext.Curate.leakageSafeSplit(t(s, d, "documents"), "doc_id", "text",
        threshold = 0.8, weights = Seq(("train", 8), ("val", 1), ("test", 1)))
      .orderBy("doc_id"),
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
            |r2 AS (SELECT d.doc_id, coalesce(c.component, d.doc_id) AS rep
            |       FROM documents d LEFT JOIN comp c ON c.node = d.doc_id)
            |SELECT doc_id, rep, CASE
            |    WHEN substr(md5(CAST(rep AS VARCHAR)), 1, 8) < 'cccccccc' THEN 'train'
            |    WHEN substr(md5(CAST(rep AS VARCHAR)), 1, 8) < 'e6666666' THEN 'val'
            |    ELSE 'test' END AS split
            |FROM r2 ORDER BY doc_id""".stripMargin))

  /** Q211 (R5, MMR diversified re-ranking): Maximal Marginal Relevance
    * ([[graft.ext.Mmr]], Carbonell & Goldstein 1998) over the brute-force
    * dense top-30 for one probe — the serving stack's diversity layer.
    * The greedy is inherently sequential and runs driver-side over the
    * retrieved (bounded) candidate list, so this is a CONTRACT gate (the
    * q201 class): the plan recomputes (a) result size and distinctness,
    * (b) the first selection = the relevance argmax (λ weighs nothing at
    * step 1), and (c) λ=1 degrades EXACTLY to the plain (rel desc, id)
    * top-k — all stated as constants by the oracle. The diversity
    * semantics (duplicate exclusion, tie-breaks, reference equality)
    * are MmrSpec-held. */
  val q211 = GQuery("q211_mmr_rerank", (s, d) => {
    import graft.ext.{Mmr, Similarity}
    import org.apache.spark.sql.expressions.Window
    val e = t(s, d, "embeddings")
    val probes = e.where(col("vec_id") === 0)
      .select(col("vec_id").as("probe_id"), col("embedding").as("pv"))
    val cands = Similarity.bruteForceTopK(e, probes, "vec_id", "embedding",
        "probe_id", "pv", 30)
      .join(e.select(col("vec_id"), col("embedding")), Seq("vec_id"))
    val mmr = Mmr.rerank(s, cands, "vec_id", "cos_sim", "embedding",
      k = 10, lambda = 0.7)
    val mmr1 = Mmr.rerank(s, cands, "vec_id", "cos_sim", "embedding",
      k = 10, lambda = 1.0)
    val top = cands
      .withColumn("rank", row_number().over(
        Window.orderBy(col("cos_sim").desc, col("vec_id"))))
      .filter(col("rank") <= 10)
      .select(col("rank"), col("vec_id").as("top_id"))
    val lambda1Ok = mmr1.join(top,
        mmr1("rank") === top("rank") && mmr1("vec_id") === top("top_id"))
      .agg((count(lit(1)) === 10).as("ok"))
    val firstOk = mmr.filter(col("rank") === 1)
      .join(top.filter(col("rank") === 1),
        mmr("vec_id") === top("top_id"))
      .agg((count(lit(1)) === 1).as("ok"))
    mmr.agg(count(lit(1)).as("n_results"),
        (count_distinct(col("vec_id")) === 10).as("distinct_ok"))
      .crossJoin(firstOk.select(col("ok").as("first_is_max_rel")))
      .crossJoin(lambda1Ok.select(col("ok").as("lambda1_topk_ok")))
  },
    Some("""SELECT CAST(10 AS BIGINT) AS n_results, true AS distinct_ok,
           |  true AS first_is_max_rel, true AS lambda1_topk_ok""".stripMargin))

  /** Q212 (N13, contrastive pair mining): per-anchor positives (same
    * label) and HARD negatives (different label, most similar) for
    * contrastive embedding training ([[graft.ext.ContrastiveMining]]).
    * Three anchors, kPos=4 / kNeg=8 (asymmetric on purpose — the knobs
    * are real). Full oracle: the q24 cosine SQL + label roles + the
    * per-(anchor, role) rank windows, hash-exact. */
  val q212 = GQuery("q212_contrastive_pairs", (s, d) => {
    import graft.ext.ContrastiveMining
    val e = t(s, d, "embeddings")
    val anchors = e.where(col("vec_id") < 3)
      .select(col("vec_id").as("probe_id"), col("embedding").as("pv"),
        col("label").as("probe_label"))
    ContrastiveMining.minePairs(e, anchors, "vec_id", "embedding", "label",
        "probe_id", "pv", "probe_label", kPos = 4, kNeg = 8)
      .orderBy("probe_id", "role", "rank")
  },
    Some("""WITH e AS (SELECT vec_id, label,
           |             CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
           |a AS (SELECT vec_id AS probe_id, label AS probe_label, v AS pv
           |      FROM e WHERE vec_id < 3),
           |s AS (SELECT probe_id, vec_id,
           |        CASE WHEN label = probe_label THEN 'positive'
           |             ELSE 'hard_negative' END AS role,
           |        round(list_inner_product(v, pv) /
           |              (sqrt(list_inner_product(v, v))
           |               * sqrt(list_inner_product(pv, pv))), 6) AS cos_sim
           |      FROM e, a WHERE vec_id <> probe_id),
           |r AS (SELECT *, row_number() OVER (PARTITION BY probe_id, role
           |        ORDER BY cos_sim DESC, vec_id) AS rank FROM s)
           |SELECT probe_id, role, CAST(rank AS INT) AS rank, vec_id, cos_sim
           |FROM r
           |WHERE rank <= CASE WHEN role = 'positive' THEN 4 ELSE 8 END
           |ORDER BY probe_id, role, rank""".stripMargin))

  /** Q213 (D15, winnowing fingerprints): the MOSS selection
    * ([[graft.ext.Winnowing]], Schleimer 2003) — rightmost-minimal
    * k-gram hash per window, k=3 / w=4, portable md5 hashes. The Spark
    * side is the map-only array form (one codegen'd projection, nothing
    * shuffles before the explode); the oracle recomputes the identical
    * selection RELATIONALLY (band-join windows) — two independent
    * formulations of the algorithm hash-matching is the strongest
    * equivalence check in the suite. */
  val q213 = GQuery("q213_winnowing_fingerprints", (s, d) =>
    graft.ext.Winnowing.fingerprints(t(s, d, "documents"), "doc_id", "text",
        k = 3, w = 4)
      .orderBy("doc_id", "fp_pos", "fp_hash"),
    Some("""WITH tok AS (SELECT doc_id,
           |    string_split_regex(lower(trim(text)), '\s+') AS t FROM documents),
           |hs AS (SELECT doc_id, g.pos AS pos, g.h AS h, len(t) - 2 AS n FROM (
           |  SELECT doc_id, t, unnest([struct_pack(pos := i,
           |      h := ('0x' || substring(md5(t[i] || ' ' || t[i+1] || ' ' || t[i+2]),
           |                              1, 8))::BIGINT)
           |    for i in range(1, len(t) - 1)]) AS g
           |  FROM tok WHERE len(t) >= 3)),
           |ws AS (SELECT doc_id, pos AS s FROM hs
           |       WHERE pos <= CASE WHEN n >= 4 THEN n - 3 ELSE 1 END),
           |win AS (SELECT w.doc_id, w.s, min(b.h) AS m
           |        FROM ws w JOIN hs b ON b.doc_id = w.doc_id
           |             AND b.pos BETWEEN w.s AND w.s + 3
           |        GROUP BY w.doc_id, w.s),
           |sel AS (SELECT w.doc_id, max(b.pos) AS fp_pos, w.m AS fp_hash
           |        FROM win w JOIN hs b ON b.doc_id = w.doc_id
           |             AND b.pos BETWEEN w.s AND w.s + 3 AND b.h = w.m
           |        GROUP BY w.doc_id, w.s, w.m)
           |SELECT DISTINCT doc_id, CAST(fp_pos AS INT) AS fp_pos, fp_hash
           |FROM sel ORDER BY doc_id, fp_pos, fp_hash""".stripMargin))

  /** Q214 (D15′, winnowing overlap pairs): documents ranked by shared
    * fingerprints after the promiscuous-hash guard (maxDf=20 — the q200
    * basket cap applied to fingerprint df), top-50 on a total order.
    * The passage-provenance query a corpus audit actually asks. */
  val q214 = GQuery("q214_winnowing_overlap", (s, d) => {
    val fps = graft.ext.Winnowing.fingerprints(t(s, d, "documents"),
      "doc_id", "text", k = 3, w = 4)
    graft.ext.Winnowing.overlapPairs(fps, maxDf = 20, topN = 50)
  },
    Some("""WITH tok AS (SELECT doc_id,
           |    string_split_regex(lower(trim(text)), '\s+') AS t FROM documents),
           |hs AS (SELECT doc_id, g.pos AS pos, g.h AS h, len(t) - 2 AS n FROM (
           |  SELECT doc_id, t, unnest([struct_pack(pos := i,
           |      h := ('0x' || substring(md5(t[i] || ' ' || t[i+1] || ' ' || t[i+2]),
           |                              1, 8))::BIGINT)
           |    for i in range(1, len(t) - 1)]) AS g
           |  FROM tok WHERE len(t) >= 3)),
           |ws AS (SELECT doc_id, pos AS s FROM hs
           |       WHERE pos <= CASE WHEN n >= 4 THEN n - 3 ELSE 1 END),
           |win AS (SELECT w.doc_id, w.s, min(b.h) AS m
           |        FROM ws w JOIN hs b ON b.doc_id = w.doc_id
           |             AND b.pos BETWEEN w.s AND w.s + 3
           |        GROUP BY w.doc_id, w.s),
           |sel AS (SELECT w.doc_id, max(b.pos) AS fp_pos, w.m AS fp_hash
           |        FROM win w JOIN hs b ON b.doc_id = w.doc_id
           |             AND b.pos BETWEEN w.s AND w.s + 3 AND b.h = w.m
           |        GROUP BY w.doc_id, w.s, w.m),
           |fps AS (SELECT DISTINCT doc_id, fp_hash FROM sel),
           |keep AS (SELECT fp_hash FROM fps GROUP BY fp_hash
           |         HAVING count(*) <= 20),
           |pr AS (SELECT a.doc_id AS id_a, b.doc_id AS id_b,
           |         count(*) AS shared
           |       FROM fps a JOIN keep k ON a.fp_hash = k.fp_hash
           |            JOIN fps b ON b.fp_hash = a.fp_hash
           |             AND a.doc_id < b.doc_id
           |       GROUP BY a.doc_id, b.doc_id)
           |SELECT id_a, id_b, shared FROM pr
           |ORDER BY shared DESC, id_a, id_b LIMIT 50""".stripMargin))

  /** Q215 (T20′, increment scoring against a STORED Kneser–Ney LM): the
    * serving form of q206 (the q194/q190 lifecycle discipline) — the LM
    * persists through `IndexStore` kind=knlm and reloads across JVMs;
    * only the increment (the last 50 docs, standing in for tonight's
    * crawl) is ever tokenized, and scores are comparable across
    * increments because the model is frozen. Memoized per (session,
    * dir): rep 1 pays fit+store+load, reps 2+ price the steady state.
    * Full oracle: the q206 SQL with the scoring stream sliced to the
    * increment. */
  val q215 = GQuery("q215_kneser_ney_stored", (s, d) => {
    import graft.ext.{IndexStore, KneserNey}
    val docs = t(s, d, "documents").select(col("doc_id"), col("text"))
    val model = KneserNey.cached(s.sparkContext.applicationId + ":knlm:" + d) {
      val dir = sys.props("java.io.tmpdir") +
        s"/graft_idx/knlm_${Registry.pathKey(d)}"
      IndexStore.writeKnlm(KneserNey.fit(docs.filter(col("doc_id") < 50),
        "doc_id", "text", minCount = 30, discount = 0.75), dir)
      IndexStore.loadKnlm(s, dir)
    }
    KneserNey.perplexity(docs.filter(col("doc_id") >= 450), "doc_id", "text",
        model)
      .orderBy("doc_id")
  }, Some(knOracleSql(" WHERE doc_id >= 450")))

  /** Q216 (T22, Aho–Corasick multi-pattern scan): the blocklist
    * primitive ([[graft.ext.MultiPattern]]) — P patterns in one pass,
    * O(n + matches), vs P stacked contains. The pattern set mixes
    * single tokens, multi-word phrases, an intra-word substring ("tab"
    * inside "table" — substring semantics, same as instr), and an
    * absent entry. Full oracle: documents × pattern VALUES where
    * `instr(lower(text), p) > 0` — semantics exactly equal by
    * construction, so the automaton is fully auditable in SQL. */
  val q216 = GQuery("q216_multi_pattern", (s, d) => {
    import graft.ext.MultiPattern
    MultiPattern.matches(t(s, d, "documents"), "doc_id", "text",
        Seq("lorem ipsum", "slow hash", "scan", "tab", "value table",
          "zzz-absent"))
      .orderBy("doc_id", "pattern")
  },
    Some("""WITH pats AS (SELECT * FROM (VALUES ('lorem ipsum'), ('slow hash'),
           |    ('scan'), ('tab'), ('value table'), ('zzz-absent')) t(pattern))
           |SELECT doc_id, pattern FROM documents, pats
           |WHERE instr(lower(text), pattern) > 0
           |ORDER BY doc_id, pattern""".stripMargin))

  /** Q217 (A24, mergeable sampled quantiles): per-event-type p50/p95
    * from a bottom-k portable-draw row sample
    * ([[graft.ext.SampleQuantiles]] over the custom
    * [[org.apache.spark.sql.graft.BottomKSampleAgg]]
    * TypedImperativeAggregate — state capped at k pairs inside the
    * aggregation buffer). The sample is a pure function of the input
    * set, so DuckDB recomputes the IDENTICAL sample and quantiles —
    * hash-exact, not a tolerance contract. The gate also proves the
    * sketch property in-plan: odd/even-shard sketches merged through
    * [[graft.ext.SampleQuantiles.mergeStates]] equal the whole-stream
    * sketch (`merge_ok`, stated true by the oracle). */
  val q217 = GQuery("q217_sample_quantiles", (s, d) => {
    import graft.ext.SampleQuantiles._
    val ev = t(s, d, "events")
      .select(col("event_id"), col("event_type"), col("value"))
    val whole = ev.groupBy("event_type")
      .agg(bottomK(draw(col("event_id")), col("value"), 100).as("state"))
    val sharded = ev.withColumn("__sh", col("event_id") % 2)
      .groupBy("event_type", "__sh")
      .agg(bottomK(draw(col("event_id")), col("value"), 100).as("st"))
      .groupBy("event_type").agg(collect_list(col("st")).as("sts"))
      .select(col("event_type"), mergeStates(col("sts"), 100).as("mstate"))
    whole.join(sharded, Seq("event_type"))
      .select(col("event_type"), size(col("state")).as("n_sample"),
        round(quantile(col("state"), 0.5), 6).as("p50_s"),
        round(quantile(col("state"), 0.95), 6).as("p95_s"),
        (col("state") === col("mstate")).as("merge_ok"))
      .orderBy("event_type")
  },
    Some("""WITH dr AS (SELECT event_type,
           |    ('0x' || substring(md5(CAST(event_id AS VARCHAR)), 1, 8))::BIGINT AS d,
           |    value FROM events),
           |rk AS (SELECT *, row_number() OVER (PARTITION BY event_type
           |         ORDER BY d, value) AS rn FROM dr),
           |sm AS (SELECT event_type, list(value ORDER BY value) AS vs,
           |         count(*) AS n
           |       FROM rk WHERE rn <= 100 GROUP BY event_type)
           |SELECT event_type, CAST(n AS INT) AS n_sample,
           |  round(vs[greatest(1, CAST(ceil(0.5 * n) AS INT))], 6) AS p50_s,
           |  round(vs[greatest(1, CAST(ceil(0.95 * n) AS INT))], 6) AS p95_s,
           |  true AS merge_ok
           |FROM sm ORDER BY event_type""".stripMargin))

  val all: Seq[GQuery] = Seq(q206, q207, q208, q209, q210, q211, q212,
    q213, q214, q215, q216, q217)
}
