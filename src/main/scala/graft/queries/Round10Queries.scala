package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables

/** Round-10 declared queries: incremental append for the two index
  * families that lacked it — IVF inverted lists and PQ codes — completing
  * the build-once/serve-incrementally matrix (text MinHash q190, graph
  * HNSW q223, hash LSH q225, coarse-quantizer IVF q226, compressed-domain
  * PQ q227).
  */
object Round10Queries {

  private def t(s: SparkSession, d: String, n: String): DataFrame = Tables.load(s, d, n)

  private def probesOf(e: DataFrame): DataFrame =
    e.where(col("vec_id") < 5)
      .select(col("vec_id").as("probe_id"), col("embedding").as("pv"))

  /** Q226 (N6′, incremental IVF append): the q225 lifecycle for the
    * coarse-quantizer family — base index (all but the top-50 ids)
    * Lloyd-trained and written through [[graft.ext.IndexStore]]
    * (kind=ivf), the increment assigned to the FROZEN stored centroids in
    * one broadcast-join map pass and APPENDED to the clustered assignment
    * table ([[graft.ext.IndexStore.appendIvf]] — assignment is a pure
    * per-row argmin, so append ≡ assign-on-rebuild exactly; drift vs
    * retraining is the documented knob), then the q30-family recall
    * contract over the union corpus through the reloaded bundle. */
  val q226 = GQuery("q226_ann_ivf_append", (s, d) => {
    import graft.ext.{IndexStore, IvfIndex, Similarity}
    val e = t(s, d, "embeddings")
    val probes = probesOf(e)
    val idx = IvfIndex.cached(s.sparkContext.applicationId + ":ivfapp:" + d) {
      val maxId = e.agg(max(col("vec_id"))).head().getLong(0)
      val cut = maxId - 49
      val base = e.where(col("vec_id") < cut)
      val built = IvfIndex.buildTrained(base, "vec_id", "embedding",
        nCentroids = 8, lloydIters = 2)
      val dir = sys.props("java.io.tmpdir") +
        s"/graft_idx/ivfapp_${Registry.pathKey(d)}"
      IndexStore.writeIvf(built, dir)
      IvfIndex.drop(built)
      IndexStore.appendIvf(e.where(col("vec_id") >= cut),
        "vec_id", "embedding", dir)
      IndexStore.loadIvf(s, dir)
    }
    val ann = IvfIndex.search(idx, e, probes, "vec_id", "embedding",
      "probe_id", "pv", k = 10, nprobe = 3)
    val exact = Similarity.bruteForceTopK(e, probes, "vec_id", "embedding",
      "probe_id", "pv", 10)
    Similarity.recallContract(ann, exact, "probe_id", "vec_id", k = 10,
      minHits = 2.0)
  }, Some(PipelineQueries.annContractSql))

  /** Q227 (N8′, incremental PQ append): the same lifecycle one tier down
    * the compression ladder — base codebooks trained and written
    * (kind=pq), the increment PQ-ENCODED against the frozen stored
    * codebooks and its (id, codes) rows appended
    * ([[graft.ext.IndexStore.appendPq]] — encoding is a pure per-row
    * per-subspace argmin, so append ≡ encode-on-rebuild exactly; training
    * drift widens ADC noise, which the exact float re-rank tail absorbs),
    * then the recall contract over the union corpus through the reloaded
    * bundle's full-scan ADC search. */
  val q227 = GQuery("q227_ann_pq_append", (s, d) => {
    import graft.ext.{IndexStore, Pq, Similarity}
    val e = t(s, d, "embeddings")
    val probes = probesOf(e)
    val idx = Pq.cached(s.sparkContext.applicationId + ":pqapp:" + d) {
      val maxId = e.agg(max(col("vec_id"))).head().getLong(0)
      val cut = maxId - 49
      val base = e.where(col("vec_id") < cut)
      val built = Pq.build(base, "vec_id", "embedding",
        m = 8, ksub = 16, iters = 2, dim = 64)
      val dir = sys.props("java.io.tmpdir") +
        s"/graft_idx/pqapp_${Registry.pathKey(d)}"
      IndexStore.writePq(built, dir)
      Pq.drop(built)
      IndexStore.appendPq(e.where(col("vec_id") >= cut),
        "vec_id", "embedding", dir)
      IndexStore.loadPq(s, dir)
    }
    val ann = Pq.search(idx, e, probes, "vec_id", "embedding",
      "probe_id", "pv", k = 10)
    val exact = Similarity.bruteForceTopK(e, probes, "vec_id", "embedding",
      "probe_id", "pv", 10)
    Similarity.recallContract(ann, exact, "probe_id", "vec_id", k = 10,
      minHits = 2.0)
  }, Some(PipelineQueries.annContractSql))

  /** Shared train-once memo for the q228 pair: softmax langid fitted on
    * the corpus's own lang labels, stored and reloaded through
    * [[graft.ext.IndexStore]] kind=langid so the serving entry scores
    * with the DURABLE model (the q193_build/q193 lifecycle). */
  private[queries] def langidModel(s: SparkSession, d: String): graft.ext.LangId.Model =
    graft.ext.LangId.cached(s.sparkContext.applicationId + ":langid:" + d) {
      // bounded labeled slice (deterministic): langid models train on a
      // labeled subset, never the whole corpus — the T17/T18 ≤10⁴-row
      // model convention; serving scores every document
      val docs = t(s, d, "documents").where(col("doc_id") < 500)
      val m = graft.ext.LangId.train(docs, "doc_id", "text", "lang",
        buckets = 512, iters = 10, lr = 4.0)
      val dir = sys.props("java.io.tmpdir") +
        s"/graft_idx/langid_${Registry.pathKey(d)}"
      graft.ext.IndexStore.writeLangid(m, dir)
      graft.ext.IndexStore.loadLangid(s, dir)
    }

  /** Q228_BUILD (T1′ fit, priced and gated alone): the softmax language
    * classifier trained in-engine ([[graft.ext.LangId.train]] — the
    * fastText langid architecture over T18's hashed-n-gram features),
    * stored/reloaded kind=langid, summarized by invariants the oracle
    * recomputes from the corpus alone: label universe size, weight-matrix
    * row count (L·(B+1) at B=512), corpus size. */
  val q228b = GQuery("q228_build", (s, d) => {
    val m = langidModel(s, d)
    val nDocs = t(s, d, "documents").count()
    import s.implicits._
    Seq((m.labels.size.toLong, m.labels.size * (m.buckets + 1).toLong, nDocs))
      .toDF("n_labels", "weight_rows", "n_docs")
  },
    Some("""SELECT
           |  (SELECT CAST(count(DISTINCT lang) AS BIGINT)
           |   FROM documents WHERE doc_id < 500) AS n_labels,
           |  (SELECT CAST(count(DISTINCT lang) * 513 AS BIGINT)
           |   FROM documents WHERE doc_id < 500) AS weight_rows,
           |  CAST(count(*) AS BIGINT) AS n_docs FROM documents""".stripMargin))

  /** Q228 (T1′, trained language-ID serving): the marker-word heuristic
    * (q32, kept as the cheap map-only tier) upgraded to the TRAINED
    * classifier — per-document argmax softmax prediction from the stored
    * model, folded through the confusion matrix against the corpus
    * label. Iterative training is not SQL-expressible → the gate states
    * the SERVE-SIDE CONTRACT as a row (the q193 pattern): the matrix
    * accounts for EVERY document (Σ cnt matches DuckDB's corpus count —
    * the LEFT join guarantee: a doc with no feature rows surfaces as a
    * (lang, NULL) cell instead of vanishing), `n_labels` matches
    * DuckDB's distinct-lang count (every true label appears as a matrix
    * row), every prediction is a label the model was TRAINED on (the
    * doc_id < 500 slice's langs — argmax cannot invent a class), and
    * the per-cell heuristic-agreement count never exceeds its cell
    * count. LangIdSpec pins the trainer weight-for-weight against an
    * independent single-node softmax reference. Accuracy caveat: the
    * driver corpus's `lang` label is INDEPENDENT of its text (q32
    * caveat), so the Bayes optimum is the majority class; the spec's
    * disjoint-vocab corpus is where learning is provable. */
  val q228 = GQuery("q228_langid_trained", (s, d) => {
    import graft.ext.{LangId, TextAnalysis}
    val docs = t(s, d, "documents")
    val model = langidModel(s, d)
    val preds = LangId.predict(model,
      docs.select(col("doc_id"), col("text")), "doc_id", "text")
    val trained = model.labels.toSet
    val matrix = docs.select(col("doc_id"), col("lang"),
        TextAnalysis.langId(col("text")).as("__heur"))
      .join(preds, Seq("doc_id"), "left")
      .groupBy(col("lang"), col("pred_lang"))
      .agg(count(lit(1)).as("cnt"),
        sum(when(col("pred_lang") === col("__heur"), 1L).otherwise(0L))
          .as("heur_agree"))
    val inTrained = matrix("pred_lang").isNull ||
      trained.toSeq.map(l => matrix("pred_lang") === l)
        .reduceOption(_ || _).getOrElse(lit(false))
    matrix.agg(sum(col("cnt")).as("n_docs"),
      countDistinct(col("lang")).as("n_labels"),
      (sum(when(inTrained, 0L).otherwise(1L)) === 0L)
        .as("preds_in_trained_labels"),
      (sum(when(col("heur_agree").between(0L, col("cnt")), 0L)
        .otherwise(1L)) === 0L).as("heur_agree_bounded"))
  },
    Some("""SELECT CAST(count(*) AS BIGINT) AS n_docs,
           |  CAST(count(DISTINCT lang) AS BIGINT) AS n_labels,
           |  true AS preds_in_trained_labels,
           |  true AS heur_agree_bounded FROM documents""".stripMargin))

  /** Q229 (G9, incremental connected components): the build-once/append
    * matrix extended to the GRAPH tier — the near-dup cluster table (q56)
    * maintained under an edge increment without re-walking the full pair
    * history. Lifecycle: the q26 MinHash pair set split at doc_id cut
    * (base = both ends below, increment = any end at-or-above — "the
    * newest fifth of the corpus arrived"), base CC stored through
    * [[graft.ext.IndexStore.writeCc]] (kind=cc, node-range-clustered),
    * the increment folded in by [[graft.ext.IndexStore.appendCcEdges]]
    * (slim forwarding deltas + new-node labels appended; base never
    * rewritten — merge-on-read for a graph labeling), then the resolved
    * labeling read back and summarized. Append ≡ rebuild exactly (the
    * contraction argument in [[graft.ext.Clustering.appendEdges]]), so
    * the oracle is q56's: the recursive-CTE closure over the ENTIRE pair
    * set, hash-exact per cluster. */
  val q229 = GQuery("q229_cc_append", (s, d) => {
    import graft.ext.{Clustering, Dedup, IndexStore}
    val labels = Clustering.cached(
        s.sparkContext.applicationId + ":ccapp:" + d) {
      val docs = t(s, d, "documents")
      val pairs = Dedup.minHashLshPairs(docs, "doc_id", "text",
        threshold = 0.8, shingleK = 3, numHashes = 128, bands = 32)
        .localCheckpoint(true)
      val maxId = docs.agg(max(col("doc_id"))).head().getLong(0)
      val cut = maxId - maxId / 5
      val base = pairs.where(col("id_a") < cut && col("id_b") < cut)
      val inc = pairs.where(col("id_a") >= cut || col("id_b") >= cut)
      val dir = sys.props("java.io.tmpdir") +
        s"/graft_idx/ccapp_${Registry.pathKey(d)}"
      IndexStore.writeCc(
        Clustering.connectedComponents(base, "id_a", "id_b"), dir)
      IndexStore.appendCcEdges(inc, "id_a", "id_b", dir)
      IndexStore.loadCc(s, dir).localCheckpoint(true)
    }
    labels.groupBy(col("component").as("rep_id"))
      .agg(count(lit(1)).as("cluster_size"))
      .orderBy("rep_id")
  },
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
            |comp AS (SELECT node, min(r) AS component FROM reach GROUP BY node)
            |SELECT component AS rep_id, count(*) AS cluster_size
            |FROM comp GROUP BY component ORDER BY rep_id""".stripMargin))

  /** Q230 (AN8, deterministic Holt forecast): the chart "Forecast"
    * advanced-analytics surface — monthly revenue per order priority
    * (cents, the q90 DECIMAL discipline) fitted by
    * [[graft.ext.TimeSeries.holtForecast]]'s integer-exact double
    * exponential smoothing and extrapolated 3 periods ahead. The
    * recurrence is pure 64-bit floor-div arithmetic (α = 1/2, β = 1/4),
    * so the DuckDB twin — the same recurrence as a recursive CTE with
    * the identical portable floor-div — must match level, trend, and
    * every ŷ BIT-EXACTLY. Forecasting runs over the already-grouped
    * PERIODS × SERIES result (the q83/q146 rule), never raw facts. */
  val q230 = GQuery("q230_holt_forecast", (s, d) => {
    val monthly = t(s, d, "orders")
      .groupBy(col("o_orderpriority"),
        date_trunc("month", col("o_orderdate")).as("mon"))
      .agg(sum(col("o_totalprice").cast("decimal(18,2)") * 100)
        .cast("long").as("cents"))
    graft.ext.TimeSeries.holtForecast(monthly, Seq("o_orderpriority"),
        "mon", "cents", horizon = 3)
      .select(col("o_orderpriority"), col("level").as("level_cents"),
        col("trend").as("trend_cents"), col("h"),
        col("yhat").as("yhat_cents"))
      .orderBy("o_orderpriority", "h")
  },
    Some("""WITH RECURSIVE m AS (
           |  SELECT o_orderpriority AS pri,
           |         date_trunc('month', o_orderdate) AS mon,
           |         CAST(sum(CAST(o_totalprice AS DECIMAL(18,2)) * 100) AS BIGINT) AS y
           |  FROM orders GROUP BY 1, 2),
           |s AS (SELECT pri, y,
           |        row_number() OVER (PARTITION BY pri ORDER BY mon) AS rn FROM m),
           |n AS (SELECT pri, max(rn) AS tt FROM s GROUP BY pri),
           |rec AS (
           |  SELECT s2.pri, 2 AS rn, s2.y AS level, s2.y - s1.y AS trend
           |  FROM s s1 JOIN s s2 ON s1.pri = s2.pri AND s1.rn = 1 AND s2.rn = 2
           |  UNION ALL
           |  SELECT r.pri, r.rn + 1,
           |         (s.y + r.level + r.trend
           |            - ((((s.y + r.level + r.trend) % 2) + 2) % 2)) // 2 AS lv,
           |         (lv - r.level + 3 * r.trend
           |            - ((((lv - r.level + 3 * r.trend) % 4) + 4) % 4)) // 4
           |  FROM rec r JOIN s ON s.pri = r.pri AND s.rn = r.rn + 1),
           |f AS (SELECT r.pri, r.level, r.trend
           |      FROM rec r JOIN n ON n.pri = r.pri AND r.rn = n.tt)
           |SELECT pri AS o_orderpriority, level AS level_cents,
           |       trend AS trend_cents, CAST(h AS BIGINT) AS h,
           |       level + h * trend AS yhat_cents
           |FROM f CROSS JOIN (VALUES (1), (2), (3)) AS hh(h)
           |ORDER BY o_orderpriority, h""".stripMargin))

  /** Q231 (MV4, MV maintenance under merge-on-read): the incremental
    * materialized view kept correct through a CDC window where the
    * append-only contract breaks — one [[graft.engine.Layout.upsertMor]]
    * commit rewrites every doc_id<50 (and a planted 3-row 'tiny' group)
    * into a new group with doubled n_chars and inserts 20 new keys.
    * [[graft.engine.Mview.refreshMor]] folds the window by the counting
    * algorithm (Gupta 1993): [[graft.engine.Layout.morDeltas]] yields
    * (inserts = added files as visible now, retractions = fromTag's rows
    * ⋉ broadcast new delete keys), retractions enter NEGATED, and the
    * count(*) support column deletes the emptied 'tiny' group exactly as
    * a recompute would. DuckDB recomputes the post-upsert grouped state
    * from the raw table — a scoping or retraction error double-counts or
    * strands the dead group. */
  val q231 = GQuery("q231_mv_mor_refresh", (s, d) => {
    import graft.engine.{Layout, Mview}
    import s.implicits._
    val run = java.util.UUID.randomUUID().toString.replace("-", "").take(8)
    val table = s"mvmor_$run"
    val view = s"mvmorv_$run"
    val docs = t(s, d, "documents").select(col("doc_id"), col("lang"),
      col("n_chars"))
    val syn = Seq((9000001L, "tiny", 11L), (9000002L, "tiny", 12L),
      (9000003L, "tiny", 13L)).toDF("doc_id", "lang", "n_chars")
    docs.unionByName(syn).repartition(4).write.saveAsTable(table)
    val ms = Seq(Mview.Measure("count", None, "n_docs"),
      Mview.Measure("sum", Some("n_chars"), "sum_chars"))
    Mview.create(s, view, table, Seq("lang"), ms)
    val keyed = s.table(table)
      .where(col("doc_id") < 50 || col("doc_id") >= 9000000L)
      .select(col("doc_id"), lit("upserted").as("lang"),
        (col("n_chars") * 2).as("n_chars"))
    val inserts = s.range(1, 21).select((col("id") + 9100000L).as("doc_id"),
      lit("upserted").as("lang"), (col("id") + 777L).as("n_chars"))
    Layout.upsertMor(s, table, keyed.unionByName(inserts), "doc_id")
    Mview.refreshMor(s, view, table, Seq("lang"), ms)
    Mview.read(s, view, Seq("lang"), ms).orderBy("lang")
  },
    Some("""WITH syn AS (SELECT * FROM (VALUES (9000001, 'tiny', 11),
           |    (9000002, 'tiny', 12), (9000003, 'tiny', 13))
           |    t(doc_id, lang, n_chars)),
           |base AS (SELECT doc_id, lang, n_chars FROM documents
           |         UNION ALL SELECT doc_id, lang, n_chars FROM syn),
           |ins AS (SELECT 9100000 + i AS doc_id, 'upserted' AS lang,
           |               777 + i AS n_chars FROM range(1, 21) r(i)),
           |fin AS (
           |  SELECT doc_id, 'upserted' AS lang, n_chars * 2 AS n_chars
           |  FROM base WHERE doc_id < 50 OR doc_id >= 9000000
           |  UNION ALL
           |  SELECT doc_id, lang, n_chars FROM base
           |  WHERE doc_id >= 50 AND doc_id < 9000000
           |  UNION ALL SELECT doc_id, lang, n_chars FROM ins)
           |SELECT lang, CAST(count(*) AS BIGINT) AS n_docs,
           |       CAST(sum(n_chars) AS BIGINT) AS sum_chars
           |FROM fin GROUP BY lang ORDER BY lang""".stripMargin))

  val all: Seq[GQuery] = Seq(q226, q227, q228b, q228, q229, q230, q231)
}
