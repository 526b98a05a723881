package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables

/** Round-11 declared queries: the map-only trained-langid serving tier
  * (T1″ — the q228 softmax argmax folded into one in-row expression so
  * Structured Streaming can serve the TRAINED model in append mode), and
  * incremental append for the retrieval indexes (R2′/R4′ — the one index
  * family still build-only after round 10: BM25 tf postings and
  * positional phrase postings, whose model state — df table, N, avgdl —
  * drifts with the corpus, unlike the frozen-parameter ANN appends).
  */
object Round11Queries {

  private def t(s: SparkSession, d: String, n: String): DataFrame = Tables.load(s, d, n)

  /** Q232 (T1″, map-only trained-langid serving): [[graft.ext.LangId
    * .scoreExpr]] — the q228 stored softmax served as ONE in-row
    * expression (hash n-grams to buckets with array HOFs, dot against
    * the L·(B+1) weight LITERAL per label, argmax) — zero exchanges,
    * zero per-row state, which is what lets [[graft.streaming
    * .StreamCurate]] serve the TRAINED tier in append mode where
    * [[graft.ext.LangId.predict]]'s per-document aggregation would be a
    * stateful stage. Correctness is enforced IN-PLAN: every document's
    * map-only verdict is assert_true'd equal to predict's (the
    * EntityResolution guard discipline — any divergence fails the gate
    * loudly), which reduces the OUTPUT to corpus facts the oracle
    * recomputes independently: per-label document counts and the
    * scored count (= documents with non-NULL text; even the empty
    * string produces one feature row, so only NULL text goes unscored).
    * LangIdSpec pins scoreExpr ≡ predict prediction-for-prediction,
    * including the empty/whitespace/repeated-run edge cases. */
  val q232 = GQuery("q232_langid_serve", (s, d) => {
    import graft.ext.LangId
    val m = Round10Queries.langidModel(s, d)
    val docs = t(s, d, "documents")
    val preds = LangId.predict(m, docs.select(col("doc_id"), col("text")),
      "doc_id", "text")
    docs.select(col("doc_id"), col("lang"),
        LangId.scoreExpr(m, col("text")).as("__pm"))
      .join(preds, Seq("doc_id"), "left")
      .where(assert_true(col("__pm") <=> col("pred_lang"),
        lit("map-only langid diverged from predict")).isNull)
      .groupBy(col("lang"))
      .agg(count(lit(1)).as("n_docs"),
        sum(when(col("__pm").isNotNull, 1L).otherwise(0L)).as("n_scored"))
      .orderBy("lang")
  },
    Some("""SELECT lang, CAST(count(*) AS BIGINT) AS n_docs,
           |       CAST(count(text) AS BIGINT) AS n_scored
           |FROM documents GROUP BY lang ORDER BY lang""".stripMargin))

  /** Q233 (R2′, incremental BM25 index append): the build-once/append
    * matrix extended to the RETRIEVAL tier — the one family whose model
    * state drifts with the corpus: unlike the frozen-parameter ANN
    * appends, BM25's df table and (N, avgdl) scalars are functions of
    * the whole corpus, so [[graft.ext.IndexStore.appendInverted]] folds
    * them under the MV1 counting discipline (postings + per-increment
    * df rows append; nDocs/sumDl fold additively in meta; the load
    * re-aggregates df vocabulary-sized). Lifecycle: base = all but the
    * newest fifth of documents, built and stored; increment appended;
    * q191's query served through the RELOADED bundle. Append ≡ rebuild
    * exactly (InvertedIndexSpec pins postings, df, scalars, and scores
    * bit-for-bit), so q191's full-corpus oracle carries over verbatim —
    * the gate is hash-exact, not a contract. */
  val q233 = GQuery("q233_bm25_append", (s, d) => {
    import graft.ext.{IndexStore, InvertedIndex}
    val docs = t(s, d, "documents").select(col("doc_id"), col("text"))
    val idx = InvertedIndex.cached(
        s.sparkContext.applicationId + ":invapp:" + d) {
      val maxId = docs.agg(max(col("doc_id"))).head().getLong(0)
      val cut = maxId - maxId / 5
      val dir = sys.props("java.io.tmpdir") +
        s"/graft_idx/invapp_${Registry.pathKey(d)}"
      IndexStore.writeInverted(
        InvertedIndex.build(docs.where(col("doc_id") < cut),
          "doc_id", "text"), dir)
      IndexStore.appendInverted(docs.where(col("doc_id") >= cut),
        "doc_id", "text", dir)
      IndexStore.loadInverted(s, dir)
    }
    InvertedIndex.bm25(idx, Seq("spark", "window", "hash"), topK = 20)
  }, Round7Queries.q191.oracle)

  /** Q234 (R4′, incremental positional-postings append): the phrase
    * index under the same lifecycle — the positional layout carries no
    * model state at all, so [[graft.ext.IndexStore.appendPositional]]
    * is a pure clustered row append and append ≡ rebuild is a row-set
    * union (InvertedIndexSpec). q208's two phrases served through the
    * base+increment bundle, against q208's full-corpus oracle. */
  val q234 = GQuery("q234_phrase_append", (s, d) => {
    import graft.ext.{IndexStore, InvertedIndex}
    val docs = t(s, d, "documents")
    val pos = InvertedIndex.cachedPositional(
        s.sparkContext.applicationId + ":posapp:" + d) {
      val maxId = docs.agg(max(col("doc_id"))).head().getLong(0)
      val cut = maxId - maxId / 5
      val dir = sys.props("java.io.tmpdir") +
        s"/graft_idx/posapp_${Registry.pathKey(d)}"
      IndexStore.writePositional(
        InvertedIndex.buildPositional(docs.where(col("doc_id") < cut),
          "doc_id", "text"), dir)
      IndexStore.appendPositional(docs.where(col("doc_id") >= cut),
        "doc_id", "text", dir)
      IndexStore.loadPositional(s, dir)
    }
    val p2 = InvertedIndex.phraseCount(pos, Seq("value", "table"))
      .select(lit("value table").as("phrase"), col("doc_id"), col("n_occ"))
    val p3 = InvertedIndex.phraseCount(pos, Seq("a", "row", "fast"))
      .select(lit("a row fast").as("phrase"), col("doc_id"), col("n_occ"))
    p2.unionAll(p3).orderBy("phrase", "doc_id")
  }, Round7bQueries.q208.oracle)

  val all: Seq[GQuery] = Seq(q232, q233, q234)
}
