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

  val all: Seq[GQuery] = Seq(q232)
}
