package graft.ext

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Term-relevance scoring over a document corpus — the retrieval/filter
  * primitive of a training-data pipeline (keyword-targeted subcorpus
  * extraction, query-driven quality slices).
  *
  * BM25 (Robertson/Spärck Jones probabilistic relevance; the Okapi BM25
  * formulation with the +1 idf floor used by Lucene):
  *
  *   score(d, q) = Σ_t idf(t) · tf(t,d)·(k1+1) / (tf(t,d) + k1·(1 − b + b·|d|/avgdl))
  *   idf(t)      = ln( (N − df(t) + 0.5) / (df(t) + 0.5) + 1 )
  *
  * Plan shape (the 100 TB part): document lengths and postings come from ONE
  * pass over the corpus (tokens staged once per row); N and avgdl reduce to
  * a 1-row aggregate crossJoined (broadcast) into the postings; per-term df
  * is a |terms|-row aggregate, also broadcast. The only full-width shuffle
  * is the final per-document score sum, keyed by doc id — everything else is
  * a narrow map or a broadcast of O(|query|) rows. No driver loops, no UDFs.
  */
object Relevance {

  /** Top-`topK` documents by BM25 score for a bag of query `terms`.
    * Output: (idCol, bm25) — score rounded to 6 so cross-engine float
    * noise (sum order) can't reorder the ranking; ties broken by doc id.
    * DuckDB twin documented at the q55 call site. */
  def bm25TopK(docs: DataFrame, idCol: String, textCol: String,
      terms: Seq[String], topK: Int,
      k1: Double = 1.2, b: Double = 0.75): DataFrame = {
    require(terms.nonEmpty, "query terms must be non-empty")
    // One tokenize pass; staged so downstream lambda consumers can't
    // re-evaluate the split per element (TextPrep discipline).
    val toks = docs
      .withColumn("__toks", TextPrep.tokens(col(textCol)))
      .select(col(idCol), col("__toks"), size(col("__toks")).as("dl"))

    val corpusStats = toks.agg(count(lit(1)).as("n_docs"), avg(col("dl")).as("avgdl"))

    val postings = toks
      .select(col(idCol), col("dl"), explode(col("__toks")).as("term"))
      .where(col("term").isin(terms: _*))
      .groupBy(col(idCol), col("dl"), col("term"))
      .agg(count(lit(1)).as("tf"))

    val docFreq = postings.groupBy("term").agg(count(lit(1)).as("df"))

    val scored = postings
      .join(broadcast(docFreq), Seq("term"))
      .crossJoin(broadcast(corpusStats))
      .select(col(idCol),
        (log((col("n_docs") - col("df") + 0.5) / (col("df") + 0.5) + 1.0)
          * (col("tf") * (k1 + 1))
          / (col("tf") + (col("dl") / col("avgdl") * b + (1.0 - b)) * k1)).as("__s"))

    scored.groupBy(col(idCol))
      .agg(round(sum(col("__s")), 6).as("bm25"))
      .orderBy(col("bm25").desc, col(idCol))
      .limit(topK)
  }
}
