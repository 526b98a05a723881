package graft.ext

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Hybrid retrieval fusion: combine ranked lists from heterogeneous
  * retrievers — sparse lexical (BM25, [[Relevance]] / [[InvertedIndex]])
  * and dense vector (cosine ANN, [[Similarity]] / [[LshIndex]]) — with
  * Reciprocal Rank Fusion (Cormack, Clarke & Büttcher, SIGIR 2009):
  *
  *   rrf(d) = Σ_lists 1 / (k₀ + rank_list(d))        (k₀ = 60)
  *
  * RRF is the standard serving-side fusion for RAG retrieval stacks:
  * score scales of BM25 and cosine are incomparable, ranks are not.
  *
  * == Scale shape ==
  *
  * Fusion operates on ALREADY-TOP-K lists — the expensive work happened
  * inside each retriever on its own scale path (term-pruned postings
  * scans, bucket-pruned LSH). Everything here touches O(Σ k) rows: the
  * rank window runs over a k-row list (single partition BY DESIGN — the
  * input is driver-bounded, the q15 top-k rule does not apply), and the
  * fused aggregate is an O(k) groupBy. Float discipline: per-list
  * reciprocal ranks are rationals rounded to 6 and DECIMAL-summed, so
  * fusion is order-independent and engine-stable.
  */
object HybridRetrieval {

  /** 1-based ranks for a bounded top-k result list, ordered
    * (score desc, id asc) — the deterministic tie-break every ranked gate
    * in the engine uses. Input MUST be a bounded list (≤ k rows); the
    * global window is intentional. */
  def ranked(list: DataFrame, idCol: String, scoreCol: String): DataFrame =
    list.select(col(idCol),
      row_number().over(
        Window.orderBy(col(scoreCol).desc, col(idCol))).as("rnk"))

  /** RRF-fuse ranked lists (each (idCol, "rnk")). Output:
    * (idCol, rrf) — top `topK` by fused score, ties broken by id. */
  def rrfFuse(lists: Seq[DataFrame], idCol: String, topK: Int,
      k0: Int = 60): DataFrame = {
    require(lists.nonEmpty, "need at least one ranked list")
    val all = lists.map(_.select(col(idCol), col("rnk"))).reduce(_ unionAll _)
    all
      .select(col(idCol),
        round(lit(1.0) / (lit(k0) + col("rnk")), 6)
          .cast("decimal(18,6)").as("__rr"))
      .groupBy(col(idCol))
      .agg(sum(col("__rr")).cast("double").as("rrf"))
      .orderBy(col("rrf").desc, col(idCol))
      .limit(topK)
  }
}
