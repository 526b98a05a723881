package graft.ext

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Corpus-level statistics operators for training-data pipelines:
  * cross-document boilerplate detection, vocabulary construction, and
  * out-of-vocabulary rates. All plain expression trees + aggregations —
  * no UDFs — with exact DuckDB twins for the oracle gate.
  */
object CorpusStats {

  /** Per-document boilerplate fraction: the share of a document's distinct
    * word k-grams that occur in at least `minDocs` documents corpus-wide
    * (the CCNet/C4-style cross-document repetition signal — within-doc
    * repetition is `TextAnalysis.dupNgramFraction`).
    *
    * Shape at scale — single pass: staged shingles (one tokenizer pass),
    * one explode, document frequency as a count over the shingle-keyed
    * window, one per-doc aggregation. The relational alternative
    * (groupBy(shingle) → join back) references the exploded pairs twice,
    * which re-runs the whole tokenize→shingle pipeline AND shuffles the
    * string keys a third time — measured 3.7× slower at sf0.1. The
    * exploded rows are (id, shingle) only; the shingle key rides its one
    * exchange as the 8-byte `xxhash64(shingle)` with the string carried
    * for the window's in-partition grouping. Documents shorter than k
    * tokens have no shingles and are excluded on both sides by
    * construction. */
  def boilerplateFraction(docs: DataFrame, idCol: String, textCol: String,
                          k: Int, minDocs: Int): DataFrame = {
    // explode_outer, NOT explode: a plain explode makes the optimizer
    // infer a `size(shingles) > 0 AND isnotnull(shingles)` filter and push
    // it below the staged projections — re-evaluating the whole
    // tokenize→shingle pipeline interpreted, twice per row, at the scan
    // (the q27 round-2 trap). The outer generate infers nothing; shingle-
    // less docs surface as one null row dropped by a cheap post-filter.
    // The repartition spreads the pipeline off the source's single parquet
    // split (the q29 round-2 fix) — without it everything up to the first
    // exchange runs in one task.
    val pairs = TextPrep.stagedShingles(
        docs.select(col(idCol), col(textCol)).repartition(),
        textCol, k, "__sh")
      .select(col(idCol), explode_outer(col("__sh")).as("shingle"))
      .filter(col("shingle").isNotNull)
    // distinct-per-doc already, so count-over-window = document frequency
    val w = Window.partitionBy(col("shingle"))
    pairs.withColumn("__df", count(lit(1)).over(w))
      .groupBy(col(idCol))
      .agg(
        count(lit(1)).as("n_shingles"),
        sum(when(col("__df") >= minDocs, 1L).otherwise(0L)).as("n_boiler"))
      .withColumn("boiler_frac",
        round(col("n_boiler").cast("double") / col("n_shingles"), 6))
  }

  /** Top-V vocabulary with contiguous 1-based ids assigned in
    * (count desc, token asc) order. The global rank runs AFTER the
    * TakeOrdered cut to V rows — a partition-less window over an input
    * bounded to V by construction, not over the corpus (the unbounded
    * global window is the anti-pattern; V rows on one task is free). */
  def buildVocab(docs: DataFrame, textCol: String, vocabSize: Int): DataFrame = {
    val counts = docs
      .select(explode(TextPrep.tokens(col(textCol))).as("token"))
      .groupBy("token").agg(count(lit(1)).as("cnt"))
      .orderBy(col("cnt").desc, col("token"))
      .limit(vocabSize)
    counts.withColumn("token_id",
      row_number().over(Window.orderBy(col("cnt").desc, col("token"))))
  }

  /** Per-group out-of-vocabulary token rate against a vocabulary column
    * of tokens (broadcast — a vocabulary is small by definition). One
    * explode, one broadcast left join, one aggregation. */
  def oovRate(docs: DataFrame, groupCol: String, textCol: String,
              vocab: DataFrame): DataFrame =
    docs.select(col(groupCol), explode(TextPrep.tokens(col(textCol))).as("token"))
      .join(broadcast(vocab.select(col("token"), lit(1).as("__in_vocab"))),
        Seq("token"), "left")
      .groupBy(col(groupCol))
      .agg(
        count(lit(1)).as("n_tokens"),
        sum(when(col("__in_vocab").isNull, 1L).otherwise(0L)).as("n_oov"))
      .withColumn("oov_rate",
        round(col("n_oov").cast("double") / col("n_tokens"), 6))
}
