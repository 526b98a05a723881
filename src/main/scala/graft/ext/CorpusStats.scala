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
    * Shape at scale: staged shingles (one tokenizer pass), one explode,
    * one (shingle → document-frequency) aggregation with map-side combine,
    * one hash join back on the shingle, one per-doc aggregation. The
    * shingle join keys here stay strings so the DuckDB oracle can verify
    * them end-to-end; at 100 TB the same plan runs with `xxhash64(shingle)`
    * 8-byte join keys (collision odds ~n²/2⁶⁴) to shrink both exchanges.
    * Documents shorter than k tokens have no shingles and are excluded on
    * both sides by construction. */
  def boilerplateFraction(docs: DataFrame, idCol: String, textCol: String,
                          k: Int, minDocs: Int): DataFrame = {
    val pairs = TextPrep.stagedShingles(docs.select(col(idCol), col(textCol)),
        textCol, k, "__sh")
      .select(col(idCol), explode(col("__sh")).as("shingle"))
    val df = pairs.groupBy(col("shingle"))
      .agg(count(lit(1)).as("__df")) // distinct per doc already
    pairs.join(df, "shingle")
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
