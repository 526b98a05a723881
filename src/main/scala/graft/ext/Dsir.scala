package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** DSIR — Data Selection with Importance Resampling (Xie et al. 2023,
  * arXiv:2302.03169): pick the raw-corpus documents whose hashed-n-gram
  * distribution looks most like a small target corpus. The method behind
  * "select crawl data that resembles Wikipedia" in recent LM data
  * pipelines, and the natural next step after the rule-based filters
  * ([[TextQuality]]) and dedup families already in this package: rules
  * say what to THROW AWAY, DSIR says what to KEEP.
  *
  * Reference anchor: the reference stack curates `documents`-style
  * corpora with SQL filters only (`/root/reference/scripts/init_db.py:61-96`
  * seeds the tables; no selection op exists there) — this is the
  * training-data-pipeline tier the build brief adds on top.
  *
  * Method (paper §3, hashed n-gram variant — the one DSIR actually ships):
  *  1. Features: unigrams + bigrams of whitespace words, hashed into `B`
  *     buckets. The hash here is the first 8 hex chars of md5 mod B — the
  *     repo's portable-draw discipline ([[Splits.md5Prefix]]), so the
  *     DuckDB oracle recomputes the identical buckets.
  *  2. Fit two bag-of-n-grams multinomials over buckets: p̂_target from
  *     the target slice, p̂_raw from the whole raw stream, both add-α
  *     smoothed.
  *  3. Per-document importance log-weight: Σ over the doc's n-gram
  *     OCCURRENCES of (ln p̂_target[b] − ln p̂_raw[b]).
  *  4. Gumbel top-k resampling (paper §2: sampling without replacement ≡
  *     top-k of log w + Gumbel noise): the noise is a deterministic
  *     Gumbel(0,1) from a salted md5 draw of the id, so selection is a
  *     pure function of the corpus — no rand(), same rows on any cluster.
  *
  * Scale shape (100 TB): two passes over the n-gram stream (model, then
  * score), each a narrow explode→project feeding exactly ONE map-side-
  * combined exchange — the model pass collapses to ≤B rows, the scoring
  * pass to one row per document. The model is a ≤B-row broadcast; no
  * all-pairs, no driver loop, and selection is TakeOrdered(k), never a
  * global sort. B=10⁴ buckets ⇒ the model state is ~100 KB regardless of
  * corpus size.
  *
  * Float discipline: each bucket's log-ratio is one ln-subtract rounded
  * to 6 places and cast DECIMAL(24,6); per-document sums are decimal, so
  * summation order cannot change a result (the q181 rule). The Gumbel
  * key is likewise rounded before the decimal add.
  */
object Dsir {

  /** Whitespace word split shared with the BM25/LM oracles. */
  private def words(textCol: Column): Column =
    split(lower(trim(textCol)), "\\s+")

  /** Per-document hashed n-gram (uni+bi) bucket stream: one row per
    * n-gram OCCURRENCE, carrying `extra` pass-through columns plus
    * `__nng` = the document's total n-gram count (computed BEFORE the
    * explode, so consumers needing normalized counts never re-join or
    * re-aggregate for it). Pure narrow map — no shuffle. */
  def ngramBuckets(docs: DataFrame, idCol: String, textCol: String,
      buckets: Int, extra: Seq[String] = Nil): DataFrame = {
    val ws = words(col(textCol))
    val bis = when(size(ws) >= 2,
      zip_with(slice(ws, lit(1), size(ws) - 1), slice(ws, lit(2), size(ws) - 1),
        (a, b) => concat(a, lit(" "), b)))
      .otherwise(array().cast("array<string>"))
    val cols = col(idCol) +: extra.map(col)
    // Spread the doc stream before the explode (r18): the md5-per-n-gram
    // bucketing is multi-second CPU that otherwise runs single-core on
    // the gate's one-row-group scan; identity at production scale.
    Fanout.spread(docs).select((cols :+ concat(ws, bis).as("__ngs")): _*)
      .select((cols :+ size(col("__ngs")).cast("long").as("__nng") :+
        explode(col("__ngs")).as("__ng")): _*)
      .select((cols :+ col("__nng") :+
        (conv(substring(md5(col("__ng")), 1, 8), 16, 10).cast("long")
          % buckets).as("__bkt")): _*)
  }

  /** Fitted DSIR model: the ≤B-row per-bucket table
    * (__bkt, __rc, __tc, __lr DECIMAL(24,6)) plus the parameters that
    * reconstruct the smoothing default for buckets the model corpus
    * never produced (rc = tc = 0 makes the log-ratio a CONSTANT of the
    * totals — the principled score for an unseen n-gram, which only an
    * INCREMENT being scored against a stored model can hit). */
  final case class Model(weights: DataFrame, buckets: Int, alpha: Double,
      rawN: Long, targetN: Long) {
    def defaultLr: Column =
      round(log(lit(alpha) / (lit(targetN) + lit(alpha) * buckets))
          - log(lit(alpha) / (lit(rawN) + lit(alpha) * buckets)), 6)
        .cast("decimal(24,6)")
  }

  /** The model-pass PLAN (unmaterialized): ONE exchange, ≤B rows out
    * (raw + target counts share it). The two totals come from an
    * unbounded window OVER the ≤B-row bucket table — one task over ≤10⁴
    * rows — NOT a second aggregate, which would re-derive the bucket
    * counts and re-scan the corpus (caught in the first .explain: three
    * scans instead of two). */
  def fitPlan(docs: DataFrame, isTarget: Column, idCol: String,
      textCol: String, buckets: Int = 10000, alpha: Double = 1.0): DataFrame = {
    val ng = ngramBuckets(docs.withColumn("__is_t", isTarget),
      idCol, textCol, buckets, extra = Seq("__is_t"))
    val wAll = org.apache.spark.sql.expressions.Window.orderBy("__bkt")
      .rowsBetween(Long.MinValue, Long.MaxValue)
    ng.groupBy("__bkt").agg(
        count(lit(1)).as("__rc"),
        sum(when(col("__is_t"), 1L).otherwise(0L)).as("__tc"))
      .select(col("__bkt"), col("__rc"), col("__tc"),
        round(log((col("__tc") + alpha)
              / (sum("__tc").over(wAll) + lit(alpha) * buckets))
            - log((col("__rc") + alpha)
              / (sum("__rc").over(wAll) + lit(alpha) * buckets)), 6)
          .cast("decimal(24,6)").as("__lr"))
  }

  /** Materialized model — the build half of build-once/score-many
    * (persist through [[IndexStore.writeDsir]]). One corpus pass. */
  def fit(docs: DataFrame, isTarget: Column, idCol: String,
      textCol: String, buckets: Int = 10000, alpha: Double = 1.0): Model = {
    val spark = docs.sparkSession
    val plan = fitPlan(docs, isTarget, idCol, textCol, buckets, alpha)
    val rows = plan.collect() // ≤B rows — the k-row-centroid class
    val w = spark.createDataFrame(java.util.Arrays.asList(rows: _*), plan.schema)
    val (rn, tn) = rows.foldLeft((0L, 0L)) { case ((r, t), row) =>
      (r + row.getLong(1), t + row.getLong(2))
    }
    Model(w, buckets, alpha, rn, tn)
  }

  /** Score documents under a model plan/table: (idCol, n_ngrams, __logw
    * DECIMAL). Broadcast the ≤B-row model onto the n-gram stream; the
    * groupBy is the pass's one exchange, map-side combined to a row per
    * document. Buckets absent from the model take the smoothing default
    * (left join + coalesce). */
  def scoreWith(model: Model, docs: DataFrame, idCol: String,
      textCol: String): DataFrame = {
    val ng = ngramBuckets(docs, idCol, textCol, model.buckets)
    ng.join(broadcast(model.weights.select(col("__bkt"), col("__lr"))),
        Seq("__bkt"), "left")
      .select(col(idCol), coalesce(col("__lr"), model.defaultLr).as("__lr"))
      .groupBy(col(idCol))
      .agg(count(lit(1)).as("n_ngrams"), sum(col("__lr")).as("__logw"))
  }

  /** Importance log-weights in one plan (model corpus = scored corpus,
    * so every bucket is present and no smoothing default can fire):
    * (idCol, n_ngrams, __logw DECIMAL). `isTarget` marks the
    * target-distribution slice (evaluated per document). */
  def importanceWeights(docs: DataFrame, isTarget: Column, idCol: String,
      textCol: String, buckets: Int = 10000, alpha: Double = 1.0): DataFrame = {
    val lw = fitPlan(docs, isTarget, idCol, textCol, buckets, alpha)
      .select(col("__bkt"), col("__lr"))
    val ng = ngramBuckets(docs, idCol, textCol, buckets)
    ng.join(broadcast(lw), Seq("__bkt"))
      .groupBy(col(idCol))
      .agg(count(lit(1)).as("n_ngrams"), sum(col("__lr")).as("__logw"))
  }

  private val modelCache =
    new Memo[Model](m => { m.weights.unpersist(false); () })

  /** Session-scoped fit-once memo (the [[MinHashIndex.cached]] lifecycle
    * pattern): bench rep 1 pays fit+store+load, reps 2+ price the
    * steady-state increment scoring; bounded LRU ([[Memo]]). */
  def cachedModel(key: String)(build: => Model): Model =
    modelCache(key)(build)

  /** Deterministic Gumbel(0,1) draw from a salted md5 of the id:
    * u = (hash32 + 0.5) / 2^32 ∈ (0,1), g = −ln(−ln u). */
  def gumbelKey(id: Column): Column = {
    val u = (conv(substring(md5(concat(lit("dsir:"), id.cast("string"))),
      1, 8), 16, 10).cast("double") + 0.5) / 4294967296.0
    round(-log(-log(u)), 6).cast("decimal(24,6)")
  }

  /** Gumbel top-k resample over [[importanceWeights]] output:
    * TakeOrdered(k) on (logw + gumbel) desc, id asc. */
  def resample(weights: DataFrame, idCol: String, k: Int): DataFrame =
    weights
      .withColumn("gkey", col("__logw") + gumbelKey(col(idCol)))
      .orderBy(col("gkey").desc, col(idCol))
      .limit(k)
      .select(col(idCol),
        round(col("__logw").cast("double"), 6).as("logw"),
        round(col("gkey").cast("double"), 6).as("gkey"))

  /** End-to-end: weights + resample. */
  def select(docs: DataFrame, isTarget: Column, idCol: String,
      textCol: String, k: Int, buckets: Int = 10000,
      alpha: Double = 1.0): DataFrame =
    resample(importanceWeights(docs, isTarget, idCol, textCol, buckets, alpha),
      idCol, k)
}
