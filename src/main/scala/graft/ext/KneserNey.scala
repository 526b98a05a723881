package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Interpolated Kneser–Ney bigram language model — the model family behind
  * KenLM, i.e. the LM CCNet actually uses for perplexity-based corpus
  * filtering (Wenzek et al. 2020 cite KenLM; Kneser & Ney 1995; Chen &
  * Goodman 1999 for the interpolated form). §2.17's T14 (add-α bigram,
  * `TextQuality.perplexityBuckets`) is the simple smoother; this is the
  * production one: mass freed by an absolute discount D on seen bigrams is
  * redistributed through the CONTINUATION distribution — how many distinct
  * contexts a word follows, not how often it occurs — which is what makes
  * KN the strongest fixed-order n-gram smoother in practice.
  *
  * Model (all quantities over the `<unk>`-mapped training bigram stream):
  *
  *   P(b|a) = (max(c(a,b) − D, 0) + D·N1+(a,·)·Pcont(b)) / c(a,·)
  *   Pcont(b) = (N1+(·,b) + 1) / (N1+(·,·) + V′)
  *
  * where N1+(a,·) = #distinct successors of a, N1+(·,b) = #distinct
  * contexts preceding b, N1+(·,·) = #distinct bigram types, and
  * V′ = |vocab| + 1 (the `<unk>` type). The +1/+V′ on the continuation
  * counts is add-one smoothing of the *continuation* distribution only —
  * it keeps Pcont strictly positive for vocabulary types that never occur
  * in second position (doc-initial-only tokens) while preserving a proper
  * distribution: Σ_b Pcont(b) = (N1+(·,·) + V′)/(N1+(·,·) + V′) = 1, so
  * Σ_b P(b|a) = (c(a,·) − D·N1+(a,·))/c(a,·) + D·N1+(a,·)/c(a,·) = 1
  * exactly (KneserNeySpec asserts this to 1e-9). A context with no
  * training bigrams (c(a,·) = 0 — a vocabulary type that only ever ends
  * documents) backs off fully to Pcont(b).
  *
  * OOV discipline (the KenLM convention): training tokens with unigram
  * count < `minCount` are replaced by `<unk>` BEFORE bigram counting, so
  * `<unk>` has real bigram statistics; at scoring time any token outside
  * the vocabulary maps to `<unk>`. Scoring therefore never needs an
  * ad-hoc floor — every probability is a real model probability.
  *
  * Scale shape (the q181 rule): all model tables are Zipf-bounded
  * aggregates of the training slice — (a,b) counts, per-a context stats,
  * per-b continuation counts, two one-row totals. The corpus-sized scoring
  * stream is built map-only ([[TextQuality.docBigrams]]), joins the
  * finished model tables (AQE broadcasts them at gate SFs; a web-scale
  * pair table flips to shuffle joins with no plan change elsewhere), and
  * collapses through ONE map-side-combined exchange to a row per document.
  * Model state is independent of the scored-corpus size.
  *
  * Float discipline: every per-bigram ln P is a single expression tree
  * over integer counts and the exactly-representable discount (0.75 =
  * 3/4), written in the identical operation order on the DuckDB side —
  * IEEE ops are deterministic, so the doubles match bit-for-bit; they are
  * rounded to 6 dp, summed as DECIMAL(24,6) (exact, order-independent),
  * and the final exp rounds to 4 — the documented q181 discipline.
  *
  * Reference context: /root/reference/compose/init_db.py:348 loads a text
  * corpus a Trino user would quality-filter exactly this way before use.
  */
object KneserNey {

  /** The model: four small DataFrames (lazy — nothing is collected).
    * `lm` (a, b, ab_cnt); `ctx` (a, a_cnt, n1p_a); `cont` (b, n1p_b);
    * `tot` 1×(n1p_tot, vp). */
  final case class Model(lm: DataFrame, ctx: DataFrame, cont: DataFrame,
      tot: DataFrame, vocab: DataFrame, discount: Double)

  private val cache = new Memo[Model](m => {
    m.lm.unpersist(false); m.ctx.unpersist(false); m.cont.unpersist(false)
    m.tot.unpersist(false); m.vocab.unpersist(false); ()
  })

  /** Serving memo — the q78_search semantics (rep 1 pays
    * fit+store+load, reps 2+ price the frozen-model steady state);
    * bounded LRU, eviction unpersists ([[Memo]]). */
  def cached(key: String)(build: => Model): Model = cache(key)(build)

  /** Map a raw token column to the model vocabulary via a left join
    * against `vocab(tok)`; misses become `<unk>`. */
  private def mapTok(df: DataFrame, vocab: DataFrame, rawCol: String,
      outCol: String): DataFrame = {
    val v = vocab.withColumnRenamed("tok", s"__v_$outCol")
    df.join(v, df(rawCol) === v(s"__v_$outCol"), "left")
      .withColumn(outCol, coalesce(col(s"__v_$outCol"), lit("<unk>")))
      .drop(s"__v_$outCol")
  }

  /** Fit the model on a training slice. One corpus-shuffle per count
    * table (each map-side combined); everything downstream of the
    * exchanges is Zipf-bounded. */
  def fit(train: DataFrame, idCol: String, textCol: String,
      minCount: Int = 2, discount: Double = 0.75): Model = {
    require(minCount >= 1, "minCount must be >= 1")
    require(discount > 0 && discount < 1, "discount must be in (0,1)")
    val toks = train
      .select(explode(TextPrep.tokens(col(textCol))).as("tok"))
    val uc = toks.groupBy("tok").agg(count(lit(1)).as("c"))
    val vocab = uc.filter(col("c") >= minCount).select("tok")

    val rawBg = TextQuality.docBigrams(train, idCol, textCol)
    val mapped = mapTok(mapTok(rawBg, vocab, "a", "__a"), vocab, "b", "__b")
      .select(col("__a").as("a"), col("__b").as("b"))
    val lm = mapped.groupBy("a", "b").agg(count(lit(1)).as("ab_cnt"))
    val ctx = lm.groupBy("a")
      .agg(sum(col("ab_cnt")).as("a_cnt"), count(lit(1)).as("n1p_a"))
    val cont = lm.groupBy("b").agg(count(lit(1)).as("n1p_b"))
    val tot = lm.agg(count(lit(1)).as("n1p_tot"))
      .crossJoin(vocab.agg((count(lit(1)) + 1L).as("vp")))
    Model(lm, ctx, cont, tot, vocab, discount)
  }

  /** ln P(b|a) as ONE expression tree over the joined integer count
    * columns — written in the identical operation order as the oracle so
    * the doubles are bit-identical. Null `ab_cnt` = unseen pair; null
    * `a_cnt` = context with no training bigrams (full continuation
    * backoff). */
  private def logProb(d: Double): Column = {
    val pcont = (coalesce(col("n1p_b"), lit(0L)) + lit(1.0)) /
      (col("n1p_tot") + col("vp"))
    val seenCtx = (greatest(coalesce(col("ab_cnt"), lit(0L)) - lit(d), lit(0.0))
      + (lit(d) * col("n1p_a")) * pcont) / col("a_cnt")
    log(when(col("a_cnt").isNotNull, seenCtx).otherwise(pcont))
  }

  /** Score a corpus against a fitted model: per-document
    * (n_bigrams, n_oov_bg, ppl) where ppl = exp(−Σ ln P / n) and
    * n_oov_bg counts bigrams with an `<unk>` on either side. Documents
    * with fewer than two tokens carry no bigrams and are dropped (the
    * docBigrams convention). */
  def perplexity(docs: DataFrame, idCol: String, textCol: String,
      model: Model): DataFrame = {
    val rawBg = TextQuality.docBigrams(docs, idCol, textCol)
    val mapped = mapTok(mapTok(rawBg, model.vocab, "a", "__a"),
        model.vocab, "b", "__b")
      .select(col(idCol), col("__a").as("a"), col("__b").as("b"))
    val joined = mapped
      .join(model.lm, Seq("a", "b"), "left")
      .join(model.ctx, Seq("a"), "left")
      .join(model.cont, Seq("b"), "left")
      .crossJoin(broadcast(model.tot))
    val lp = joined.withColumn("__lp",
      round(logProb(model.discount), 6).cast("decimal(24,6)"))
    lp.groupBy(col(idCol))
      .agg(count(lit(1)).as("n_bigrams"),
        sum(when(col("a") === "<unk>" || col("b") === "<unk>", 1L)
          .otherwise(0L)).as("n_oov_bg"),
        sum(col("__lp")).as("__sum_lp"))
      .withColumn("ppl",
        round(exp(-col("__sum_lp").cast("double") / col("n_bigrams")), 4))
      .select(col(idCol), col("n_bigrams"), col("n_oov_bg"), col("ppl"))
  }
}
