package graft.ext

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** fastText-style linear quality classifier (Joulin et al. 2016,
  * arXiv:1607.01759), trained IN the engine — the learned complement to
  * the rule-based filters: GPT-3/LLaMA-class pipelines train exactly this
  * (a fast linear model over hashed bag-of-n-grams) to score "does this
  * crawl page look like the curated corpus", then keep the high scorers.
  * [[Dsir]] reweights by a distribution ratio; this DISCRIMINATES with a
  * trained decision boundary. The reference stack has no learned step at
  * all (`/root/reference/scripts/init_db.py` seeds and filters with SQL
  * only) — this is the training-data-pipeline tier of the build brief.
  *
  * Model: binary logistic regression over fastText's feature map —
  * hashed unigram+bigram counts normalized by document n-gram count
  * (fastText's "average of n-gram vectors" collapses to exactly this
  * linear form when the hidden dimension is the bucket space). Features
  * reuse [[Dsir.ngramBuckets]]'s portable md5 bucket hash; the intercept
  * is the standard constant-feature trick (bucket −1, x = 1), so one
  * aggregation per iteration carries bias and weights together.
  *
  * Training is full-batch gradient descent: ONE Spark job per iteration
  * computes every margin AND the whole gradient. No SGD, no sampling —
  * full-batch is what makes the run a pure function of the corpus (same
  * weights on any cluster, any partitioning, any retry).
  *
  * Scale shape (100 TB): the feature table (id, y, bkt, x) is built once
  * (one exchange), hash-partitioned by document, localCheckpoint'd. Every
  * iteration then: broadcast the (B+1)-row weight table onto it
  * (map-side), decimal-sum margins per doc with NO new exchange (the
  * groupBy key is the partitioning key), σ/error as a codegen'd
  * expression, join errors back feature-co-partitioned (no exchange),
  * and reduce to the ≤B+1-row gradient through one map-side-combined
  * exchange. Driver state per iteration: B+1 doubles — the
  * k-means-centroid class of bounded state. T iterations ⇒ T passes over
  * the checkpointed features, zero corpus-sized shuffles after the first.
  *
  * Float discipline (what makes the spec's exact-equality contract vs an
  * independent single-node reference possible): every per-row term
  * (feature value, margin term, error, gradient term) is rounded to 9
  * places and summed as DECIMAL — exact, order-independent — and weights
  * are re-rounded to 9 places after each driver update. Any
  * implementation that follows the recipe agrees bit-for-bit; σ itself
  * runs on identical IEEE doubles (`java.lang.Math.exp` both in codegen
  * and on the reference path).
  */
object QualityClassifier {

  /** Trained model: dense weights over `buckets` n-gram features plus one
    * weight per doc-stat ramp (appended after the n-gram block, in
    * `statRamps` order), intercept in `bias`. */
  final case class LogisticModel(buckets: Int, statRamps: Seq[Double],
      bias: Double, weights: Array[Double])

  private def r9(c: Column): Column = round(c, 9).cast("decimal(24,9)")

  private def round9(v: Double): Double =
    BigDecimal(v).setScale(9, BigDecimal.RoundingMode.HALF_UP).toDouble

  /** Sparse normalized features: (idCol, extra…, __bkt, __x) with
    * __x = round(count(bucket)/n_ngrams, 9); bucket −1 rows carry the
    * constant intercept feature, and each `statRamps` cutoff c adds one
    * bounded doc-stat feature at reserved bucket B+i: c > 0 gives the
    * lower ramp min(word_count/c, 1) (below-c docs score < 1), c < 0
    * gives the upper ramp min(|c|/word_count, 1) (above-|c| docs score
    * < 1). Normalized bag-of-n-grams is length-blind BY CONSTRUCTION, so
    * any label with a length component (Gopher's word-count band, say)
    * needs these — the pair (lo, −hi) is a band-membership pair: both
    * features saturate at exactly 1 inside [lo, hi] and fall off
    * outside, so a linear model carves the band with two positive
    * weights. Word count comes free from [[Dsir.ngramBuckets]]'s `__nng`
    * (= 2·words − 1). One exchange (the count groupBy). */
  def features(docs: DataFrame, idCol: String, textCol: String,
      buckets: Int, extra: Seq[String] = Nil, intercept: Boolean = false,
      statRamps: Seq[Double] = Nil): DataFrame = {
    val ng = Dsir.ngramBuckets(docs, idCol, textCol, buckets, extra)
    val keys = (col(idCol) +: extra.map(col)) :+ col("__nng")
    val base = ng.groupBy(keys :+ col("__bkt"): _*)
      .agg(count(lit(1)).as("__cnt"))
    val out = base.select((col(idCol) +: extra.map(col)) :+ col("__bkt") :+
      r9(col("__cnt").cast("double") / col("__nng")).as("__x"): _*)
    if (!intercept && statRamps.isEmpty) out
    else {
      val docsOnly = base.select(keys: _*).distinct()
      val wc = (col("__nng") + 1) / lit(2.0)
      val specials =
        (if (intercept)
          Seq(docsOnly.select(keys.init :+ lit(-1L).as("__bkt") :+
            r9(lit(1.0)).as("__x"): _*))
        else Nil) ++
          statRamps.zipWithIndex.map { case (c, i) =>
            val ramp = if (c > 0) least(wc / c, lit(1.0))
            else least(lit(-c) / wc, lit(1.0))
            docsOnly.select(keys.init :+ lit((buckets + i).toLong).as("__bkt") :+
              r9(ramp).as("__x"): _*)
          }
      specials.foldLeft(out)(_ unionByName _)
    }
  }

  /** Full-batch GD. `labelCol` must be boolean (true = positive). */
  def train(docs: DataFrame, labelCol: String, idCol: String,
      textCol: String, buckets: Int = 1024, iters: Int = 12,
      lr: Double = 2.0, l2: Double = 0.0,
      statRamps: Seq[Double] = Nil, adagrad: Boolean = false): LogisticModel = {
    val spark = docs.sparkSession
    import spark.implicits._
    require(iters > 0 && buckets > 0, "iters and buckets must be positive")
    // One corpus shuffle total: features (+ intercept/ramp rows),
    // partitioned by doc so every per-iteration groupBy/join is
    // exchange-free; checkpoint cuts the T-iteration lineage (the
    // k-means discipline).
    val feat = features(docs.select(col(idCol), col(textCol),
        col(labelCol).cast("boolean").as("__y")),
        idCol, textCol, buckets, extra = Seq("__y"), intercept = true,
        statRamps = statRamps)
      .repartition(col(idCol))
      .localCheckpoint(eager = true)
    val n = feat.filter(col("__bkt") === -1L).count()
    require(n > 0, "training corpus is empty")
    val dim = buckets + 1 + statRamps.size // index 0 = bias (bucket −1)
    var w = Array.fill(dim)(0.0)
    // AdaGrad accumulator: per-coordinate conditioning (Duchi et al.
    // 2011) — normalized n-gram features are O(1/words) while ramp /
    // intercept features are O(1), so a single global step size either
    // stalls the n-gram block or oscillates the dense block. Driver-side
    // doubles only; the update stays a pure function of the (exact,
    // decimal-summed) gradients, so determinism and the reference
    // contract are unchanged.
    val gSq = Array.fill(dim)(0.0)
    for (_ <- 0 until iters) {
      val wDf = w.toSeq.zipWithIndex
        .map { case (wv, i) => (i.toLong - 1L, wv) }.toDF("__bkt", "__w")
      val err = feat
        .join(broadcast(wDf), Seq("__bkt"))
        .groupBy(col(idCol), col("__y"))
        .agg(sum(r9(col("__x").cast("double") * col("__w"))).as("__m"))
        .select(col(idCol), r9(
          lit(1.0) / (lit(1.0) + exp(-col("__m").cast("double")))
            - when(col("__y"), 1.0).otherwise(0.0)).as("__e"))
      val grad = feat.join(err, Seq(idCol))
        .groupBy(col("__bkt"))
        .agg(sum(r9(col("__e").cast("double") * col("__x").cast("double")))
          .as("__g"))
        .collect().map(r => r.getLong(0) -> r.getDecimal(1).doubleValue())
        .toMap
      w = Array.tabulate(dim) { i =>
        val g = grad.getOrElse(i.toLong - 1L, 0.0) / n + l2 * w(i)
        val step =
          if (adagrad) { gSq(i) += g * g; g / math.sqrt(gSq(i) + 1e-10) }
          else g
        round9(w(i) - lr * step)
      }
    }
    LogisticModel(buckets, statRamps, w(0), w.drop(1))
  }

  private val cache = Memo.unmanaged[LogisticModel]

  /** Session-scoped train-once memo (the [[MinHashIndex.cached]] /
    * [[InvertedIndex.cached]] lifecycle pattern): rep 1 of a bench pays
    * the training, reps 2+ price steady-state scoring. */
  def cached(key: String)(build: => LogisticModel): LogisticModel =
    cache(key)(build)

  /** Score documents under a trained model: (idCol, prob rounded to 6).
    * Broadcast (B+1+ramps)-row weights; one exchange (the feature
    * groupBy). */
  def score(model: LogisticModel, docs: DataFrame, idCol: String,
      textCol: String): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    val wDf = (model.bias +: model.weights.toSeq).zipWithIndex
      .map { case (wv, i) => (i.toLong - 1L, wv) }.toDF("__bkt", "__w")
    features(docs, idCol, textCol, model.buckets, intercept = true,
        statRamps = model.statRamps)
      .join(broadcast(wDf), Seq("__bkt"))
      .groupBy(col(idCol))
      .agg(sum(r9(col("__x").cast("double") * col("__w"))).as("__m"))
      .select(col(idCol),
        round(lit(1.0) / (lit(1.0) + exp(-col("__m").cast("double"))), 6)
          .as("prob"))
  }
}
