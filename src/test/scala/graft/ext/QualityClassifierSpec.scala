package graft.ext

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** QualityClassifier contracts — the q185/q188 class (iterative training
  * is not SQL-expressible, so correctness is pinned here, not at the
  * DuckDB gate): (1) weight-for-weight equality against an INDEPENDENT
  * single-node reference (plain Scala collections + MessageDigest md5 +
  * BigDecimal sums — no Spark), (2) it actually LEARNS on a separable
  * corpus, (3) partition invariance (the decimal-sum discipline),
  * (4) scoring semantics. */
class QualityClassifierSpec extends SparkSpec {
  import spark.implicits._

  // ---- independent single-node reference ----------------------------
  private def md5hex(s: String): String =
    java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString

  private def bkt(ng: String, b: Int): Long =
    java.lang.Long.parseLong(md5hex(ng).take(8), 16) % b

  private def ngrams(text: String): Seq[String] = {
    val ws = text.trim.toLowerCase.split("\\s+").toSeq
    ws ++ ws.sliding(2).filter(_.size == 2).map(_.mkString(" "))
  }

  private def round9(v: Double): Double =
    BigDecimal(v).setScale(9, BigDecimal.RoundingMode.HALF_UP).toDouble

  /** Reference trainer: same recipe, no Spark. Weights indexed −1..B−1
    * (−1 = bias). Every sum is a BigDecimal sum of 9-dp-rounded terms —
    * the exact arithmetic the engine's DECIMAL(24,9) sums perform. */
  private def refTrain(docs: Seq[(Long, Boolean, String)], b: Int,
      iters: Int, lr: Double, l2: Double = 0.0,
      ramps: Seq[Double] = Nil, adagrad: Boolean = false): (Double, Array[Double]) = {
    val feats = docs.map { case (_, y, txt) =>
      val ngs = ngrams(txt)
      val n = ngs.size
      val words = (n + 1) / 2 // n-grams = 2·words − 1
      val m = ngs.groupBy(ng => bkt(ng, b)).map { case (k, g) =>
        k -> round9(g.size.toDouble / n)
      } ++ ramps.zipWithIndex.map { case (c, i) =>
        val ramp = if (c > 0) math.min(words / c, 1.0)
        else math.min(-c / words, 1.0)
        (b + i).toLong -> round9(ramp)
      } + (-1L -> 1.0)
      (y, m)
    }
    val n = docs.size
    val dim = b + ramps.size
    var w = Map.empty[Long, Double].withDefaultValue(0.0)
    val gSq = scala.collection.mutable.Map.empty[Long, Double].withDefaultValue(0.0)
    for (_ <- 0 until iters) {
      val errs = feats.map { case (y, m) =>
        val margin = m.toSeq
          .map { case (k, x) => BigDecimal(round9(x * w(k))).setScale(9) }
          .sum.toDouble
        val e = round9(1.0 / (1.0 + math.exp(-margin)) - (if (y) 1.0 else 0.0))
        (e, m)
      }
      val grad = errs.flatMap { case (e, m) =>
        m.map { case (k, x) => k -> BigDecimal(round9(e * x)).setScale(9) }
      }.groupBy(_._1).view.mapValues(_.map(_._2).sum.toDouble).toMap
      w = (-1L until dim.toLong).map { k =>
        val g = grad.getOrElse(k, 0.0) / n + l2 * w(k)
        val step =
          if (adagrad) { gSq(k) += g * g; g / math.sqrt(gSq(k) + 1e-10) }
          else g
        k -> round9(w(k) - lr * step)
      }.toMap.withDefaultValue(0.0)
    }
    (w(-1L), Array.tabulate(dim)(i => w(i.toLong)))
  }

  private val va = Vector("spark", "shuffle", "plan", "codegen", "broadcast",
    "partition", "catalyst", "parquet", "join", "filter")
  private val vb = Vector("llama", "gazebo", "umbrella", "walrus", "trombone",
    "pickle", "yoga", "asteroid", "banjo", "kumquat")
  private def doc(v: Vector[String], seed: Int, n: Int) =
    (0 until n).map(i => v((i * 7 + seed * 13) % v.size)).mkString(" ")

  private val corpus: Seq[(Long, Boolean, String)] =
    (0 until 30).map(i => (i.toLong, true, doc(va, i, 18))) ++
      (30 until 60).map(i => (i.toLong, false, doc(vb, i, 18)))

  private def corpusDf = corpus.toDF("id", "y", "text")

  test("train matches the single-node reference weight-for-weight") {
    val got = QualityClassifier.train(corpusDf, "y", "id", "text",
      buckets = 64, iters = 5, lr = 2.0)
    val (refBias, refW) = refTrain(corpus, 64, 5, 2.0)
    assert(got.bias == refBias, s"bias: got ${got.bias} exp $refBias")
    val diffs = got.weights.zip(refW).zipWithIndex.filter { case ((a, e), _) => a != e }
    assert(diffs.isEmpty,
      s"${diffs.size} weight mismatches, first: ${diffs.headOption}")
  }

  test("train with stat ramps matches the reference weight-for-weight") {
    val got = QualityClassifier.train(corpusDf, "y", "id", "text",
      buckets = 64, iters = 5, lr = 2.0, statRamps = Seq(20.0, -90.0))
    val (refBias, refW) = refTrain(corpus, 64, 5, 2.0, ramps = Seq(20.0, -90.0))
    assert(got.weights.length == 66)
    assert(got.bias == refBias)
    val diffs = got.weights.zip(refW).zipWithIndex.filter { case ((a, e), _) => a != e }
    assert(diffs.isEmpty,
      s"${diffs.size} weight mismatches, first: ${diffs.headOption}")
  }

  test("adagrad training matches the reference weight-for-weight") {
    val got = QualityClassifier.train(corpusDf, "y", "id", "text",
      buckets = 64, iters = 6, lr = 0.5, statRamps = Seq(20.0, -90.0),
      adagrad = true)
    val (refBias, refW) = refTrain(corpus, 64, 6, 0.5,
      ramps = Seq(20.0, -90.0), adagrad = true)
    assert(got.bias == refBias)
    val diffs = got.weights.zip(refW).zipWithIndex.filter { case ((a, e), _) => a != e }
    assert(diffs.isEmpty,
      s"${diffs.size} weight mismatches, first: ${diffs.headOption}")
  }

  test("stat ramps make a pure-length band label learnable (the q193 shape)") {
    // Same vocabulary everywhere (zero n-gram signal); label = word count
    // in [20, 90] — exactly Gopher's band on the gate corpus. Normalized
    // bag-of-n-grams alone CANNOT see this; the two saturated ramps can.
    val lens = (0 until 80).map(i => 10 + (i * 89) % 90) // 10..99
    val band = lens.zipWithIndex.map { case (len, i) =>
      (i.toLong, len >= 20 && len <= 90, doc(va, i, len))
    }
    val df = band.toDF("id", "y", "text")
    val model = QualityClassifier.train(df, "y", "id", "text",
      buckets = 64, iters = 60, lr = 8.0, statRamps = Seq(20.0, -90.0))
    val scored = QualityClassifier.score(model, df, "id", "text")
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    val correct = band.count { case (id, y, _) => (scored(id) >= 0.5) == y }
    assert(correct >= (band.size * 0.85).toInt,
      s"band agreement ${correct.toDouble / band.size}")
  }

  test("learns a separable corpus (accuracy >= 0.95)") {
    val model = QualityClassifier.train(corpusDf, "y", "id", "text",
      buckets = 256, iters = 30, lr = 5.0)
    val scored = QualityClassifier.score(model, corpusDf, "id", "text")
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    val correct = corpus.count { case (id, y, _) => (scored(id) >= 0.5) == y }
    assert(correct >= (corpus.size * 0.95).toInt,
      s"accuracy ${correct.toDouble / corpus.size}")
  }

  test("training is partition-invariant (decimal sums)") {
    def run(parts: Int) = QualityClassifier.train(corpusDf.repartition(parts),
      "y", "id", "text", buckets = 64, iters = 3, lr = 2.0)
    val (a, b) = (run(1), run(7))
    assert(a.bias == b.bias)
    assert(a.weights.sameElements(b.weights))
  }

  test("stored model round-trips bit-for-bit (IndexStore kind=logreg)") {
    val model = QualityClassifier.train(corpusDf, "y", "id", "text",
      buckets = 64, iters = 4, lr = 0.5, statRamps = Seq(20.0, -90.0),
      adagrad = true)
    val dir = java.nio.file.Files.createTempDirectory("logreg-idx").toString
    IndexStore.writeLogreg(model, dir)
    val loaded = IndexStore.loadLogreg(spark, dir)
    assert(loaded.buckets == model.buckets)
    assert(loaded.bias == model.bias)
    assert(loaded.statRamps == model.statRamps)
    assert(loaded.weights.sameElements(model.weights))
    val a = QualityClassifier.score(model, corpusDf, "id", "text").collect()
      .map(r => (r.getLong(0), r.getDouble(1))).sortBy(_._1).toSeq
    val b = QualityClassifier.score(loaded, corpusDf, "id", "text").collect()
      .map(r => (r.getLong(0), r.getDouble(1))).sortBy(_._1).toSeq
    assert(a == b)
    val e = intercept[IllegalArgumentException] {
      IndexStore.loadDsir(spark, dir)
    }
    assert(e.getMessage.contains("logreg") && e.getMessage.contains("dsir"))
  }

  test("score: probabilities in (0,1), one row per doc, positive class higher") {
    val model = QualityClassifier.train(corpusDf, "y", "id", "text",
      buckets = 256, iters = 20, lr = 5.0)
    val scored = QualityClassifier.score(model, corpusDf, "id", "text").collect()
    assert(scored.length == corpus.size)
    assert(scored.forall(r => r.getDouble(1) > 0.0 && r.getDouble(1) < 1.0))
    val byId = scored.map(r => r.getLong(0) -> r.getDouble(1)).toMap
    val posMean = corpus.filter(_._2).map(c => byId(c._1)).sum / 30
    val negMean = corpus.filterNot(_._2).map(c => byId(c._1)).sum / 30
    assert(posMean > negMean + 0.3,
      s"posMean $posMean should clearly exceed negMean $negMean")
  }
}
