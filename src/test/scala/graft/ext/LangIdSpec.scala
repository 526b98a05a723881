package graft.ext

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** LangId contracts — the q193/q185 class (iterative training is not
  * SQL-expressible, so correctness is pinned here): (1) weight-for-weight
  * equality against an INDEPENDENT single-node softmax reference (plain
  * Scala + MessageDigest md5 + BigDecimal sums — no Spark), (2) it
  * actually separates languages, (3) partition invariance (the
  * decimal-sum discipline), (4) kind=langid store round-trip. */
class LangIdSpec extends SparkSpec {
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

  /** Reference trainer: the same softmax recipe, no Spark. Weight maps
    * keyed (label idx, bucket) with bucket −1 = bias; every sum is a
    * BigDecimal sum of 9-dp-rounded terms — the exact arithmetic the
    * engine's DECIMAL(24,9) sums perform. */
  private def refTrain(docs: Seq[(Long, String, String)], labels: Seq[String],
      b: Int, iters: Int, lr: Double): Array[Array[Double]] = {
    val feats = docs.map { case (_, lang, txt) =>
      val ngs = ngrams(txt)
      val n = ngs.size
      val m = ngs.groupBy(ng => bkt(ng, b)).map { case (k, g) =>
        k -> round9(g.size.toDouble / n)
      } + (-1L -> 1.0)
      (lang, m)
    }
    val n = docs.size
    val nL = labels.size
    var w = Array.fill(nL)(Array.fill(b + 1)(0.0))
    def wAt(l: Int, k: Long): Double = w(l)((k + 1L).toInt)
    for (_ <- 0 until iters) {
      val errs = feats.map { case (lang, m) =>
        val margins = (0 until nL).map { l =>
          m.toSeq.map { case (k, x) =>
            BigDecimal(round9(x * wAt(l, k))).setScale(9)
          }.sum
        }
        val mx = margins.max
        val ems = margins.map(mm => math.exp((mm - mx).toDouble))
        val z = ems.map(e => BigDecimal(round9(e)).setScale(9)).sum.toDouble
        val es = (0 until nL).map { l =>
          round9(ems(l) / z - (if (labels(l) == lang) 1.0 else 0.0))
        }
        (es, m)
      }
      val grad = errs.flatMap { case (es, m) =>
        for (l <- 0 until nL; (k, x) <- m.toSeq)
          yield (l, k) -> BigDecimal(round9(es(l) * x)).setScale(9)
      }.groupBy(_._1).view.mapValues(_.map(_._2).sum.toDouble).toMap
      w = Array.tabulate(nL) { l =>
        Array.tabulate(b + 1) { i =>
          val g = grad.getOrElse((l, i.toLong - 1L), 0.0) / n
          round9(wAt(l, i.toLong - 1L) - lr * g)
        }
      }
    }
    w
  }

  private val vocab = Map(
    "aa" -> Vector("spark", "shuffle", "plan", "codegen", "broadcast", "join"),
    "bb" -> Vector("llama", "gazebo", "umbrella", "walrus", "trombone", "yoga"),
    "cc" -> Vector("fjord", "glacier", "tundra", "aurora", "moraine", "skerry"))

  private def doc(lang: String, seed: Int, n: Int): String =
    (0 until n).map(i => vocab(lang)((i * 7 + seed * 13) % 6)).mkString(" ")

  private val corpus: Seq[(Long, String, String)] =
    (0 until 45).map { i =>
      val lang = Seq("aa", "bb", "cc")(i % 3)
      (i.toLong, lang, doc(lang, i, 14))
    }

  private def corpusDf = corpus.toDF("id", "lang", "text")

  test("train matches the single-node softmax reference weight-for-weight") {
    val got = LangId.train(corpusDf, "id", "text", "lang",
      buckets = 64, iters = 4, lr = 3.0)
    assert(got.labels == Seq("aa", "bb", "cc"))
    val ref = refTrain(corpus, got.labels, 64, 4, 3.0)
    for (l <- got.labels.indices) {
      val diffs = got.weights(l).zip(ref(l)).zipWithIndex
        .filter { case ((a, e), _) => a != e }
      assert(diffs.isEmpty,
        s"label ${got.labels(l)}: ${diffs.size} mismatches, first ${diffs.headOption}")
    }
  }

  test("separable languages classify perfectly") {
    val model = LangId.train(corpusDf, "id", "text", "lang",
      buckets = 128, iters = 12, lr = 5.0)
    val preds = LangId.predict(model, corpusDf, "id", "text")
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    val correct = corpus.count { case (id, lang, _) => preds(id) == lang }
    assert(correct == corpus.size,
      s"accuracy ${correct.toDouble / corpus.size}")
  }

  test("training is partition-invariant (decimal sums)") {
    def run(parts: Int) = LangId.train(corpusDf.repartition(parts),
      "id", "text", "lang", buckets = 64, iters = 3, lr = 3.0)
    val (a, b) = (run(1), run(7))
    assert(a.labels == b.labels)
    for (l <- a.labels.indices)
      assert(a.weights(l).sameElements(b.weights(l)), a.labels(l))
  }

  test("stored model round-trips bit-for-bit (IndexStore kind=langid)") {
    val model = LangId.train(corpusDf, "id", "text", "lang",
      buckets = 64, iters = 3, lr = 3.0)
    val dir = java.nio.file.Files.createTempDirectory("langid-idx").toString
    IndexStore.writeLangid(model, dir)
    val loaded = IndexStore.loadLangid(spark, dir)
    assert(loaded.labels == model.labels && loaded.buckets == model.buckets)
    for (l <- model.labels.indices)
      assert(loaded.weights(l).sameElements(model.weights(l)))
    val a = LangId.predict(model, corpusDf, "id", "text").collect()
      .map(r => (r.getLong(0), r.getString(1))).sortBy(_._1).toSeq
    val b = LangId.predict(loaded, corpusDf, "id", "text").collect()
      .map(r => (r.getLong(0), r.getString(1))).sortBy(_._1).toSeq
    assert(a == b)
    val e = intercept[IllegalArgumentException] {
      IndexStore.loadLogreg(spark, dir)
    }
    assert(e.getMessage.contains("langid") && e.getMessage.contains("logreg"))
  }

  test("labels containing commas survive the store round-trip") {
    val docs = Seq(
      (1L, "alpha beta gamma delta", "en,US"),
      (2L, "uno dos tres cuatro", "es,MX"),
      (3L, "alpha gamma beta delta", "en,US"))
      .toDF("id", "text", "lang")
    val model = LangId.train(docs, "id", "text", "lang",
      buckets = 32, iters = 2, lr = 2.0)
    assert(model.labels == Seq("en,US", "es,MX"))
    val dir = java.nio.file.Files.createTempDirectory("langid-comma").toString
    IndexStore.writeLangid(model, dir)
    val loaded = IndexStore.loadLangid(spark, dir)
    assert(loaded.labels == model.labels,
      s"comma labels corrupted: ${loaded.labels}")
    for (l <- model.labels.indices)
      assert(loaded.weights(l).sameElements(model.weights(l)))
  }

  test("scoreExpr (map-only) matches predict prediction-for-prediction") {
    import org.apache.spark.sql.functions._
    val model = LangId.train(corpusDf, "id", "text", "lang",
      buckets = 64, iters = 6, lr = 4.0)
    // edge cases ride along: empty text, whitespace-only, single word,
    // repeated-word runs (exercises the sorted-run count fold)
    val docs = corpusDf.unionByName(Seq(
      (900L, "zz", ""), (901L, "zz", "   "), (902L, "zz", "walrus"),
      (903L, "zz", "walrus walrus walrus fjord fjord spark"))
      .toDF("id", "lang", "text"))
    val viaAgg = LangId.predict(model, docs, "id", "text")
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    val viaMap = docs.select(col("id"),
        LangId.scoreExpr(model, col("text")).as("p"))
      .collect().map(r => r.getLong(0) -> Option(r.getString(1))).toMap
    assert(viaMap.size == docs.count())
    viaMap.foreach { case (id, p) =>
      assert(p == viaAgg.get(id),
        s"doc $id: map-only $p vs aggregate ${viaAgg.get(id)}")
    }
  }

  test("scoreExpr ≡ predict on the REAL corpus through a real trained model") {
    // the proof the q232 gate entry carried in-plan through round 12
    // (predict + assert_true riding the serve entry tripled its corpus
    // passes — VERDICT r12 What's-wrong #3); it lives here now, over
    // the genuine documents table, so the serve entry prices one pass
    // while the equality stays pinned on real text
    import org.apache.spark.sql.functions._
    val docs = graft.Tables.documents(spark, sf0001)
      .select(col("doc_id"), col("text"), col("lang"))
    val model = LangId.train(docs, "doc_id", "text", "lang",
      buckets = 128, iters = 3, lr = 2.0)
    val viaAgg = LangId.predict(model, docs, "doc_id", "text")
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    val viaMap = docs.select(col("doc_id"),
        LangId.scoreExpr(model, col("text")).as("p"))
      .collect().map(r => r.getLong(0) -> Option(r.getString(1))).toMap
    assert(viaMap.nonEmpty && viaMap.size == docs.count())
    viaMap.foreach { case (id, p) =>
      assert(p == viaAgg.get(id),
        s"real doc $id: map-only $p vs aggregate ${viaAgg.get(id)}")
    }
  }

  test("native scoreExpr ≡ retired composed form, prediction for prediction (real corpus + edges)") {
    // three-way pin: the native expression (serving path) against the
    // HOF/Column composition it replaced — both already ≡ predict via
    // the other cases; this closes the triangle on the real documents
    // table plus the degenerate shapes
    import org.apache.spark.sql.functions._
    val docs = graft.Tables.documents(spark, sf0001)
      .select(col("doc_id"), col("text"), col("lang"))
    val model = LangId.train(docs, "doc_id", "text", "lang",
      buckets = 128, iters = 3, lr = 2.0)
    val withEdges = docs.select(col("doc_id"), col("text"))
      .unionByName(Seq(
        (9000L, ""), (9001L, "   "), (9002L, "solo"),
        (9003L, "dup dup dup word word"), (9004L, "Ünïcode MIXED Case"))
        .toDF("doc_id", "text"))
    val both = withEdges.select(col("doc_id"),
        LangId.scoreExpr(model, col("text")).as("native"),
        LangId.scoreExprComposed(model, col("text")).as("composed"))
      .collect()
    assert(both.nonEmpty)
    both.foreach { r =>
      assert(r.getString(1) == r.getString(2),
        s"doc ${r.getLong(0)}: native ${r.getString(1)} vs composed ${r.getString(2)}")
    }
  }

  test("scoreExpr scores NULL text as NULL (predict emits no row)") {
    import org.apache.spark.sql.functions._
    val model = LangId.train(corpusDf, "id", "text", "lang",
      buckets = 32, iters = 2, lr = 2.0)
    val docs = Seq((1L, Some("walrus fjord")), (2L, None))
      .toDF("id", "text")
    val got = docs.select(col("id"),
        LangId.scoreExpr(model, col("text")).as("p"))
      .collect().map(r => r.getLong(0) -> Option(r.getString(1))).toMap
    assert(got(1L).isDefined && got(2L).isEmpty)
    val aggIds = LangId.predict(model, docs, "id", "text")
      .collect().map(_.getLong(0)).toSet
    assert(aggIds == Set(1L))
  }

  test("NULL labels are refused loudly, not NPE'd") {
    val docs = Seq((1L, "alpha beta", Some("en")), (2L, "uno dos", None))
      .toDF("id", "text", "lang")
    val e = intercept[IllegalArgumentException] {
      LangId.train(docs, "id", "text", "lang", buckets = 32, iters = 1)
    }
    assert(e.getMessage.contains("NULL"))
  }
}
