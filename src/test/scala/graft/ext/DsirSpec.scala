package graft.ext

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** DSIR contracts. The q192 oracle already hash-checks every stage vs
  * DuckDB; this suite pins (1) the math against an INDEPENDENT
  * single-node reference (plain Scala + MessageDigest md5 + BigDecimal
  * sums — no Spark expressions), (2) the semantic property the paper is
  * for (target-like raw docs outrank noise), (3) partition invariance
  * (the decimal-sum discipline), and (4) resample edge semantics. */
class DsirSpec extends SparkSpec {
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

  /** Reference importance weights: id -> (n_ngrams, logw as 6-dp BigDecimal). */
  private def refWeights(docs: Seq[(Long, Boolean, String)], b: Int,
      alpha: Double): Map[Long, (Long, BigDecimal)] = {
    val occ = docs.flatMap { case (id, t, txt) =>
      ngrams(txt).map(ng => (id, t, bkt(ng, b)))
    }
    val rc = occ.groupBy(_._3).view.mapValues(_.size.toLong).toMap
    val tc = occ.filter(_._2).groupBy(_._3).view.mapValues(_.size.toLong).toMap
    val rn = occ.size.toLong
    val tn = occ.count(_._2).toLong
    val lr: Map[Long, BigDecimal] = rc.map { case (bk, c) =>
      val v = math.log((tc.getOrElse(bk, 0L) + alpha) / (tn + alpha * b)) -
        math.log((c + alpha) / (rn + alpha * b))
      bk -> BigDecimal(v).setScale(6, BigDecimal.RoundingMode.HALF_UP)
    }
    occ.groupBy(_._1).map { case (id, os) =>
      id -> (os.size.toLong, os.map(o => lr(o._3)).sum)
    }
  }

  private val corpus: Seq[(Long, Boolean, String)] = {
    val va = Vector("spark", "shuffle", "plan", "codegen", "broadcast",
      "partition", "catalyst", "parquet")
    val vb = Vector("llama", "gazebo", "umbrella", "walrus", "trombone",
      "pickle", "yoga", "asteroid")
    def doc(v: Vector[String], seed: Int, n: Int) =
      (0 until n).map(i => v((i * 7 + seed * 13) % v.size)).mkString(" ")
    val targets = (0L until 6L).map(i => (i, true, doc(va, i.toInt, 24)))
    val rawA = (100L until 110L).map(i => (i, false, doc(va, i.toInt, 20)))
    val rawB = (110L until 120L).map(i => (i, false, doc(vb, i.toInt, 20)))
    targets ++ rawA ++ rawB
  }

  private def corpusDf = corpus.toDF("id", "is_t", "text")

  test("importanceWeights matches the single-node reference exactly") {
    val got = Dsir.importanceWeights(corpusDf, col("is_t"), "id", "text",
        buckets = 512, alpha = 1.0)
      .collect().map(r => r.getLong(0) ->
        (r.getLong(1), BigDecimal(r.getDecimal(2)))).toMap
    val exp = refWeights(corpus, 512, 1.0)
    assert(got.keySet == exp.keySet)
    for ((id, (n, lw)) <- exp) {
      assert(got(id)._1 == n, s"n_ngrams for doc $id")
      assert(got(id)._2.compare(lw) == 0, s"logw for doc $id: got ${got(id)._2} exp $lw")
    }
  }

  test("target-like raw docs outrank noise docs (the paper's property)") {
    val w = Dsir.importanceWeights(corpusDf, col("is_t"), "id", "text",
      buckets = 512, alpha = 1.0)
    val picked = Dsir.resample(w.filter(col("id") >= 100L), "id", 10)
      .select("id").as[Long].collect().toSet
    assert(picked.size == 10)
    val aLike = picked.count(_ < 110L)
    assert(aLike >= 8, s"only $aLike of 10 selected docs are target-like")
  }

  test("weights are partition-invariant (decimal sums)") {
    def run(parts: Int) =
      Dsir.importanceWeights(corpusDf.repartition(parts), col("is_t"),
          "id", "text", buckets = 512, alpha = 1.0)
        .collect().map(r => (r.getLong(0), r.getLong(1),
          BigDecimal(r.getDecimal(2)))).sortBy(_._1).toSeq
    assert(run(1) == run(7))
  }

  test("resample with k >= n returns every row; output is a subset of input") {
    val w = Dsir.importanceWeights(corpusDf, col("is_t"), "id", "text",
      buckets = 128, alpha = 1.0)
    val all = Dsir.resample(w, "id", 1000).select("id").as[Long].collect()
    assert(all.length == corpus.size)
    assert(all.toSet == corpus.map(_._1).toSet)
  }

  test("stored model round-trips; unseen buckets take the smoothing default") {
    val model = Dsir.fit(corpusDf, col("is_t"), "id", "text",
      buckets = 512, alpha = 1.0)
    val dir = java.nio.file.Files.createTempDirectory("dsir-idx").toString
    IndexStore.writeDsir(model, dir)
    val loaded = IndexStore.loadDsir(spark, dir)
    assert(loaded.buckets == model.buckets && loaded.alpha == model.alpha &&
      loaded.rawN == model.rawN && loaded.targetN == model.targetN)
    // increment: one known-vocab doc + one doc of NOVEL words (its
    // buckets cannot all be in the model — novel n-grams hit the default)
    val inc = Seq((500L, "spark shuffle plan"),
      (501L, "xylophone quux zorp")).toDF("id", "text")
    def scores(m: Dsir.Model) =
      Dsir.scoreWith(m, inc, "id", "text").collect()
        .map(r => (r.getLong(0), r.getLong(1), BigDecimal(r.getDecimal(2))))
        .sortBy(_._1).toSeq
    val got = scores(loaded)
    assert(got == scores(model), "loaded model must score identically")
    // single-node reference with the default for unseen buckets
    val occ = corpus.flatMap { case (_, t, txt) => ngrams(txt).map(ng => (t, bkt(ng, 512))) }
    val rc = occ.groupBy(_._2).view.mapValues(_.size.toLong).toMap
    val tc = occ.filter(_._1).groupBy(_._2).view.mapValues(_.size.toLong).toMap
    val (rn, tn) = (occ.size.toLong, occ.count(_._1).toLong)
    def lr(b: Long): BigDecimal = BigDecimal(
      math.log((tc.getOrElse(b, 0L) + 1.0) / (tn + 512.0)) -
        math.log((rc.getOrElse(b, 0L) + 1.0) / (rn + 512.0)))
      .setScale(6, BigDecimal.RoundingMode.HALF_UP)
    val dflt = BigDecimal(math.log(1.0 / (tn + 512.0)) -
      math.log(1.0 / (rn + 512.0))).setScale(6, BigDecimal.RoundingMode.HALF_UP)
    val exp = Seq((500L, "spark shuffle plan"), (501L, "xylophone quux zorp"))
      .map { case (id, txt) =>
        val ns = ngrams(txt).map(ng => bkt(ng, 512))
        (id, ns.size.toLong,
          ns.map(b => if (rc.contains(b)) lr(b) else dflt).sum)
      }
    assert(got.map(g => (g._1, g._2)) == exp.map(e => (e._1, e._2)))
    got.zip(exp).foreach { case (g, e) =>
      assert(g._3.compare(e._3) == 0, s"logw for doc ${g._1}")
    }
    assert(tc.keySet.subsetOf(rc.keySet))
  }

  test("ngramBuckets: 2n-1 occurrences per doc, buckets in range, __nng total") {
    val ng = Dsir.ngramBuckets(Seq((1L, "A b  c")).toDF("id", "text"),
      "id", "text", buckets = 64)
    val rows = ng.collect()
    assert(rows.length == 5) // 3 unigrams + 2 bigrams
    assert(rows.forall(_.getLong(1) == 5L)) // __nng
    assert(rows.forall(r => r.getLong(2) >= 0 && r.getLong(2) < 64))
  }
}
