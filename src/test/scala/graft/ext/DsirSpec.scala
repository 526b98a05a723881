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

  test("ngramBuckets: 2n-1 occurrences per doc, buckets in range, __nng total") {
    val ng = Dsir.ngramBuckets(Seq((1L, "A b  c")).toDF("id", "text"),
      "id", "text", buckets = 64)
    val rows = ng.collect()
    assert(rows.length == 5) // 3 unigrams + 2 bigrams
    assert(rows.forall(_.getLong(1) == 5L)) // __nng
    assert(rows.forall(r => r.getLong(2) >= 0 && r.getLong(2) < 64))
  }
}
