package graft.ext

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Contracts for [[KneserNey]] — interpolated KN bigram LM.
  *
  * The independent reference below recomputes the whole pipeline with
  * plain Scala collections + java.math rounding (no Spark), mirroring the
  * exact IEEE operation order of the plan's expression tree; the suite
  * pins Spark ≡ reference value-for-value.
  */
class KneserNeySpec extends SparkSpec {
  import scala.math.BigDecimal.RoundingMode.HALF_UP

  private def toks(t: String): Seq[String] =
    t.trim.toLowerCase.split("\\s+").toSeq
  private def bigrams(ts: Seq[String]): Seq[(String, String)] =
    if (ts.size >= 2) ts.zip(ts.tail) else Seq.empty

  /** Independent single-node KN: returns id -> (n_bigrams, n_oov, ppl). */
  private def refPpl(train: Seq[(Long, String)], docs: Seq[(Long, String)],
      minCount: Int, d: Double): Map[Long, (Long, Long, Double)] = {
    val uni = train.flatMap(x => toks(x._2))
      .groupBy(identity).view.mapValues(_.size).toMap
    val vocab = uni.filter(_._2 >= minCount).keySet
    def m(t: String) = if (vocab(t)) t else "<unk>"
    val trbg = train.flatMap(x => bigrams(toks(x._2)))
      .map { case (a, b) => (m(a), m(b)) }
    val c = trbg.groupBy(identity).view.mapValues(_.size.toLong).toMap
    val ca = c.groupBy(_._1._1).map { case (a, ps) =>
      (a, (ps.values.sum, ps.size.toLong)) }
    val cb = c.groupBy(_._1._2).map { case (b, ps) => (b, ps.size.toLong) }
    val tot = c.size.toLong
    val vp = vocab.size + 1L
    docs.flatMap { case (id, text) =>
      val bgs = bigrams(toks(text)).map { case (a, b) => (m(a), m(b)) }
      if (bgs.isEmpty) None
      else {
        val lps = bgs.map { case (a, b) =>
          val pcont = (cb.getOrElse(b, 0L) + 1.0) / (tot + vp)
          val p = ca.get(a) match {
            case Some((acnt, n1pa)) =>
              (math.max(c.getOrElse((a, b), 0L) - d, 0.0)
                + (d * n1pa) * pcont) / acnt
            case None => pcont
          }
          BigDecimal(math.log(p)).setScale(6, HALF_UP)
        }
        val oov = bgs.count { case (a, b) => a == "<unk>" || b == "<unk>" }
        val ppl = BigDecimal(
          math.exp(-lps.sum.toDouble / bgs.size)).setScale(4, HALF_UP)
        Some(id -> ((bgs.size.toLong, oov.toLong, ppl.toDouble)))
      }
    }.toMap
  }

  private val trainDocs: Seq[(Long, String)] = Seq(
    1L -> "the cat sat on the mat",
    2L -> "the dog sat on the rug",
    3L -> "a cat and a dog sat",
    4L -> "the cat saw the dog run",
    5L -> "on the mat sat the cat")
  private val scoreDocs: Seq[(Long, String)] = trainDocs ++ Seq(
    6L -> "the cat sat on the rug",       // all-seen tokens, one new bigram
    7L -> "zebra quark sat on the mat",   // OOV tokens -> <unk>
    8L -> "run",                          // single token: dropped
    9L -> "mat mat mat")                  // seen token, unseen bigrams

  private def df(rows: Seq[(Long, String)]) = {
    val s = spark; import s.implicits._
    rows.toDF("doc_id", "text")
  }

  private def run(minCount: Int, parts: Int = 1): Map[Long, (Long, Long, Double)] = {
    val docs = if (parts > 1) df(scoreDocs).repartition(parts) else df(scoreDocs)
    val model = KneserNey.fit(df(trainDocs), "doc_id", "text",
      minCount = minCount, discount = 0.75)
    KneserNey.perplexity(docs, "doc_id", "text", model)
      .collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getDouble(3))))
      .toMap
  }

  test("spark == independent single-node reference, value for value") {
    for (mc <- Seq(1, 2, 3)) {
      val got = run(mc)
      val want = refPpl(trainDocs, scoreDocs, mc, 0.75)
      assert(got == want, s"minCount=$mc")
    }
  }

  test("P(.|a) is a proper distribution for every context, incl backoff") {
    // Recompute the reference model and check sums analytically: for each
    // context in ctx, sum over vocab+<unk>; for a context with no
    // training bigrams the distribution is Pcont itself.
    val uni = trainDocs.flatMap(x => toks(x._2))
      .groupBy(identity).view.mapValues(_.size).toMap
    val vocab = uni.filter(_._2 >= 2).keySet
    def m(t: String) = if (vocab(t)) t else "<unk>"
    val trbg = trainDocs.flatMap(x => bigrams(toks(x._2)))
      .map { case (a, b) => (m(a), m(b)) }
    val c = trbg.groupBy(identity).view.mapValues(_.size.toLong).toMap
    val ca = c.groupBy(_._1._1).map { case (a, ps) =>
      (a, (ps.values.sum, ps.size.toLong)) }
    val cb = c.groupBy(_._1._2).map { case (b, ps) => (b, ps.size.toLong) }
    val tot = c.size.toLong
    val types = vocab.toSeq :+ "<unk>"
    val vp = types.size.toLong
    def pcont(b: String) = (cb.getOrElse(b, 0L) + 1.0) / (tot + vp)
    assert(math.abs(types.map(pcont).sum - 1.0) < 1e-9)
    for ((a, (acnt, n1pa)) <- ca) {
      val s = types.map { b =>
        (math.max(c.getOrElse((a, b), 0L) - 0.75, 0.0)
          + (0.75 * n1pa) * pcont(b)) / acnt
      }.sum
      assert(math.abs(s - 1.0) < 1e-9, s"context $a sums to $s")
    }
  }

  test("OOV tokens map to <unk> and are counted in n_oov_bg") {
    val got = run(minCount = 1)
    // doc 7: "zebra quark sat on the mat" -> zebra, quark are OOV; the
    // first two bigrams touch <unk> (zebra-quark, quark-sat).
    assert(got(7L)._2 == 2L)
    assert(got(6L)._2 == 0L)
    // single-token doc 8 carries no bigrams and is dropped
    assert(!got.contains(8L))
  }

  test("result is partition-invariant") {
    assert(run(2, parts = 1) == run(2, parts = 7))
  }

  test("in-domain text scores lower perplexity than unseen-bigram text") {
    val got = run(minCount = 1)
    // doc 1 is a training document; doc 9 chains an unseen bigram
    assert(got(1L)._3 < got(9L)._3)
  }

  test("stored model round-trips and scores identically; kind refused") {
    val model = KneserNey.fit(df(trainDocs), "doc_id", "text",
      minCount = 2, discount = 0.75)
    val dir = java.nio.file.Files.createTempDirectory("graft-knlm").toString
    IndexStore.writeKnlm(model, dir)
    val loaded = IndexStore.loadKnlm(spark, dir)
    assert(loaded.discount == model.discount)
    def score(m: KneserNey.Model) =
      KneserNey.perplexity(df(scoreDocs), "doc_id", "text", m)
        .collect()
        .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getDouble(3))))
        .toMap
    assert(score(loaded) == score(model))
    val e = intercept[IllegalArgumentException] {
      IndexStore.loadDsir(spark, dir)
    }
    assert(e.getMessage.contains("knlm"))
  }
}
