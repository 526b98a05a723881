package graft.ext

import org.apache.spark.sql.functions._

import graft.{SparkSpec, Tables}

/** Unigram-LM trainer vs an independent single-node reference
  * implementation (the BpeTrainerSpec pattern): identical vocabularies
  * piece-for-piece, identical Viterbi segmentations, lossless
  * round-trip. The reference reimplements the whole algorithm — seeding,
  * hard-EM, pruning, Viterbi — with plain Maps and loops, sharing no
  * code with the distributed version. */
class UnigramLmSpec extends SparkSpec {

  // ---- independent single-node reference --------------------------------

  private def refViterbi(word: String, scores: Map[String, Double],
      maxLen: Int, unk: Double): Vector[String] = {
    val cps = word.codePoints().toArray
      .map(cp => new String(Character.toChars(cp)))
    val n = cps.length
    if (n == 0) return Vector.empty
    val best = Array.fill(n + 1)(Double.NegativeInfinity)
    val back = new Array[Int](n + 1)
    best(0) = 0.0
    for (i <- 1 to n; len <- 1 to math.min(maxLen, i)) {
      val piece = cps.slice(i - len, i).mkString
      val s = scores.get(piece)
        .orElse(if (len == 1) Some(unk) else None)
      s.foreach { lp =>
        if (best(i - len) + lp >= best(i)) {
          best(i) = best(i - len) + lp; back(i) = len
        }
      }
    }
    var p = n
    var out = List.empty[String]
    while (p > 0) { out = cps.slice(p - back(p), p).mkString :: out; p -= back(p) }
    out.toVector
  }

  private def refTrain(corpus: Seq[String], vocabSize: Int, maxLen: Int,
      seedSize: Int, emIters: Int, pruneFrac: Double): Seq[(String, Double)] = {
    val words: Map[String, Long] = corpus.flatMap(_.split("\\s+"))
      .filter(_.nonEmpty).groupBy(identity).map { case (w, ws) => w -> ws.size.toLong }
    def cpsOf(w: String) = w.codePoints().toArray
      .map(cp => new String(Character.toChars(cp)))
    val alpha: Map[String, Long] = words.toSeq
      .flatMap { case (w, c) => cpsOf(w).map(_ -> c) }
      .groupBy(_._1).map { case (p, xs) => p -> xs.map(_._2).sum }
    val seed: Seq[(String, Long)] = words.toSeq
      .flatMap { case (w, c) =>
        val cps = cpsOf(w)
        for {
          i <- cps.indices
          l <- 2 to maxLen if i + l <= cps.length
        } yield (cps.slice(i, i + l).mkString, c)
      }
      .groupBy(_._1).map { case (p, xs) => p -> xs.map(_._2).sum }.toSeq
      .sortBy { case (p, n) => (-n, p) }.take(seedSize)
      .filterNot { case (p, _) => alpha.contains(p) }
    def normalize(counts: Map[String, Long]): Map[String, Double] = {
      val floored = counts ++ alpha.keys.map(a => a -> math.max(1L, counts.getOrElse(a, 0L)))
      val kept = floored.filter(_._2 > 0L)
      val total = kept.values.sum.toDouble
      kept.map { case (p, n) => p -> math.log(n / total) }
    }
    def eStep(scores: Map[String, Double]): Map[String, Long] = {
      val unk = scores.values.min - 10.0
      val acc = scala.collection.mutable.HashMap.empty[String, Long]
      words.foreach { case (w, c) =>
        refViterbi(w, scores, maxLen, unk).foreach(p =>
          acc.update(p, acc.getOrElse(p, 0L) + c))
      }
      acc.toMap
    }
    var counts: Map[String, Long] = alpha ++ seed
    var scores = normalize(counts)
    def multis = counts.toSeq
      .filter { case (p, _) => !alpha.contains(p) && scores.contains(p) }
      .sortBy { case (p, n) => (-n, p) }.map(_._1)
    var m = multis.size
    var guard = 0
    while (m > vocabSize && guard < 64) {
      for (_ <- 0 until emIters) { counts = eStep(scores); scores = normalize(counts) }
      val survivors = multis
      val keep = math.max(vocabSize,
        math.ceil(survivors.size * (1.0 - pruneFrac)).toInt)
      val kept = survivors.take(keep).toSet
      scores = scores.filter { case (p, _) => alpha.contains(p) || kept(p) }
      m = kept.size
      guard += 1
    }
    counts = eStep(scores)
    scores = normalize(counts.filter { case (p, _) => scores.contains(p) })
    scores.toSeq.sortBy { case (p, lp) => (-lp, p) }
  }

  // ---- specs ------------------------------------------------------------

  private val corpus = Seq(
    "the cat sat on the mat",
    "the cats sat on the mats",
    "a hat and a bat and the cat",
    "that hat is the best hat",
    "thereby the theme thesis there")

  test("distributed vocabulary equals the single-node reference, piece for piece") {
    import spark.implicits._
    val docs = corpus.toDF("text")
    val got = UnigramLm.train(docs, "text", vocabSize = 8,
      maxPieceLen = 4, seedSize = 64, emIters = 2, pruneFrac = 0.25)
      .map(p => (p.piece, p.logProb))
    val want = refTrain(corpus, vocabSize = 8, maxLen = 4,
      seedSize = 64, emIters = 2, pruneFrac = 0.25)
    assert(got.map(_._1) === want.map(_._1))
    got.zip(want).foreach { case ((p, lp), (_, wlp)) =>
      assert(math.abs(lp - wlp) < 1e-12, s"logProb drift on '$p'")
    }
    // the 'th'/'the' family must survive on this corpus
    assert(got.map(_._1).exists(p => p == "th" || p == "the"))
  }

  test("viterbi picks the most probable segmentation; ties prefer the longer piece") {
    // exact-double tie: ab (-2.0) == a (-1.0) + b (-1.0) → longer wins
    val scores = Map("a" -> -1.0, "b" -> -1.0, "ab" -> -2.0)
    assert(UnigramLm.viterbi("abab", scores, 4, -100.0).toSeq === Seq("ab", "ab"))
    // a cheaper multi piece beats singles outright
    val s2 = Map("a" -> -3.0, "b" -> -3.0, "ab" -> -1.0)
    assert(UnigramLm.viterbi("aba", s2, 4, -100.0).toSeq === Seq("ab", "a"))
    // unknown code points fall back to unk singles — never a failure
    assert(UnigramLm.viterbi("axb", s2, 4, -100.0).toSeq === Seq("a", "x", "b"))
  }

  test("segmentation round-trips the corpus and compresses vs characters") {
    val docs = Tables.documents(spark, sf0001).select(col("doc_id"), col("text"))
    val vocab = UnigramLm.train(docs.filter(col("doc_id") < 100), "text",
      vocabSize = 64, maxPieceLen = 5, seedSize = 256, emIters = 1)
    assert(vocab.nonEmpty && vocab.map(_.piece).distinct.size === vocab.size)
    val seg = UnigramLm.segmentPartitioned(docs, "text", vocab, maxPieceLen = 5)
      .select(col("doc_id"), col("n_tokens"),
        (concat_ws("", col("tokens")) ===
          regexp_replace(col("text"), "\\s+", "")).as("ok"),
        length(regexp_replace(col("text"), "\\s+", "")).as("n_chars"))
      .agg(sum(when(col("ok"), 0L).otherwise(1L)).as("fails"),
        sum(col("n_tokens")).as("toks"), sum(col("n_chars")).as("chars"))
      .head()
    assert(seg.getLong(0) === 0L, "every doc must rebuild byte-exactly")
    assert(seg.getLong(1) < seg.getLong(2), "multi-cp pieces must compress")
  }

  test("training is deterministic across runs") {
    import spark.implicits._
    val docs = corpus.toDF("text")
    val a = UnigramLm.train(docs, "text", vocabSize = 8,
      maxPieceLen = 4, seedSize = 64, emIters = 2)
    val b = UnigramLm.train(docs, "text", vocabSize = 8,
      maxPieceLen = 4, seedSize = 64, emIters = 2)
    assert(a === b)
  }
}
