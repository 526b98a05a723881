package graft.ext

import org.apache.spark.sql.functions._

import graft.{SparkSpec, Tables}

/** WordPiece vs an independent single-node reference: identical
  * likelihood-scored merge tables, identical greedy encodings, the `##`
  * convention and whole-word [UNK] semantics pinned. */
class WordPieceSpec extends SparkSpec {

  // ---- independent single-node reference --------------------------------

  private def refWordSyms(corpus: Seq[String]): Map[Vector[String], Long] =
    corpus.flatMap(_.split("\\s+")).filter(_.nonEmpty)
      .groupBy(identity).map { case (w, ws) =>
        val chars = w.split("").filter(_.nonEmpty).toVector
        (chars.head +: chars.tail.map("##" + _)) -> ws.size.toLong
      }

  private def refTrain(corpus: Seq[String], numMerges: Int,
      minPairCount: Long): Seq[(String, String, Long, Double)] = {
    var words = refWordSyms(corpus)
    val out = Seq.newBuilder[(String, String, Long, Double)]
    var rank = 0
    var go = true
    while (rank < numMerges && go) {
      val pc = scala.collection.mutable.Map.empty[(String, String), Long]
      val sc = scala.collection.mutable.Map.empty[String, Long]
      words.foreach { case (syms, c) =>
        syms.foreach(s => sc(s) = sc.getOrElse(s, 0L) + c)
        syms.zip(syms.tail).foreach(p => pc(p) = pc.getOrElse(p, 0L) + c)
      }
      val best = pc.toSeq.filter(_._2 >= minPairCount)
        .map { case ((l, r), n) =>
          (l, r, n, n.toDouble / (sc(l) * sc(r))) }
        .sortBy { case (l, r, _, s) => (-s, l, r) }.headOption
      best match {
        case None => go = false
        case Some((l, r, n, s)) =>
          out += ((l, r, n, s))
          val m = WordPiece.merged(l, r)
          words = words.map { case (syms, c) =>
            val acc = scala.collection.mutable.ArrayBuffer.empty[String]
            syms.foreach { sym =>
              if (acc.nonEmpty && acc.last == l && sym == r) {
                acc.remove(acc.length - 1); acc += m
              } else acc += sym
            }
            acc.toVector -> c
          }
          rank += 1
      }
    }
    out.result()
  }

  private def refEncode(w: String, vocab: Set[String]): Vector[String] = {
    val out = scala.collection.mutable.ArrayBuffer.empty[String]
    var start = 0
    while (start < w.length) {
      var end = w.length
      var hit: String = null
      while (end > start && hit == null) {
        val cand = (if (start == 0) "" else "##") + w.substring(start, end)
        if (vocab(cand)) hit = cand else end -= 1
      }
      if (hit == null) return Vector(WordPiece.Unk)
      out += hit; start = end
    }
    out.toVector
  }

  // ---- specs ------------------------------------------------------------

  private val corpus = Seq(
    "the cat sat on the mat",
    "the cats sat on the mats",
    "a hat and a bat and the cat",
    "that hat is the best hat",
    "hugging hugged hugs the thug")

  test("distributed merges equal the single-node reference, rank for rank") {
    import spark.implicits._
    val docs = corpus.toDF("text")
    val got = WordPiece.train(docs, "text", numMerges = 10, minPairCount = 2)
      .map(m => (m.left, m.right, m.count))
    val want = refTrain(corpus, 10, 2).map(t => (t._1, t._2, t._3))
    assert(got === want)
    assert(got.size >= 6)
    // the continuation convention must show in the learned pairs
    assert(got.exists { case (_, r, _) => r.startsWith("##") })
  }

  test("likelihood scoring differs from raw frequency where it should") {
    import spark.implicits._
    // 'xq' appears only together (score 1/(2·2)·2 …) while 'th' is more
    // frequent but its parts are everywhere — WordPiece must prefer the
    // exclusive pair, BPE the frequent one.
    val biased = Seq(
      "the the the the there then they",
      "xq xq")
    val wp = WordPiece.train(biased.toDF("text"), "text",
      numMerges = 1, minPairCount = 2)
    assert(wp.head.left === "x" && wp.head.right === "##q",
      s"expected the exclusive pair first, got ${wp.head}")
    // (h,e) and (t,h) tie at 7 occurrences; BPE's (count, l, r) break
    // picks (h,e) — either way, frequency chose a 'the'-family pair
    val bpe = BpeTrainer.train(biased.toDF("text"), "text",
      numMerges = 1, minPairCount = 2)
    assert(bpe.head.left === "h" && bpe.head.right === "e")
  }

  test("greedy encoder: longest match, ## continuations, whole-word [UNK]") {
    import spark.implicits._
    val docs = corpus.toDF("text")
    val merges = WordPiece.train(docs, "text", numMerges = 10, minPairCount = 2)
    val pieces = WordPiece.vocab(docs, "text", merges)
    // distributed ≡ reference on every corpus word
    val words = corpus.flatMap(_.split(" ")).distinct
    val enc = WordPiece.encodeGreedy(words.toDF("text"), "text", pieces)
      .select(col("text"), col("tokens")).collect()
      .map(r => r.getString(0) -> r.getSeq[String](1).toVector).toMap
    words.foreach { w =>
      assert(enc(w) === refEncode(w, pieces), s"encode mismatch on '$w'")
      // round-trip: strip ## and concatenate
      assert(enc(w).map(_.stripPrefix("##")).mkString === w)
    }
    // unseen character → the WHOLE word becomes [UNK], BERT semantics
    val unk = WordPiece.encodeGreedy(Seq("caßt").toDF("text"), "text", pieces)
      .select(col("tokens")).head().getSeq[String](0)
    assert(unk === Seq(WordPiece.Unk))
  }

  test("corpus round-trips with a full-corpus alphabet and compresses") {
    val docs = Tables.documents(spark, sf0001).select(col("doc_id"), col("text"))
    val merges = WordPiece.train(docs.filter(col("doc_id") < 100), "text",
      numMerges = 24, minPairCount = 2)
    val pieces = WordPiece.vocab(docs, "text", merges)
    val res = WordPiece.encodeGreedy(docs, "text", pieces)
      .select(col("n_tokens"),
        (concat_ws("", transform(col("tokens"),
          t => regexp_replace(t, "^##", ""))) ===
          regexp_replace(col("text"), "\\s+", "")).as("ok"),
        length(regexp_replace(col("text"), "\\s+", "")).as("n_chars"))
      .agg(sum(when(col("ok"), 0L).otherwise(1L)).as("fails"),
        sum(col("n_tokens")).as("toks"), sum(col("n_chars")).as("chars"))
      .head()
    assert(res.getLong(0) === 0L)
    assert(res.getLong(1) < res.getLong(2))
  }
}
