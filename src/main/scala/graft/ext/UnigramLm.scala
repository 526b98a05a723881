package graft.ext

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Distributed unigram-LM tokenizer training (Kudo 2018,
  * arXiv:1804.10959 — the SentencePiece "unigram" model): the other
  * major subword family next to BPE. Where BPE greedily LEARNS merges,
  * the unigram model fits a probability over a candidate piece inventory
  * and PRUNES it down: seed a large substring vocabulary, EM the piece
  * probabilities against the corpus, repeatedly drop the weakest pieces
  * until the target size remains; encoding is Viterbi — the most
  * probable segmentation under the final piece distribution.
  *
  * This implementation is the deterministic hard-EM (Viterbi-EM) form:
  * the E-step counts pieces over each word's single best segmentation
  * rather than the full lattice's expectations — the standard
  * reimplementation simplification, exact enough to train real
  * vocabularies and, unlike forward-backward sums, bit-reproducible
  * across partitionings (count accumulation is integer).
  *
  * == Scale shape (the [[BpeTrainer]] discipline) ==
  *
  * Every statistic is a function of the Zipf-bounded WORD-FREQUENCY
  * table, never the corpus: one corpus-sized shuffle builds (word, cnt);
  * seeding explodes code-point substrings of that table (O(len·maxLen)
  * per DISTINCT word) into a map-side-combined count and a seedSize-row
  * TakeOrdered; each EM round broadcasts the vocab (bounded: ≤ seedSize
  * rows of (piece, logProb)), Viterbi-segments the word table in
  * `mapPartitions` (per-word DP — the genuine per-partition-imperative
  * case, same justification as [[BpeTrainer.encodePartitioned]]) with
  * task-local count maps, and shuffles only slim (piece, partial-count)
  * rows; the driver holds vocab-size state per round (the k-row-centroid
  * class of bounded driver reads). The word table localCheckpoints once
  * and never changes — unlike BPE there is no per-round re-map.
  *
  * Determinism: counts are exact longs; probabilities are computed on
  * the driver as ln(count/total); Viterbi ties prefer the LONGER piece;
  * prune/seed ties break (count desc, piece asc). The learned vocabulary
  * is a pure function of the corpus (the q43 replay discipline), pinned
  * by UnigramLmSpec against an independent single-node reference.
  */
object UnigramLm {

  /** One vocabulary entry; `rank` orders by (logProb desc, piece asc). */
  final case class Piece(rank: Int, piece: String, logProb: Double)

  /** (w, cnt) — the Zipf-bounded table every stage runs over. */
  def wordCounts(docs: DataFrame, textCol: String): DataFrame =
    docs.select(explode(split(col(textCol), "\\s+")).as("w"))
      .filter(length(col("w")) > 0)
      .groupBy(col("w")).agg(count(lit(1)).as("cnt"))

  /** Viterbi segmentation of one word under `scores` (piece → logProb):
    * best[i] maximizes Σ logProb over a cover of the first i code
    * points; pieces are capped at `maxPieceLen` code points; an unknown
    * SINGLE code point falls back to `unkScore` (coverage guarantee —
    * segmentation never fails); ties prefer the longer piece. Shared by
    * the E-step and the encoder so they cannot drift. */
  private[ext] def viterbi(word: String, scores: Map[String, Double],
      maxPieceLen: Int, unkScore: Double): Array[String] = {
    val cps = word.codePoints().toArray
      .map(cp => new String(Character.toChars(cp)))
    val n = cps.length
    if (n == 0) return Array.empty
    val best = new Array[Double](n + 1)
    val back = new Array[Int](n + 1) // piece length chosen at i
    var i = 1
    while (i <= n) {
      best(i) = Double.NegativeInfinity
      var len = 1
      val maxL = math.min(maxPieceLen, i)
      while (len <= maxL) {
        val piece = cps.slice(i - len, i).mkString
        val s = scores.get(piece) match {
          case Some(lp) => lp
          case None => if (len == 1) unkScore else Double.NaN
        }
        if (!s.isNaN) {
          val cand = best(i - len) + s
          // >= : on exact ties the LONGER piece (scanned later) wins
          if (cand >= best(i)) { best(i) = cand; back(i) = len }
        }
        len += 1
      }
      i += 1
    }
    val out = scala.collection.mutable.ArrayBuffer.empty[String]
    var p = n
    while (p > 0) {
      out += cps.slice(p - back(p), p).mkString
      p -= back(p)
    }
    out.reverseIterator.toArray
  }

  /** Candidate substring scores over the word table: every code-point
    * substring of length 2..maxPieceLen, at every start position,
    * weighted by word count; returns the top `seedSize` by
    * (score desc, piece asc) — a TakeOrdered, never a global sort. */
  private def seedMulti(words: DataFrame, maxPieceLen: Int,
      seedSize: Int): Seq[(String, Long)] =
    words
      .select(filter(split(col("w"), ""), s => s =!= "").as("ch"), col("cnt"))
      // per start position i, lengths 2..maxPieceLen that stay in range
      // (a when/filter pair, NOT sequence(i+1, …): Spark's sequence runs
      // DESCENDING when start > stop, which would fabricate pieces at
      // word ends)
      .select(explode(flatten(transform(
        sequence(lit(1), size(col("ch"))),
        i => filter(transform(
          sequence(lit(2), lit(maxPieceLen)),
          l => when(i + l - 1 <= size(col("ch")),
            array_join(slice(col("ch"), i, l), ""))),
          x => x.isNotNull)))).as("piece"),
        col("cnt"))
      .groupBy(col("piece")).agg(sum(col("cnt")).as("n"))
      .orderBy(col("n").desc, col("piece"))
      .limit(seedSize)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toSeq

  /** The alphabet: every distinct single code point, with its weighted
    * occurrence count — always kept in the vocabulary (coverage). */
  private def alphabet(words: DataFrame): Seq[(String, Long)] =
    words
      .select(explode(filter(split(col("w"), ""), s => s =!= "")).as("piece"),
        col("cnt"))
      .groupBy(col("piece")).agg(sum(col("cnt")).as("n"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toSeq

  /** Hard-EM E-step: Viterbi-segment every distinct word under the
    * current scores, count pieces weighted by word count. Task-local
    * maps fold before the shuffle; only (piece, partial) rows move. */
  private def eStep(words: DataFrame, scores: Map[String, Double],
      maxPieceLen: Int, unkScore: Double): Map[String, Long] = {
    import org.apache.spark.sql.{Encoders, Row}
    val bc = words.sparkSession.sparkContext.broadcast(scores)
    val partials = words.mapPartitions { rows =>
      val sc = bc.value
      val local = new scala.collection.mutable.HashMap[String, Long]()
      rows.foreach { r =>
        val (w, cnt) = (r.getString(0), r.getLong(1))
        viterbi(w, sc, maxPieceLen, unkScore).foreach { p =>
          local.update(p, local.getOrElse(p, 0L) + cnt)
        }
      }
      local.iterator.map { case (p, n) => Row(p, n) }
    }(Encoders.row(org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("piece",
        org.apache.spark.sql.types.StringType),
      org.apache.spark.sql.types.StructField("n",
        org.apache.spark.sql.types.LongType)))))
    partials.groupBy(col("piece")).agg(sum(col("n")).as("n"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
  }

  /** ln-normalized scores from counts; alphabet pieces floor at count 1
    * so coverage survives EM (a dropped letter would make some word
    * unsegmentable except through the unk penalty). */
  private def normalize(alpha: Seq[String],
      counts: Map[String, Long]): Map[String, Double] = {
    val floored = counts ++ alpha.map(a => a -> math.max(1L, counts.getOrElse(a, 0L)))
    val kept = floored.filter(_._2 > 0L)
    val total = kept.values.sum.toDouble
    kept.map { case (p, n) => p -> math.log(n / total) }
  }

  /** Train a unigram-LM vocabulary of ~`vocabSize` multi-code-point
    * pieces (plus the full alphabet): seed → (EM ×`emIters`, prune the
    * weakest `pruneFrac`) until the multi inventory fits, then a final
    * EM pass scores the survivors. Returns pieces ranked by
    * (logProb desc, piece asc). */
  def train(docs: DataFrame, textCol: String, vocabSize: Int,
      maxPieceLen: Int = 6, seedSize: Int = 1024, emIters: Int = 2,
      pruneFrac: Double = 0.25): Seq[Piece] = {
    require(vocabSize > 0 && seedSize >= vocabSize,
      "need vocabSize > 0 and seedSize >= vocabSize")
    require(maxPieceLen >= 2, "maxPieceLen must be >= 2")
    val words = wordCounts(docs, textCol).localCheckpoint()
    try {
      val alpha = alphabet(words)
      val alphaPieces = alpha.map(_._1)
      val seed = seedMulti(words, maxPieceLen, seedSize)
        .filterNot(p => alphaPieces.contains(p._1))
      var counts: Map[String, Long] = (alpha ++ seed).toMap
      var scores = normalize(alphaPieces, counts)
      val unkOf = (s: Map[String, Double]) => s.values.min - 10.0

      def multisBySupport: Seq[String] = counts.toSeq
        .filter { case (p, _) => !alphaPieces.contains(p) && scores.contains(p) }
        .sortBy { case (p, n) => (-n, p) }.map(_._1)

      var multiCount = multisBySupport.size
      var guard = 0
      while (multiCount > vocabSize && guard < 64) {
        for (_ <- 0 until emIters) {
          counts = eStep(words, scores, maxPieceLen, unkOf(scores))
          scores = normalize(alphaPieces, counts)
        }
        val survivors = multisBySupport
        val keep = math.max(vocabSize,
          math.ceil(survivors.size * (1.0 - pruneFrac)).toInt)
        val kept = survivors.take(keep).toSet
        scores = scores.filter { case (p, _) =>
          alphaPieces.contains(p) || kept(p) }
        multiCount = kept.size
        guard += 1
      }
      // final pass re-scores exactly the surviving inventory
      counts = eStep(words, scores, maxPieceLen, unkOf(scores))
      scores = normalize(alphaPieces,
        counts.filter { case (p, _) => scores.contains(p) })
      scores.toSeq.sortBy { case (p, lp) => (-lp, p) }.zipWithIndex
        .map { case ((p, lp), i) => Piece(i, p, lp) }
    } finally words.unpersist()
  }

  /** The production encoder: broadcast (piece → logProb), Viterbi per
    * word inside `mapPartitions` with a task-local word memo (Zipf: the
    * top few thousand words cover most tokens) — constant plan size at
    * any vocabulary size, the [[BpeTrainer.encodePartitioned]] shape.
    * Adds `tokens` (array) and `n_tokens`. */
  def segmentPartitioned(docs: DataFrame, textCol: String,
      vocab: Seq[Piece], maxPieceLen: Int = 6): DataFrame = {
    import org.apache.spark.sql.Row
    import org.apache.spark.sql.types.{ArrayType, IntegerType, StringType, StructField, StructType}
    val spark = docs.sparkSession
    val scores = vocab.map(p => p.piece -> p.logProb).toMap
    val unkScore = scores.values.min - 10.0
    val bc = spark.sparkContext.broadcast(scores)
    val outSchema = StructType(docs.schema.fields ++ Seq(
      StructField("tokens", ArrayType(StringType, containsNull = false)),
      StructField("n_tokens", IntegerType, nullable = false)))
    val outEnc = org.apache.spark.sql.Encoders.row(outSchema)
    val textIdx = docs.schema.fieldIndex(textCol)
    docs.mapPartitions { rows =>
      val sc = bc.value
      val memo = new java.util.LinkedHashMap[String, Array[String]](1 << 12, 0.75f, true) {
        override def removeEldestEntry(
            e: java.util.Map.Entry[String, Array[String]]): Boolean = size > 8192
      }
      def seg(w: String): Array[String] = {
        val cached = memo.get(w)
        if (cached != null) return cached
        val arr = viterbi(w, sc, maxPieceLen, unkScore)
        memo.put(w, arr)
        arr
      }
      rows.map { row =>
        val text = row.getString(textIdx)
        val toks: Array[String] =
          if (text == null) Array.empty
          else text.split("\\s+").iterator.filter(_.nonEmpty)
            .flatMap(seg).toArray
        Row.fromSeq(row.toSeq ++ Seq(toks.toSeq, toks.length))
      }
    }(outEnc)
  }
}
