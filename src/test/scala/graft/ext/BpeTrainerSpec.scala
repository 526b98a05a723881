package graft.ext

import org.apache.spark.sql.functions._

import graft.{SparkSpec, Tables}

/** BPE trainer vs an independent single-node reference implementation:
  * identical merge tables, identical encodings, lossless round-trip. */
class BpeTrainerSpec extends SparkSpec {

  /** Plain-Scala reference BPE (Sennrich form, same tie-break). */
  private def referenceTrain(corpus: Seq[String], numMerges: Int,
      minPairCount: Long): Seq[(String, String, Long)] = {
    var words: Map[Vector[String], Long] = corpus
      .flatMap(_.split("\\s+")).filter(_.nonEmpty)
      .groupBy(identity).map { case (w, ws) =>
        w.split("").filter(_.nonEmpty).toVector -> ws.size.toLong
      }
    val out = Seq.newBuilder[(String, String, Long)]
    var continue = true
    var rank = 0
    while (rank < numMerges && continue) {
      val counts = scala.collection.mutable.Map.empty[(String, String), Long]
      words.foreach { case (syms, c) =>
        syms.zip(syms.tail).foreach(p =>
          counts(p) = counts.getOrElse(p, 0L) + c)
      }
      val best = counts.toSeq
        .sortBy { case ((l, r), n) => (-n, l, r) }.headOption
      best.filter(_._2 >= minPairCount) match {
        case None => continue = false
        case Some(((l, r), n)) =>
          out += ((l, r, n))
          words = words.map { case (syms, c) =>
            val acc = scala.collection.mutable.ArrayBuffer.empty[String]
            syms.foreach { s =>
              if (acc.nonEmpty && acc.last == l && s == r) {
                acc.remove(acc.length - 1); acc += (l + r)
              } else acc += s
            }
            acc.toVector -> c
          }
          rank += 1
      }
    }
    out.result()
  }

  private def referenceEncode(word: String,
      merges: Seq[(String, String)]): Vector[String] =
    merges.foldLeft(word.split("").filter(_.nonEmpty).toVector) {
      case (syms, (l, r)) =>
        val acc = scala.collection.mutable.ArrayBuffer.empty[String]
        syms.foreach { s =>
          if (acc.nonEmpty && acc.last == l && s == r) {
            acc.remove(acc.length - 1); acc += (l + r)
          } else acc += s
        }
        acc.toVector
    }

  private val corpus = Seq(
    "the cat sat on the mat",
    "the cats sat on the mats",
    "a hat and a bat and the cat",
    "that hat is the best hat",
    "aaa aaaa aa the the the")

  test("distributed merges equal the single-node reference, rank for rank") {
    import spark.implicits._
    val docs = corpus.toDF("text")
    val got = BpeTrainer.train(docs, "text", numMerges = 12, minPairCount = 2)
      .map(m => (m.left, m.right, m.count))
    val want = referenceTrain(corpus, 12, 2)
    assert(got === want)
    // the tiny corpus legitimately runs dry below the 12-merge budget —
    // both sides must stop at the same rank
    assert(got.size >= 8)
    // "th"+"e" family must surface early on this corpus
    assert(got.take(3).map(t => (t._1, t._2)).contains(("t", "h")))
  }

  test("early stop below the pair-count floor") {
    import spark.implicits._
    val docs = Seq("ab cd ef").toDF("text") // every pair is a hapax
    assert(BpeTrainer.train(docs, "text", 5, minPairCount = 2).isEmpty)
    val one = BpeTrainer.train(Seq("ab ab xy").toDF("text"), "text", 5, minPairCount = 2)
    assert(one === Seq(BpeTrainer.Merge(0, "a", "b", 2L)))
  }

  test("encode matches the reference and reconstructs the text losslessly") {
    import spark.implicits._
    val docs = corpus.toDF("text")
    val merges = BpeTrainer.train(docs, "text", 10, 2)
    val refMerges = merges.map(m => (m.left, m.right))

    val enc = BpeTrainer.encode(docs, "text", merges)
      .select(col("text"), col("tokens"), col("n_tokens")).collect()
    enc.foreach { r =>
      val text = r.getString(0)
      val tokens = r.getSeq[String](1)
      val wantTokens = text.split("\\s+").filter(_.nonEmpty)
        .flatMap(w => referenceEncode(w, refMerges)).toSeq
      assert(tokens === wantTokens, s"encoding drift on '$text'")
      // merges never lose characters: concat(tokens) == concat(words)
      assert(tokens.mkString === text.split("\\s+").filter(_.nonEmpty).mkString)
      assert(r.getInt(2) === tokens.size)
      // merging strictly compresses vs character count
      assert(tokens.size < text.count(!_.isWhitespace) || merges.isEmpty)
    }
  }

  test("partitioned encoder ≡ fold encoder on the gate corpus at K=16") {
    val docs = Tables.documents(spark, sf0001).select("doc_id", "text").limit(200)
    val merges = BpeTrainer.train(docs, "text", 16, 2)
    assert(merges.size === 16)
    val fold = BpeTrainer.encode(docs, "text", merges)
      .select("doc_id", "tokens", "n_tokens")
    val part = BpeTrainer.encodePartitioned(docs, "text", merges)
      .select("doc_id", "tokens", "n_tokens")
    assert(fold.exceptAll(part).isEmpty && part.exceptAll(fold).isEmpty,
      "trie-encode must equal fold-encode token for token")
  }

  test("partitioned encoder handles a 65k-merge vocabulary the fold path cannot express") {
    import spark.implicits._
    // Synthetic binary-tree vocabulary over 2^16 DISTINCT leaves
    // (supplementary-plane code points — also exercises the surrogate-
    // pair path): level ℓ's merges pair up adjacent level-(ℓ-1) symbols
    // left to right, ranked level-major. 65 535 merges totalling
    // O(L log L) key bytes; the word collapses to ONE token only if
    // every merge applies in exact rank order.
    val depth = 16
    val leaves = (0 until (1 << depth)).map(i => new String(Character.toChars(0x20000 + i)))
    val word = leaves.mkString
    val mergesB = Seq.newBuilder[BpeTrainer.Merge]
    var level = leaves
    var rank = 0
    while (level.size > 1) {
      val nextLevel = level.grouped(2).map { case Seq(l, r) =>
        mergesB += BpeTrainer.Merge(rank, l, r, 2L); rank += 1; l + r
      }.toIndexedSeq
      level = nextLevel
    }
    val merges = mergesB.result()
    assert(merges.size === (1 << depth) - 1) // 65 535 — 1000× the fold cap
    val docs = Seq(word, word.take(4), leaves.head * 3).toDF("text")
    val enc = BpeTrainer.encodePartitioned(docs, "text", merges)
      .select(col("text"), col("tokens"), col("n_tokens")).collect()
      .map(r => r.getString(0) -> r.getSeq[String](1)).toMap
    // the full word collapses to a single token...
    assert(enc(word) === Seq(word))
    // ...the first two leaves (4 chars: surrogate pairs) to the rank-0 symbol
    assert(enc(word.take(4)) === Seq(word.take(4)))
    // ...and a word with no applicable merge stays per-leaf symbols
    assert(enc(leaves.head * 3) === Seq(leaves.head, leaves.head, leaves.head))
    // round-trip: token concatenation rebuilds every word byte-exactly
    enc.foreach { case (text, toks) =>
      assert(toks.mkString === text.replaceAll("\\s+", ""))
    }
  }

  test("trains on the documents corpus and compresses it") {
    val docs = Tables.documents(spark, sf0001).select("doc_id", "text")
    val merges = BpeTrainer.train(docs.limit(200), "text", 8, 2)
    assert(merges.size === 8)
    val enc = BpeTrainer.encode(docs.limit(200), "text", merges)
      .agg(sum(col("n_tokens")), sum(length(regexp_replace(col("text"), "\\s+", ""))))
      .collect()(0)
    assert(enc.getLong(0) < enc.getLong(1),
      "BPE tokens must number fewer than raw characters")
  }
}
