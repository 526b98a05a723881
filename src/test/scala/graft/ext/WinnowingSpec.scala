package graft.ext

import java.nio.charset.StandardCharsets.UTF_8
import java.security.MessageDigest

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Contracts for [[Winnowing]]: independent-reference equality (which
  * exercises the rightmost-tie rule — small-vocab docs repeat k-grams),
  * the coverage guarantee, window/short-doc edges, and the overlap join
  * with its boilerplate guard. */
class WinnowingSpec extends SparkSpec {

  private def md5Long(s: String): Long = {
    val d = MessageDigest.getInstance("MD5").digest(s.getBytes(UTF_8))
    java.lang.Long.parseLong(d.take(4).map(b => f"$b%02x").mkString, 16)
  }

  /** Independent single-node winnowing, same semantics. */
  private def refFps(text: String, k: Int, w: Int): Set[(Int, Long)] = {
    val toks = text.trim.toLowerCase.split("\\s+").toSeq
    if (toks.size < k) Set.empty
    else {
      val hs = toks.sliding(k).map(g => md5Long(g.mkString(" "))).toVector
      val n = hs.size
      val starts = if (n >= w) 1 to (n - w + 1) else Seq(1)
      starts.map { s =>
        val win = hs.slice(s - 1, math.min(s - 1 + w, n))
        val m = win.min
        val j = s + win.lastIndexOf(m) // rightmost minimal, 1-based
        (j, m)
      }.toSet
    }
  }

  private def df(rows: Seq[(Long, String)]): DataFrame = {
    val s = spark; import s.implicits._
    rows.toDF("doc_id", "text")
  }

  private def run(rows: Seq[(Long, String)], k: Int = 3, w: Int = 4):
      Map[Long, Set[(Int, Long)]] =
    Winnowing.fingerprints(df(rows), "doc_id", "text", k, w)
      .collect()
      .map(r => (r.getLong(0), (r.getInt(1), r.getLong(2))))
      .groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap

  test("spark array form == independent reference, doc for doc") {
    // small vocab -> repeated k-grams -> real hash ties inside windows
    val vocab = Seq("a", "b", "c", "d")
    val docs = (1L to 30L).map { i =>
      val len = 5 + (i % 17).toInt
      i -> (0 until len).map(j => vocab(((i * 31 + j * 7) % 4).toInt)).mkString(" ")
    }
    val got = run(docs)
    for ((id, text) <- docs) {
      val want = refFps(text, 3, 4)
      assert(got.getOrElse(id, Set.empty) == want, s"doc $id: '$text'")
    }
  }

  test("coverage: a shared passage of length >= w+k-1 yields a shared fingerprint") {
    val passage = "alpha beta gamma delta epsilon zeta" // 6 tokens = w+k-1
    val docs = Seq(
      1L -> s"one two three $passage four five six seven",
      2L -> s"nine ten $passage eleven twelve thirteen fourteen fifteen")
    val got = run(docs)
    val shared = got(1L).map(_._2) intersect got(2L).map(_._2)
    assert(shared.nonEmpty, "winnowing coverage guarantee violated")
  }

  test("edges: doc shorter than k emits nothing; n < w winnows one window") {
    val got = run(Seq(1L -> "a b", 2L -> "a b c d"), k = 3, w = 4)
    assert(!got.contains(1L), "2 tokens < k=3: no k-grams")
    // 4 tokens -> 2 k-grams < w -> exactly one window -> one fingerprint
    assert(got(2L).size == 1)
    assert(got(2L) == refFps("a b c d", 3, 4))
  }

  test("overlapPairs == brute force, and the boilerplate guard drops hot hashes") {
    val boiler = "common common common common common common"
    val docs = (1L to 10L).map(i => i -> s"u$i v$i w$i $boiler x$i y$i") ++
      Seq(20L -> "alpha beta gamma delta epsilon zeta unique tail here",
        21L -> "pre text alpha beta gamma delta epsilon zeta post words")
    val fps = Winnowing.fingerprints(df(docs), "doc_id", "text", 3, 4)
    val pairs = Winnowing.overlapPairs(fps, maxDf = 5, topN = 100)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    // brute force on the collected fingerprints with the same guard
    val byDoc = fps.collect().map(r => r.getLong(0) -> r.getLong(2))
      .groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    val hot = byDoc.values.flatten.groupBy(identity).view.mapValues(_.size)
      .filter(_._2 > 5).keySet
    val want = (for {
      a <- byDoc.keys; b <- byDoc.keys if a < b
      n = ((byDoc(a) intersect byDoc(b)) diff hot).size if n > 0
    } yield (a, b) -> n.toLong).toMap
    assert(pairs == want)
    // the copied-passage pair must surface
    assert(pairs.contains((20L, 21L)))
  }
}
