package graft.ext

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Chunker: coverage, overlap, and tail-rule invariants on constructed
  * docs plus the real corpus. */
class ChunkerSpec extends SparkSpec {
  import spark.implicits._

  private def doc(id: Long, nTokens: Int) =
    (id, (1 to nTokens).map(i => s"w$i").mkString(" "))

  test("chunk grid covers every token exactly; overlap = size - stride") {
    val docs = Seq(doc(1, 100), doc(2, 64), doc(3, 10), doc(4, 65)).toDF("doc_id", "text")
    val out = Chunker.chunk(docs, "doc_id", "text", 64, 48).cache()

    // n=100: starts 0 (len 64), 48 (len 52) — start 96 would add only 4 ≤ 16 fresh tokens
    assert(out.filter($"doc_id" === 1).select("chunk_start", "n_tokens")
      .as[(Long, Long)].collect().sorted.toSeq === Seq((0L, 64L), (48L, 52L)))
    // n=64: exactly one chunk
    assert(out.filter($"doc_id" === 2).count() === 1)
    // n=10 (< size): one short chunk of the whole doc
    assert(out.filter($"doc_id" === 3).select("n_tokens").as[Long].head() === 10L)
    // n=65: second chunk adds 17 > 16 fresh tokens, so it stays
    assert(out.filter($"doc_id" === 4).select("chunk_start", "n_tokens")
      .as[(Long, Long)].collect().sorted.toSeq === Seq((0L, 64L), (48L, 17L)))

    // coverage: union of [start, start+len) is [0, n) for every doc
    val cov = out.groupBy("doc_id")
      .agg(max($"chunk_start" + $"n_tokens").as("covered"), min("chunk_start").as("first"))
      .as[(Long, Long, Long)].collect().map(r => r._1 -> ((r._2, r._3))).toMap
    assert(cov(1L) === ((100L, 0L)) && cov(4L) === ((65L, 0L)))
  }

  test("chunk text content is the exact token slice") {
    val docs = Seq(doc(9, 70)).toDF("doc_id", "text")
    val rows = Chunker.chunk(docs, "doc_id", "text", 64, 48)
      .orderBy("chunk_start").select("chunk_text").as[String].collect()
    assert(rows(0).startsWith("w1 w2 ") && rows(0).endsWith(" w64"))
    assert(rows(1).startsWith("w49 ") && rows(1).endsWith(" w70"))
  }

  test("no shuffle: chunking plans without an Exchange") {
    val docs = Seq(doc(1, 100)).toDF("doc_id", "text")
    val plan = Chunker.chunk(docs, "doc_id", "text", 64, 48)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), s"unexpected shuffle in:\n$plan")
  }
}
