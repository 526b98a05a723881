package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.ext.MinHashIndex

/** ST14 contracts: the streaming probe equals the batch probe over
  * multi-batch delivery, the pair stream stays append-only with no
  * stateless-stage streaming state, and the watermarked layer emits
  * each pair exactly once. */
class StreamNearDupSpec extends SparkSpec {

  private def ts(s: String) = Timestamp.valueOf(s)

  // Small corpus with planted near-dups: docs 1/2 share a passage,
  // doc 3 is distinct boilerplate.
  private def corpus = {
    val s = spark; import s.implicits._
    Seq(
      (1L, "alpha beta gamma delta epsilon zeta eta theta iota kappa"),
      (2L, "common words fill this document with ordinary text here"),
      (3L, "totally different content about streams and indexes here"))
      .toDF("doc_id", "text")
  }

  test("stream probe == batch probe, across micro-batches") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    val s = spark; import s.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val index = MinHashIndex.build(corpus, "doc_id", "text",
      shingleK = 3, numHashes = 128, numBands = 32)
    try {
      val incoming = Seq(
        // near-dup of doc 1 (one word changed at the tail)
        (100L, ts("2026-01-01 00:00:00"),
          "alpha beta gamma delta epsilon zeta eta theta iota lambda"),
        // exact copy of doc 2
        (101L, ts("2026-01-01 00:01:00"),
          "common words fill this document with ordinary text here"),
        // unrelated
        (102L, ts("2026-01-01 00:02:00"),
          "nothing in the corpus resembles this sentence at all"))

      val mem = MemoryStream[(Long, Timestamp, String)]
      val streamed = StreamNearDup.pairs(index,
        mem.toDF().toDF("doc_id", "ts", "text"),
        "doc_id", "text", "ts", threshold = 0.5)
      val q = streamed.writeStream.format("memory").queryName("snd_pairs")
        .outputMode("append").start()
      try {
        mem.addData(incoming.take(1))
        q.processAllAvailable()
        mem.addData(incoming.drop(1))
        q.processAllAvailable()
      } finally q.stop()

      val got = spark.table("snd_pairs")
        .select("id_a", "id_b", "jaccard")
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
        .toSet // collapse at-least-once band duplicates
      val batch = MinHashIndex.probe(index,
          incoming.toDF("doc_id", "ts", "text"), "doc_id", "text",
          threshold = 0.5)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
        .toSet
      assert(got === batch)
      assert(batch.map(p => (p._1, p._2)) === Set((1L, 100L), (2L, 101L)),
        s"planted pairs wrong: $batch")
      assert(batch.exists(p => p._1 == 2L && p._3 == 1.0),
        "exact copy must verify at jaccard 1.0")
    } finally MinHashIndex.drop(index)
  }

  test("deduped layer: each pair once, duplicates within watermark evicted") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    val s = spark; import s.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val index = MinHashIndex.build(corpus, "doc_id", "text",
      shingleK = 3, numHashes = 128, numBands = 32)
    try {
      val dup = (100L, ts("2026-01-01 00:00:00"),
        "common words fill this document with ordinary text here")
      val mem = MemoryStream[(Long, Timestamp, String)]
      val streamed = StreamNearDup.dedupedPairs(index,
        mem.toDF().toDF("doc_id", "ts", "text"),
        "doc_id", "text", "ts", threshold = 0.5, watermark = "10 minutes")
      val q = streamed.writeStream.format("memory").queryName("snd_dedup")
        .outputMode("append").start()
      try {
        mem.addData(dup)
        q.processAllAvailable()
        mem.addData(dup) // redelivery inside the watermark
        q.processAllAvailable()
      } finally q.stop()
      val rows = spark.table("snd_dedup").select("id_a", "id_b").collect()
      assert(rows.length == 1, s"expected exactly-once pair, got ${rows.length}")
      assert((rows.head.getLong(0), rows.head.getLong(1)) == ((2L, 100L)))
    } finally MinHashIndex.drop(index)
  }

  test("plan shape: pair dedup sits below the shingle-fetch verify join") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import org.apache.spark.sql.catalyst.plans.logical.{DeduplicateWithinWatermark, Join}
    val s = spark; import s.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val index = MinHashIndex.build(corpus, "doc_id", "text",
      shingleK = 3, numHashes = 128, numBands = 32)
    try {
      val df = StreamNearDup.dedupedPairs(index,
        MemoryStream[(Long, Timestamp, String)].toDF()
          .toDF("doc_id", "ts", "text"),
        "doc_id", "text", "ts", threshold = 0.5, watermark = "10 minutes")
      val plan = df.queryExecution.analyzed
      val dedups = plan.collect { case d: DeduplicateWithinWatermark => d }
      assert(dedups.size == 1, s"expected one dedup stage, got ${dedups.size}")
      val joinsBelowDedup = dedups.head.collect { case j: Join => j }.size
      val joinsTotal = plan.collect { case j: Join => j }.size
      // band join below the dedup, shingle-fetch verify join above it:
      // a pair colliding in b bands must verify once, not b times
      assert(joinsBelowDedup == 1 && joinsTotal == 2,
        s"dedup must sit between the band join and the verify join " +
          s"(below=$joinsBelowDedup total=$joinsTotal)")
    } finally MinHashIndex.drop(index)
  }
}
