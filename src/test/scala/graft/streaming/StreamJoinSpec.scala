package graft.streaming

import org.apache.spark.sql.functions._

import graft.{SparkSpec, Tables}
import graft.ext.TemporalJoin

/** Stream-equals-batch contract for the stream-stream interval join (ST3):
  * replaying the events table as two file-source streams through
  * [[StreamJoin.intervalJoin]] must produce exactly the pair set of the
  * batch operator [[TemporalJoin.intervalPairs]] (Q58's shape). */
class StreamJoinSpec extends SparkSpec {

  test("replayed stream interval join equals the batch intervalPairs") {
    val events = Tables.events(spark, sf0001)
    val dir = java.nio.file.Files.createTempDirectory("events-sj").toString
    events.repartition(4).write.mode("overwrite").parquet(dir)
    val batchView = spark.read.parquet(dir)

    def sideStream(eventType: String) = spark.readStream
      .schema(batchView.schema)
      .option("maxFilesPerTrigger", "1")
      .parquet(dir)
      .filter(col("event_type") === eventType)

    // Replay disorder spans the whole table (files are random splits), so
    // the equivalence contract needs a watermark >= the full time range —
    // with bounded disorder the stream equals batch, which is what we test.
    // The bounded-watermark eviction path is covered by the next test.
    val joined = StreamJoin.intervalJoin(
      sideStream("click"), sideStream("purchase"),
      keyCol = "user_id", fromTsCol = "ts", toTsCol = "ts",
      fromIdCol = "event_id", toIdCol = "event_id", windowSec = 7200,
      watermark = "3650 days")
    val q = joined.writeStream.format("memory").queryName("sj_pairs")
      .outputMode("append").start()
    try q.processAllAvailable() finally q.stop()

    val streamed = spark.table("sj_pairs")
      .select("key", "from_id", "to_id", "gap_us")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSet

    val batch = TemporalJoin.intervalPairs(batchView, "user_id", "ts",
        "event_id", "event_type", "click", "purchase", 7200)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSet

    assert(streamed === batch)
    assert(batch.nonEmpty)
  }

  test("interval bounds are strict-left / inclusive-right and state-evictable") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    def ts(s: String) = java.sql.Timestamp.valueOf(s)

    val clicks = MemoryStream[(Long, Long, java.sql.Timestamp)]
    val buys = MemoryStream[(Long, Long, java.sql.Timestamp)]
    val joined = StreamJoin.intervalJoin(
      clicks.toDF().toDF("user_id", "event_id", "ts"),
      buys.toDF().toDF("user_id", "event_id", "ts"),
      "user_id", "ts", "ts", "event_id", "event_id",
      windowSec = 1800, watermark = "10 minutes")
    val q = joined.writeStream.format("memory").queryName("sj_bounds")
      .outputMode("append").start()
    try {
      clicks.addData((1L, 10L, ts("2026-01-01 00:00:00")))
      buys.addData(
        (1L, 20L, ts("2026-01-01 00:00:00")), // simultaneous: excluded
        (1L, 21L, ts("2026-01-01 00:30:00")), // at edge: included
        (1L, 22L, ts("2026-01-01 00:30:01")), // past edge: excluded
        (2L, 23L, ts("2026-01-01 00:10:00"))) // other key: excluded
      q.processAllAvailable()
      // push both watermarks far forward so click state must be evicted...
      clicks.addData((9L, 90L, ts("2026-01-02 00:00:00")))
      buys.addData((9L, 91L, ts("2026-01-02 00:00:00")))
      q.processAllAvailable()
      // ...then a purchase inside the old click's window arrives too late
      buys.addData((1L, 24L, ts("2026-01-01 00:20:00")))
      q.processAllAvailable()
    } finally q.stop()

    val got = spark.table("sj_bounds")
      .select("from_id", "to_id").as[(Long, Long)].collect().toSet
    assert(got === Set((10L, 21L)))
  }

  test("left-outer interval join emits null-padded rows when the window closes unmatched") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    def ts(s: String) = java.sql.Timestamp.valueOf(s)

    val clicks = MemoryStream[(Long, Long, java.sql.Timestamp)]
    val buys = MemoryStream[(Long, Long, java.sql.Timestamp)]
    val joined = StreamJoin.intervalJoinLeftOuter(
      clicks.toDF().toDF("user_id", "event_id", "ts"),
      buys.toDF().toDF("user_id", "event_id", "ts"),
      "user_id", "ts", "ts", "event_id", "event_id",
      windowSec = 1800, watermark = "10 minutes")
    val q = joined.writeStream.format("memory").queryName("sj_outer")
      .outputMode("append").start()
    try {
      // u1 converts; u2 abandons (no purchase in its 30-min window)
      clicks.addData(
        (1L, 10L, ts("2026-01-01 00:00:00")),
        (2L, 11L, ts("2026-01-01 00:00:00")))
      buys.addData((1L, 20L, ts("2026-01-01 00:15:00")))
      q.processAllAvailable()
      // u2's outer row cannot emit yet: a purchase might still arrive.
      val early = spark.table("sj_outer").select("from_id").as[Long].collect().toSet
      assert(!early.contains(11L), "outer row emitted before the window closed")
      // advance both watermarks past u2's window end + delay → eviction
      clicks.addData((9L, 90L, ts("2026-01-02 00:00:00")))
      buys.addData((9L, 91L, ts("2026-01-02 00:00:00")))
      q.processAllAvailable()
    } finally q.stop()

    val rows = spark.table("sj_outer")
      .select("from_id", "to_id").collect()
      .map(r => (r.getLong(0), if (r.isNullAt(1)) None else Some(r.getLong(1)))).toSet
    assert(rows === Set((10L, Some(20L)), (11L, None)))
  }
}
