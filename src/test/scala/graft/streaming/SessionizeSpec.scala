package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import graft.{SparkSpec, Tables}

class SessionizeSpec extends SparkSpec {

  private def ts(s: String) = Timestamp.valueOf(s)

  test("batch sessionization: gap splits, bounds and counts") {
    val spark0 = spark
    import spark0.implicits._
    val events = Seq(
      (1L, ts("2026-01-01 10:00:00")), (1L, ts("2026-01-01 10:10:00")),
      (1L, ts("2026-01-01 13:00:00")),                       // > 30min gap → new session
      (2L, ts("2026-01-01 09:00:00"))).toDF("user_id", "ts")
    val out = Sessionize.batch(events, gapMinutes = 30)
      .orderBy("user_id", "session_start")
      .collect().map(r => (r.getLong(0), r.getTimestamp(1), r.getTimestamp(2), r.getLong(3)))
    assert(out.toSeq === Seq(
      (1L, ts("2026-01-01 10:00:00"), ts("2026-01-01 10:10:00"), 2L),
      (1L, ts("2026-01-01 13:00:00"), ts("2026-01-01 13:00:00"), 1L),
      (2L, ts("2026-01-01 09:00:00"), ts("2026-01-01 09:00:00"), 1L)))
  }

  test("stream sessions equal the batch twin on an in-order replay") {
    val spark0 = spark
    import spark0.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext

    val ms = MemoryStream[(Long, Timestamp)]
    val q = Sessionize.stream(ms.toDF().toDF("user_id", "ts"), gapMinutes = 30)
      .writeStream.format("memory").queryName("sessions").outputMode("append").start()
    try {
      ms.addData((1L, ts("2026-01-01 10:00:00")), (1L, ts("2026-01-01 10:10:00")),
        (2L, ts("2026-01-01 10:05:00")))
      q.processAllAvailable()
      // next activity long after the gap: closes u1's first session inline,
      // and advances the watermark so u2's session times out
      ms.addData((1L, ts("2026-01-01 13:00:00")))
      q.processAllAvailable()
      // sentinel to push the watermark past every open session + gap
      ms.addData((999L, ts("2026-01-02 00:00:00")))
      q.processAllAvailable()
      ms.addData((999L, ts("2026-01-03 00:00:00")))
      q.processAllAvailable()
    } finally q.stop()

    val streamed = spark.table("sessions").filter(col("user_id") < 999)
      .collect().map(r => (r.getLong(0), r.getTimestamp(1), r.getTimestamp(2), r.getLong(3))).toSet

    val batchTwin = Sessionize.batch(
      Seq((1L, ts("2026-01-01 10:00:00")), (1L, ts("2026-01-01 10:10:00")),
        (2L, ts("2026-01-01 10:05:00")), (1L, ts("2026-01-01 13:00:00")))
        .toDF("user_id", "ts"), gapMinutes = 30)
      .collect().map(r => (r.getLong(0), r.getTimestamp(1), r.getTimestamp(2), r.getLong(3))).toSet

    assert(streamed === batchTwin)
    assert(streamed.size === 3)
  }

  test("state is bounded: timeout removes closed sessions") {
    // implicit in the append-mode emission above: a user with no further
    // events gets its session emitted exactly once via timeout — re-check
    // count of u2 rows
    val u2 = spark.table("sessions").filter(col("user_id") === 2L).count()
    assert(u2 === 1L)
  }

  test("out-of-order event older than the open session splits like the batch twin") {
    val spark0 = spark
    import spark0.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext

    val ms = MemoryStream[(Long, Timestamp)]
    // gap (30 min) < watermark delay (1 h): the late event below stays
    // within the watermark but is MORE than a gap older than the open
    // session's start — round 1 merged it; the batch twin splits.
    val q = Sessionize.stream(ms.toDF().toDF("user_id", "ts"), gapMinutes = 30)
      .writeStream.format("memory").queryName("sessions_ooo").outputMode("append").start()
    try {
      ms.addData((7L, ts("2026-01-01 10:00:00")))
      q.processAllAvailable()
      // a late TRAIN 35+ min before the open session start (past the gap),
      // strictly inside the 1 h watermark: the two events chain with each
      // other (5 min apart) but never with the open session
      ms.addData((7L, ts("2026-01-01 09:20:00")), (7L, ts("2026-01-01 09:25:00")))
      q.processAllAvailable()
      ms.addData((999L, ts("2026-01-02 00:00:00")))
      q.processAllAvailable()
      ms.addData((999L, ts("2026-01-03 00:00:00")))
      q.processAllAvailable()
    } finally q.stop()

    val streamed = spark.table("sessions_ooo").filter(col("user_id") === 7L)
      .collect().map(r => (r.getLong(0), r.getTimestamp(1), r.getTimestamp(2), r.getLong(3))).toSet
    val batchTwin = Sessionize.batch(
      Seq((7L, ts("2026-01-01 10:00:00")), (7L, ts("2026-01-01 09:20:00")),
        (7L, ts("2026-01-01 09:25:00")))
        .toDF("user_id", "ts"), gapMinutes = 30)
      .collect().map(r => (r.getLong(0), r.getTimestamp(1), r.getTimestamp(2), r.getLong(3))).toSet
    assert(streamed === batchTwin)
    assert(streamed.size === 2, "late train = one closed session, open session intact")
  }

  test("batch sessionization over the driver events table is sane") {
    val out = Sessionize.batch(Tables.events(spark, sf0001), gapMinutes = 360)
    val total = out.agg(sum("n_events")).collect()(0).getLong(0)
    assert(total === Tables.events(spark, sf0001).count())
  }
}
