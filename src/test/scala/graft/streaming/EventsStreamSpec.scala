package graft.streaming

import org.apache.spark.sql.functions._
import graft.{SparkSpec, Tables}

/** Batch/stream equivalence (SURVEY.md §5 streaming test): replaying the
  * events table as a file-source stream through the windowed-count pipeline
  * must equal the same transformation run in batch (Q25's shape). */
class EventsStreamSpec extends SparkSpec {

  /** Test harness only (complete-mode memory sink accumulates on the
    * driver — never a production sink, hence test scope). */
  private def runToMemory(stream: org.apache.spark.sql.DataFrame,
      name: String): org.apache.spark.sql.DataFrame = {
    val q = stream.writeStream.format("memory").queryName(name)
      .outputMode("complete").start()
    q.processAllAvailable()
    q.stop()
    spark.table(name)
  }

  test("file-replay stream equals batch tumbling-window counts") {
    val events = Tables.events(spark, sf0001)
    // Re-write as a multi-file parquet dir (micro-batches = files) with
    // Spark-native µs timestamps so the streaming schema is stream-legal.
    val dir = java.nio.file.Files.createTempDirectory("events-replay").toString
    events.repartition(4).write.mode("overwrite").parquet(dir)
    val batchView = spark.read.parquet(dir)

    val stream = EventsStream.fromParquetDir(spark, dir, batchView)
    val streamed = runToMemory(stream, "stream_counts")
      .select("win_start", "event_type", "cnt")
      .collect().map(r => (r.get(0).toString, r.getString(1), r.getLong(2))).toSet

    val batch = EventsStream.windowedCounts(batchView, watermark = false)
      .collect().map(r => (r.get(0).toString, r.getString(1), r.getLong(2))).toSet

    assert(streamed === batch)
    assert(batch.nonEmpty)
  }

  test("stream-static enrichment equals the batch left join, unmatched rows kept") {
    val events = Tables.events(spark, sf0001)
    val dir = java.nio.file.Files.createTempDirectory("events-enrich").toString
    events.withColumn("ts", col("ts").cast("timestamp"))
      .repartition(3).write.mode("overwrite").parquet(dir)
    val batchView = spark.read.parquet(dir)
    // static dim covering only SOME users -> left join must keep the rest
    val dim = batchView.select(col("user_id")).distinct()
      .filter(col("user_id") % 2 === 0)
      .withColumn("segment", concat(lit("seg"), (col("user_id") % 3).cast("string")))
    val stream = spark.readStream.schema(batchView.schema)
      .option("maxFilesPerTrigger", "1").parquet(dir)
    val enriched = EventsStream.enrich(stream, dim, "user_id")
      .select(col("event_id"), col("user_id"), col("segment"))
    val q = enriched.writeStream.format("memory").queryName("enrich_t")
      .outputMode("append").start()
    try q.processAllAvailable() finally q.stop()
    def key(r: org.apache.spark.sql.Row) =
      (r.getLong(0), r.getLong(1), if (r.isNullAt(2)) "-" else r.getString(2))
    val streamed = spark.table("enrich_t").collect().map(key).toSet
    val batch = EventsStream.enrich(batchView, dim, "user_id")
      .select(col("event_id"), col("user_id"), col("segment"))
      .collect().map(key).toSet
    assert(streamed === batch && batch.nonEmpty)
    assert(batch.exists(_._3 == "-"), "unmatched stream rows must survive the left join")
  }

  test("streaming dedup drops redelivered keys within the watermark, state evicts after") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    def ts(s: String) = java.sql.Timestamp.valueOf(s)

    val ms = MemoryStream[(Long, java.sql.Timestamp, String)]
    val deduped = EventsStream.dedupWithinWatermark(
      ms.toDF().toDF("event_id", "ts", "payload"), "ts", "1 hour", Seq("event_id"))
    val q = deduped.writeStream.format("memory").queryName("dedup_stream")
      .outputMode("append").start()
    try {
      // original + same-batch duplicate (retry with drifted timestamp)
      ms.addData((1L, ts("2026-01-01 10:00:00"), "orig"),
        (1L, ts("2026-01-01 10:00:05"), "retry"))
      q.processAllAvailable()
      // cross-batch duplicate inside the watermark horizon: dropped
      ms.addData((1L, ts("2026-01-01 10:20:00"), "late-retry"),
        (2L, ts("2026-01-01 10:30:00"), "other"))
      q.processAllAvailable()
      // advance the watermark far past key 1's horizon, then redeliver it:
      // state was evicted, so the redelivery is treated as a NEW event
      ms.addData((3L, ts("2026-01-02 00:00:00"), "advance"))
      q.processAllAvailable()
      ms.addData((1L, ts("2026-01-02 00:00:01"), "reborn"))
      q.processAllAvailable()
    } finally q.stop()

    val out = spark.table("dedup_stream")
      .collect().map(r => (r.getLong(0), r.getString(2))).toSeq.sorted
    // one row per key within the horizon, first arrival wins; key 1
    // reappears only after its state aged out
    assert(out === Seq((1L, "orig"), (1L, "reborn"), (2L, "other"), (3L, "advance")))
  }

  test("watermark drops late rows in append mode (the semantics Q25 cannot see)") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    def ts(s: String) = java.sql.Timestamp.valueOf(s)

    val ms = MemoryStream[(java.sql.Timestamp, String)]
    val stream = EventsStream.windowedCounts(
      ms.toDF().toDF("ts", "event_type"), watermark = true)
    val q = stream.writeStream.format("memory").queryName("late_drop")
      .outputMode("append").start()
    try {
      // batch 1: two on-time rows in the Jan-1 window
      ms.addData((ts("2026-01-01 10:00:00"), "click"), (ts("2026-01-01 11:00:00"), "click"))
      q.processAllAvailable()
      // batch 2: jump event time to Jan 5 → watermark (max-1h) passes the
      // Jan-1 window end; its finalized count is emitted
      ms.addData((ts("2026-01-05 10:00:00"), "click"))
      q.processAllAvailable()
      // batch 3: a LATE Jan-1 row, far below the watermark → dropped
      ms.addData((ts("2026-01-01 12:00:00"), "click"), (ts("2026-01-06 10:00:00"), "click"))
      q.processAllAvailable()
      ms.addData((ts("2026-01-09 10:00:00"), "click"))
      q.processAllAvailable()
    } finally q.stop()

    val out = spark.table("late_drop")
      .collect().map(r => (r.get(0).toString, r.getLong(2))).toMap
    // Jan-1 window closed at count 2; the late third row did not reopen it
    assert(out("2026-01-01 00:00:00.0") === 2L)
    // the Jan-5/Jan-6 windows eventually finalized with their on-time rows
    assert(out.get("2026-01-05 00:00:00.0").contains(1L))
    assert(out.get("2026-01-06 00:00:00.0").contains(1L))
  }

  test("native session_window runs STREAMING: merge-on-overlap, emit on close (W8)") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    def ts(s: String) = java.sql.Timestamp.valueOf(s)

    val ms = MemoryStream[(Long, java.sql.Timestamp)]
    // the exact shape q111 runs in batch — same operator, streaming state
    val sessions = ms.toDF().toDF("user_id", "ts")
      .withWatermark("ts", "10 minutes")
      .groupBy(session_window(col("ts"), "30 minutes"), col("user_id"))
      .agg(count(lit(1)).as("n_events"))
      .select(col("session_window.start").as("s_start"),
        col("user_id"), col("n_events"))
    val q = sessions.writeStream.format("memory").queryName("sw_stream")
      .outputMode("append").start()
    try {
      // u1: two events 10 min apart (ONE session), a third 50 min later
      // (NEW session); u2: one event
      ms.addData((1L, ts("2026-02-01 10:00:00")), (1L, ts("2026-02-01 10:10:00")),
        (2L, ts("2026-02-01 10:05:00")))
      q.processAllAvailable()
      ms.addData((1L, ts("2026-02-01 11:00:00")))
      q.processAllAvailable()
      // advance the watermark far past every session's close
      ms.addData((9L, ts("2026-02-01 15:00:00")))
      q.processAllAvailable()
    } finally q.stop()

    val got = spark.table("sw_stream")
      .as[(java.sql.Timestamp, Long, Long)].collect().toSet
    assert(got === Set(
      (ts("2026-02-01 10:00:00"), 1L, 2L), // merged 10:00+10:10
      (ts("2026-02-01 11:00:00"), 1L, 1L), // new session after the gap
      (ts("2026-02-01 10:05:00"), 2L, 1L)))
  }
}
