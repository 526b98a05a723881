package graft.bi

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import graft.SparkSpec

/** ST10: the streaming chart feed must emit exactly the batch compiler's
  * rows for every CLOSED window, and nothing for still-open ones. */
class ChartStreamSpec extends SparkSpec {
  import spark.implicits._

  private def ts(s: String) = java.sql.Timestamp.valueOf(s)

  private val spec = ChartSpec(datasource = "events", queryMode = "aggregate",
    groupby = Seq("event_type"),
    metrics = Seq(Metric("count", None, "cnt"), Metric("sum", Some("value"), "total")),
    timeColumn = Some("ts"), timeGrain = Some("hour"))

  test("closed windows stream exactly the batch chart rows; open windows stay silent") {
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val in = MemoryStream[(java.sql.Timestamp, String, Double)]
    val feed = ChartStream.feed(spec,
      in.toDF().toDF("ts", "event_type", "value"), watermark = "10 minutes")
    val q = feed.writeStream.format("memory").queryName("chart_feed")
      .outputMode("append").start()

    val hour1 = Seq(
      (ts("2026-03-01 10:05:00"), "view", 1.0),
      (ts("2026-03-01 10:15:00"), "view", 2.0),
      (ts("2026-03-01 10:25:00"), "click", 5.0))
    try {
      in.addData(hour1: _*)
      q.processAllAvailable()
      // watermark hasn't passed 11:00 yet — nothing may emit
      assert(spark.table("chart_feed").count() === 0)
      // an event well past the horizon closes hour-10's windows
      in.addData((ts("2026-03-01 12:30:00"), "view", 9.0))
      q.processAllAvailable()
    } finally q.stop()

    val streamed = spark.table("chart_feed")
      .as[(java.sql.Timestamp, String, Long, Double)].collect().toSet
    val batch = ChartCompiler.compile(spark, spec.copy(rowLimit = 1000),
        _ => hour1.toDF("ts", "event_type", "value"))
      .as[(java.sql.Timestamp, String, Long, Double)].collect().toSet
    assert(streamed === batch && batch.size === 2)
  }

  test("week grain buckets Monday-aligned, matching the batch date_trunc('week')") {
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val weekSpec = spec.copy(timeGrain = Some("week"))
    val in = MemoryStream[(java.sql.Timestamp, String, Double)]
    val feed = ChartStream.feed(weekSpec,
      in.toDF().toDF("ts", "event_type", "value"), watermark = "1 hour")
    val q = feed.writeStream.format("memory").queryName("chart_feed_wk")
      .outputMode("append").start()
    // 2026-03-04 is a Wednesday; its ISO week starts Monday 2026-03-02.
    // An epoch-anchored 7-day window would start Thursday 2026-02-26.
    val rows = Seq(
      (ts("2026-03-04 10:00:00"), "view", 1.0),
      (ts("2026-03-07 09:00:00"), "view", 2.0))
    try {
      in.addData(rows: _*)
      in.addData((ts("2026-03-20 00:00:00"), "view", 0.0)) // close the week
      q.processAllAvailable()
    } finally q.stop()
    val streamed = spark.table("chart_feed_wk")
      .as[(java.sql.Timestamp, String, Long, Double)].collect().toSet
    assert(streamed.map(_._1).contains(ts("2026-03-02 00:00:00")),
      s"week bucket must start on Monday: $streamed")
    val batch = ChartCompiler.compile(spark, weekSpec.copy(rowLimit = 1000),
        _ => rows.toDF("ts", "event_type", "value"))
      .as[(java.sql.Timestamp, String, Long, Double)].collect().toSet
    assert(streamed === batch && batch.size === 1)
  }

  test("raw mode and grain-less specs are refused") {
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val in = MemoryStream[(java.sql.Timestamp, String, Double)]
    val df = in.toDF().toDF("ts", "event_type", "value")
    intercept[IllegalArgumentException](
      ChartStream.feed(spec.copy(queryMode = "raw"), df, "1 minute"))
    intercept[IllegalArgumentException](
      ChartStream.feed(spec.copy(timeGrain = None), df, "1 minute"))
    intercept[IllegalArgumentException](
      ChartStream.feed(spec.copy(timeGrain = Some("fortnight")), df, "1 minute"))
  }
}
