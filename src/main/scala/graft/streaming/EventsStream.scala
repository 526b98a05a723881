package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Structured-Streaming pipeline over the stream-shaped `events` entity
  * (event-time `ts`, categorical `event_type` —
  * /root/reference/compose/seed.sh:72 is the reference's stream-shaped
  * table; no streaming service exists in its compose stack, so this is the
  * declared Tier C surface, SURVEY.md §2.9).
  *
  * Shape: source → withWatermark → tumbling-window count → sink. The
  * transformation is factored out ([[windowedCounts]]) so the exact same
  * plan is testable in batch mode (Q25) and runnable as a stream —
  * Structured Streaming's contract is that the two agree up to late-data
  * drops, which is what the spec asserts.
  *
  * Scale: stateful agg state is per (window, event_type) — bounded by the
  * watermark horizon; the shuffle is on the group key like any batch agg.
  */
object EventsStream {

  /** The shared (batch = stream) transformation: tumbling 1-day counts per
    * event_type, watermarked 1 hour when streaming. */
  def windowedCounts(events: DataFrame, watermark: Boolean): DataFrame = {
    val src = if (watermark) events.withWatermark("ts", "1 hour") else events
    src.groupBy(window(col("ts"), "1 day"), col("event_type"))
      .agg(count(lit(1)).as("cnt"))
      .select(col("window.start").as("win_start"), col("event_type"), col("cnt"))
  }

  /** File-source replay: read the events parquet directory as a stream
    * (maxFilesPerTrigger simulates arrival), apply the windowed count. */
  def fromParquetDir(spark: SparkSession, dir: String, schemaFrom: DataFrame): DataFrame = {
    val src = spark.readStream
      .schema(schemaFrom.schema)
      .option("maxFilesPerTrigger", "1")
      .parquet(dir)
    windowedCounts(src, watermark = true)
  }

  /** Stream-static enrichment: join each micro-batch against a STATIC
    * dimension table (user → segment, product → category). The static side
    * re-plans per micro-batch (a broadcast when small — same plan as the
    * batch twin), needs no watermark and holds no state: this is the
    * stateless join; stream-STREAM joins with two moving sides live in
    * [[StreamJoin]]. Left join keeps unmatched stream rows (late dimension
    * rows are the dim pipeline's problem, not the stream's). */
  def enrich(stream: DataFrame, dim: DataFrame, keyCol: String): DataFrame =
    stream.join(dim, Seq(keyCol), "left")

  /** Streaming exact dedup — the stream twin of `Dedup.exactKeepFirst`
    * (at-least-once sources redeliver; ingestion must collapse retries).
    * `dropDuplicatesWithinWatermark` keys state on `keyCols` and evicts a
    * key once the watermark passes its last-seen event time, so state is
    * bounded by keys-per-watermark-horizon, not stream history — the
    * property that lets ingestion dedup run forever. Duplicates arriving
    * within the horizon are dropped even when their event times differ
    * (retry timestamps drift); the first arrival wins. */
  def dedupWithinWatermark(events: DataFrame, tsCol: String, delay: String,
      keyCols: Seq[String]): DataFrame =
    events.withWatermark(tsCol, delay)
      .dropDuplicatesWithinWatermark(keyCols)
}
