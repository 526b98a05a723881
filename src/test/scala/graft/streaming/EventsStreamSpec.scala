package graft.streaming

import org.apache.spark.sql.functions._
import graft.{SparkSpec, Tables}

/** Batch/stream equivalence (SURVEY.md §5 streaming test): replaying the
  * events table as a file-source stream through the windowed-count pipeline
  * must equal the same transformation run in batch (Q25's shape). */
class EventsStreamSpec extends SparkSpec {

  test("file-replay stream equals batch tumbling-window counts") {
    val events = Tables.events(spark, sf0001)
    // Re-write as a multi-file parquet dir (micro-batches = files) with
    // Spark-native µs timestamps so the streaming schema is stream-legal.
    val dir = java.nio.file.Files.createTempDirectory("events-replay").toString
    events.repartition(4).write.mode("overwrite").parquet(dir)
    val batchView = spark.read.parquet(dir)

    val stream = EventsStream.fromParquetDir(spark, dir, batchView)
    val streamed = EventsStream.runToMemory(spark, stream, "stream_counts")
      .select("win_start", "event_type", "cnt")
      .collect().map(r => (r.get(0).toString, r.getString(1), r.getLong(2))).toSet

    val batch = EventsStream.windowedCounts(batchView, watermark = false)
      .collect().map(r => (r.get(0).toString, r.getString(1), r.getLong(2))).toSet

    assert(streamed === batch)
    assert(batch.nonEmpty)
  }
}
