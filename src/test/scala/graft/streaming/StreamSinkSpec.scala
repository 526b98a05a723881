package graft.streaming

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.engine.Layout

/** Streaming upsert sink (ST4): replaying an update log through
  * [[StreamSink.upsertInto]] must leave the table in the same state as one
  * batch MERGE of the whole log, and re-applying a batch (at-least-once
  * redelivery) must not change the table. */
class StreamSinkSpec extends SparkSpec {
  import spark.implicits._

  test("streamed upserts equal one batch merge of the full log; redelivery is idempotent") {
    val table = "stream_upsert_target"
    val logDir = Files.createTempDirectory("upsert-log").toString
    val ckpt = Files.createTempDirectory("upsert-ckpt").toString

    // Base table: keys 0..9 at version 0.
    spark.sql(s"DROP TABLE IF EXISTS $table")
    (0L until 10L).map(k => (k, 0L, s"base$k")).toDF("k", "ver", "payload")
      .write.saveAsTable(table)

    // Update log across several files (micro-batches): updates to existing
    // keys (two versions of k=3 — latest must win), one new key, and an
    // exact duplicate row.
    Seq((3L, 1L, "v1")).toDF("k", "ver", "payload")
      .write.mode("append").parquet(logDir)
    Seq((3L, 2L, "v2"), (5L, 1L, "five")).toDF("k", "ver", "payload")
      .write.mode("append").parquet(logDir)
    Seq((42L, 1L, "new"), (42L, 1L, "new")).toDF("k", "ver", "payload")
      .write.mode("append").parquet(logDir)

    val updates = spark.readStream
      .schema(spark.read.parquet(logDir).schema)
      .option("maxFilesPerTrigger", "1")
      .parquet(logDir)
    val q = StreamSink.upsertInto(updates, table, "k", "ver", ckpt)
    try q.processAllAvailable() finally q.stop()

    def state() = spark.table(table).as[(Long, Long, String)].collect().toSet
    val streamed = state()

    // batch twin over the same log
    val twin = "stream_upsert_twin"
    spark.sql(s"DROP TABLE IF EXISTS $twin")
    (0L until 10L).map(k => (k, 0L, s"base$k")).toDF("k", "ver", "payload")
      .write.saveAsTable(twin)
    Layout.merge(spark, twin, spark.read.parquet(logDir), "k", "ver")
    val batch = spark.table(twin).as[(Long, Long, String)].collect().toSet

    assert(streamed === batch)
    assert(streamed.contains((3L, 2L, "v2")) && streamed.contains((42L, 1L, "new")))
    assert(!streamed.exists(r => r._1 == 3L && r._2 == 1L))

    // redelivered batch (same content) leaves the table unchanged
    Layout.merge(spark, table, spark.read.parquet(logDir), "k", "ver")
    assert(state() === streamed)

    spark.sql(s"DROP TABLE IF EXISTS $table")
    spark.sql(s"DROP TABLE IF EXISTS $twin")
  }
}
