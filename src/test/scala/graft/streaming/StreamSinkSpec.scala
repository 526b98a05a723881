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

  test("ingestDeduped appends only unseen content; replaying the log appends nothing (ST8)") {
    val table = "stream_ingest_corpus"
    val logDir = Files.createTempDirectory("ingest-log").toString
    val ckpt = Files.createTempDirectory("ingest-ckpt").toString

    // curated corpus already holds doc 1
    spark.sql(s"DROP TABLE IF EXISTS $table")
    Seq((1L, "alpha text")).toDF("doc_id", "text").write.saveAsTable(table)

    // arriving batches: a corpus dup, a fresh doc, an in-batch dup pair,
    // and a second fresh doc
    // one FILE per logical batch: maxFilesPerTrigger=1 below makes file =
    // micro-batch, and the in-batch-dup case (12 vs 13) only tests what it
    // means to test if both rows share a batch — multi-file writes would
    // split them across triggers in listing order, keeping whichever
    // arrived first (legal for the sink, but not this test's scenario)
    Seq((10L, "alpha text"), (11L, "beta text")).toDF("doc_id", "text")
      .coalesce(1).write.mode("append").parquet(logDir)
    Seq((12L, "gamma text"), (13L, "gamma text"), (14L, "delta text"))
      .toDF("doc_id", "text").coalesce(1).write.mode("append").parquet(logDir)

    val docs = spark.readStream
      .schema(spark.read.parquet(logDir).schema)
      .option("maxFilesPerTrigger", "1")
      .parquet(logDir)
    val q = StreamSink.ingestDeduped(docs, table, "doc_id", "text", ckpt)
    try q.processAllAvailable() finally q.stop()

    def state() = spark.table(table).as[(Long, String)].collect().toSet
    val after = state()
    assert(after === Set(
      (1L, "alpha text"),   // original
      (11L, "beta text"),   // fresh
      (12L, "gamma text"),  // min-id holder of the in-batch dup
      (14L, "delta text"))) // fresh

    // full-log redelivery through a fresh stream: nothing new appends
    val ckpt2 = Files.createTempDirectory("ingest-ckpt2").toString
    val q2 = StreamSink.ingestDeduped(
      spark.readStream.schema(spark.read.parquet(logDir).schema)
        .option("maxFilesPerTrigger", "1").parquet(logDir),
      table, "doc_id", "text", ckpt2)
    try q2.processAllAvailable() finally q2.stop()
    assert(state() === after)

    spark.sql(s"DROP TABLE IF EXISTS $table")
  }

  test("validated ingest quarantines dirty rows with reasons; clean rows dedup-append (ST12)") {
    import graft.engine.Checks
    val (table, dlq) = ("stream_val_corpus", "stream_val_dlq")
    val logDir = Files.createTempDirectory("val-log").toString
    val ckpt = Files.createTempDirectory("val-ckpt").toString
    spark.sql(s"DROP TABLE IF EXISTS $table")
    spark.sql(s"DROP TABLE IF EXISTS $dlq")
    Seq((1L, "alpha text", 10.0)).toDF("doc_id", "text", "quality")
      .write.saveAsTable(table)

    // arriving: corpus dup (clean), fresh (clean), null text, out-of-range
    // quality AND null text (two violations on one row)
    Seq((10L, Some("alpha text"), 5.0), (11L, Some("beta text"), 7.0),
      (12L, None: Option[String], 5.0), (13L, None: Option[String], 99.0))
      .toDF("doc_id", "text", "quality")
      .coalesce(1).write.mode("append").parquet(logDir)

    val rules = Seq(Checks.NotNull("text"), Checks.InRange("quality", 0, 10))
    val q = StreamSink.ingestValidated(
      spark.readStream.schema(spark.read.parquet(logDir).schema).parquet(logDir),
      table, dlq, "doc_id", "text", rules, ckpt)
    try q.processAllAvailable() finally q.stop()

    spark.catalog.refreshTable(table)
    spark.catalog.refreshTable(dlq)
    // corpus: dup dropped, fresh appended, dirty rows NOT present
    assert(spark.table(table).select("doc_id").as[Long].collect().sorted.toSeq
      === Seq(1L, 11L))
    // DLQ: both dirty rows with their reasons (the double violation lists both)
    val dlqRows = spark.table(dlq)
      .select("doc_id", "violations").as[(Long, String)].collect().toMap
    assert(dlqRows.keySet === Set(12L, 13L))
    assert(dlqRows(12L) === "not_null(text)")
    assert(dlqRows(13L).split(";").toSet ===
      Set("not_null(text)", "range(quality,0.0,10.0)"))

    // simulate an at-least-once replay of the same batch (fresh checkpoint
    // → the log re-delivers as batch id 0): corpus AND quarantine must
    // both be unchanged — the DLQ's per-batch-id anti-join is what keeps
    // quarantine counts honest across restarts
    val ckpt2 = Files.createTempDirectory("val-ckpt2").toString
    val q2 = StreamSink.ingestValidated(
      spark.readStream.schema(spark.read.parquet(logDir).schema).parquet(logDir),
      table, dlq, "doc_id", "text", rules, ckpt2)
    try q2.processAllAvailable() finally q2.stop()
    spark.catalog.refreshTable(table)
    spark.catalog.refreshTable(dlq)
    assert(spark.table(dlq).count() === 2, "replayed batch must not double the DLQ")
    assert(spark.table(table).count() === 2, "replayed batch must not re-append")

    spark.sql(s"DROP TABLE IF EXISTS $table")
    spark.sql(s"DROP TABLE IF EXISTS $dlq")
  }

  test("checkpoint restart resumes where the stopped query left off (no reprocessing)") {
    val table = "stream_restart_corpus"
    val logDir = Files.createTempDirectory("restart-log").toString
    val ckpt = Files.createTempDirectory("restart-ckpt").toString

    spark.sql(s"DROP TABLE IF EXISTS $table")
    Seq((0L, "seed doc")).toDF("doc_id", "text").write.saveAsTable(table)
    Seq((1L, "first doc")).toDF("doc_id", "text")
      .coalesce(1).write.mode("append").parquet(logDir)

    def startQuery() = StreamSink.ingestDeduped(
      spark.readStream.schema(spark.read.parquet(logDir).schema)
        .option("maxFilesPerTrigger", "1").parquet(logDir),
      table, "doc_id", "text", ckpt)
    def state() = spark.table(table).as[(Long, String)].collect().toSet

    // run 1: processes file 1, then the query STOPS (deploy, crash, …)
    val q1 = startQuery()
    try q1.processAllAvailable() finally q1.stop()
    assert(state() === Set((0L, "seed doc"), (1L, "first doc")))

    // new data lands while nothing is running
    Seq((2L, "second doc"), (1L, "first doc")).toDF("doc_id", "text")
      .coalesce(1).write.mode("append").parquet(logDir)

    // run 2, SAME checkpoint: resumes at file 2 — the redelivered doc 1 is
    // content-deduped, the fresh doc appends exactly once
    val q2 = startQuery()
    try q2.processAllAvailable() finally q2.stop()
    // the streaming clone's append does not invalidate THIS session's
    // cached file listing for the table — standard Spark cross-session
    // visibility: concurrent readers REFRESH TABLE to see new files
    // (documented on ingestDeduped)
    spark.catalog.refreshTable(table)
    assert(state() === Set(
      (0L, "seed doc"), (1L, "first doc"), (2L, "second doc")))

    spark.sql(s"DROP TABLE IF EXISTS $table")
  }

  test("MOR CDC sink equals the merge sink's state; replay converges (ST13)") {
    val table = s"cdc_mor_${java.util.UUID.randomUUID().toString.take(8)}"
    val logDir = Files.createTempDirectory("cdc-log").toString
    val ckpt = Files.createTempDirectory("cdc-ckpt").toString

    (0L until 10L).map(k => (k, 0L, s"base$k")).toDF("k", "ver", "payload")
      .write.saveAsTable(table)
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
    val q = StreamSink.ingestCdc(updates, table, "k", "ver", ckpt)
    try q.processAllAvailable() finally q.stop()

    def state() = Layout.readCurrent(spark, table)
      .as[(Long, Long, String)].collect().toSet
    val streamed = state()
    assert(streamed === ((0L until 10L).filterNot(k => k == 3 || k == 5)
      .map(k => (k, 0L, s"base$k")).toSet
      + ((3L, 2L, "v2")) + ((5L, 1L, "five")) + ((42L, 1L, "new"))))

    // at-least-once replay: a fresh checkpoint re-delivers the whole log;
    // sequence-number scoping must converge to the same state, not grow
    val ckpt2 = Files.createTempDirectory("cdc-ckpt2").toString
    val updates2 = spark.readStream
      .schema(spark.read.parquet(logDir).schema)
      .option("maxFilesPerTrigger", "1")
      .parquet(logDir)
    val q2 = StreamSink.ingestCdc(updates2, table, "k", "ver", ckpt2)
    try q2.processAllAvailable() finally q2.stop()
    assert(state() === streamed, "replaying the log must not change state")

    // compaction bounds the delete pile and converges the raw table
    Layout.compact(spark, table, 2)
    assert(spark.table(table).as[(Long, Long, String)].collect().toSet
      === streamed)
  }

  test("curation pipeline lands in a MOR table; replay converges to the batch state (ST17→ST13)") {
    import java.sql.Timestamp
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import graft.ext.{Decontaminate, MinHashIndex}
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    def ts(s: String) = Timestamp.valueOf(s)
    // the StreamCurateSpec fixture: 100 near-dup of corpus 1, 101/102
    // clean (kept), 103 contaminated, 104 wrong language, 105 too short;
    // the flusher closes the earlier windows but its own never closes
    val corpus = Seq(
      (1L, "the quick brown fox jumps over the lazy dog and runs away"),
      (2L, "completely unrelated corpus filler text about engines here"))
      .toDF("doc_id", "text")
    val testSet = Seq((900L,
      "contamination marker phrase alpha beta gamma delta appears verbatim in this benchmark"))
      .toDF("doc_id", "text")
    val incoming = Seq(
      (100L, ts("2026-01-01 00:00:00"),
        "the quick brown fox jumps over the lazy dog and runs away"),
      (101L, ts("2026-01-01 00:00:10"),
        "the sun rises over a calm valley and the birds sing softly to greet morning light"),
      (103L, ts("2026-01-01 00:00:20"),
        "the answer is contamination marker phrase alpha beta gamma and more words to pass gates today"),
      (102L, ts("2026-01-01 00:01:00"),
        "a gentle river flows past the old mill and carries leaves of autumn to the sea"),
      (104L, ts("2026-01-01 00:01:10"),
        "der hund und die katze ist the animal of wonder walking today here"),
      (105L, ts("2026-01-01 00:01:20"), "short text here"))
    val flusher = (999L, ts("2026-01-01 01:00:00"),
      "the night sky is full of quiet stars and the moon drifts slowly over sleeping hills")
    val index = MinHashIndex.build(corpus, "doc_id", "text",
      shingleK = 3, numHashes = 128, numBands = 32)
    val bf = Decontaminate.buildShingleBloom(testSet, "doc_id", "text",
      shingleK = 5)
    val table = s"curated_mor_${java.util.UUID.randomUUID().toString.take(8)}"
    Seq.empty[(Long, Timestamp, String, Long, String)]
      .toDF("doc_id", "win_start", "lang", "n_tokens", "text")
      .write.saveAsTable(table)
    def runOnce(): Unit = {
      val ckpt = Files.createTempDirectory("curate-ckpt").toString
      val mem = MemoryStream[(Long, Timestamp, String)]
      val q = StreamCurate.pipelineInto(index, bf,
        mem.toDF().toDF("doc_id", "ts", "text"),
        "doc_id", "text", "ts", langs = Set("en"), threshold = 0.8,
        watermark = "1 minute", windowDur = "5 minutes",
        table = table, checkpointDir = ckpt,
        shingleK = 5, minWords = 8, maxWords = 200)
      try {
        mem.addData(incoming.take(3))
        q.processAllAvailable()
        mem.addData(incoming.drop(3) :+ flusher)
        q.processAllAvailable()
      } finally q.stop()
    }
    try {
      runOnce()
      def state() = Layout.readCurrent(spark, table)
        .as[(Long, Timestamp, String, Long, String)].collect().toSet
      val once = state()
      // table state == the batch twin over the CLOSED-window docs, with
      // the deterministic window floor attached
      val batch = StreamCurate.batch(index, bf,
          incoming.toDF("doc_id", "ts", "text"), "doc_id", "text",
          langs = Set("en"), threshold = 0.8,
          shingleK = 5, minWords = 8, maxWords = 200)
        .select(col("doc_id"), lit(ts("2026-01-01 00:00:00")).as("win_start"),
          col("lang"), col("n_tokens"), col("text"))
        .as[(Long, Timestamp, String, Long, String)].collect().toSet
      assert(once === batch, "durable state must equal the batch twin")
      assert(once.map(_._1) === Set(101L, 102L))
      // a WHOLE-RUN replay (fresh checkpoint, same deliveries) must
      // converge byte-equal, not grow — the CDC sink's seq scoping
      runOnce()
      assert(state() === once, "replayed curation run must converge")
    } finally MinHashIndex.drop(index)
  }
}
