package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.streaming.StreamingQuery

import graft.engine.Layout

/** Streaming upsert sink — continuous CDC-style ingestion into a managed
  * table: each micro-batch MERGEs into the target keyed on `keyCol`,
  * latest `tieBreakCol` wins ([[graft.engine.Layout.merge]] — the same
  * copy-on-write upsert the batch path uses, so stream and batch ingest
  * converge to the same table state).
  *
  * == Delivery semantics ==
  *
  * foreachBatch re-delivers a batch after a failure (at-least-once), so
  * the sink must be idempotent: `Layout.merge` is — re-merging an
  * already-applied batch replaces rows with identical content (keyed
  * keep-latest), leaving the table unchanged. At-least-once delivery +
  * idempotent merge = effectively-once table state, the standard
  * Structured Streaming exactly-once recipe for non-transactional sinks.
  *
  * == Scale shape ==
  *
  * Per micro-batch: one window dedup of the batch (small) + one anti-join
  * against the table + a rewrite. On a real object store the rewrite is
  * the copy-on-write cost every non-Iceberg merge pays; partition the
  * target and merge per partition to bound it. State on the streaming
  * side is zero — dedup-across-batches belongs to
  * [[EventsStream.dedupWithinWatermark]] upstream when sources retry
  * beyond a batch boundary.
  */
object StreamSink {

  /** Start the upsert stream into existing managed table `table`.
    * The caller owns checkpointDir (restart resumes from it). */
  def upsertInto(updates: DataFrame, table: String, keyCol: String,
      tieBreakCol: String, checkpointDir: String): StreamingQuery = {
    val applyBatch: (DataFrame, Long) => Unit = (batch, _) =>
      Layout.merge(batch.sparkSession, table, batch, keyCol, tieBreakCol)
    updates.writeStream
      .option("checkpointLocation", checkpointDir)
      .foreachBatch(applyBatch)
      .start()
  }

  /** Continuous corpus ingestion with dedup (ST8) — the steady-state loop
    * of a training-data pipeline run as a stream: each micro-batch is
    * deduplicated against the CURRENT corpus table AND within itself
    * ([[graft.ext.Dedup.incrementalNew]]), and only genuinely new content
    * appends. Content identity is the `textCol` hash, so redelivered
    * batches (at-least-once foreachBatch) append nothing the second time —
    * idempotence comes from the dedup itself, no transactional sink
    * needed.
    *
    * Scale shape per micro-batch: one distinct-key pass over the corpus +
    * one key join against the (small) batch — the corpus never rewrites,
    * unlike the merge sink; appends are O(new data). Bucketing the corpus
    * table by the key column removes the corpus-side shuffle entirely.
    *
    * Visibility: appends run in the stream's session clone; OTHER sessions
    * holding a cached relation for the table see the new files after
    * `REFRESH TABLE` (standard Spark catalog-cache semantics — asserted in
    * StreamSinkSpec's restart test). The query itself always re-resolves
    * the table per batch, so the dedup never acts on a stale corpus. */
  def ingestDeduped(docs: DataFrame, table: String, idCol: String,
      textCol: String, checkpointDir: String): StreamingQuery = {
    val applyBatch: (DataFrame, Long) => Unit = (batch, _) => {
      val spark = batch.sparkSession
      val fresh = graft.ext.Dedup
        .incrementalNew(batch, spark.table(table), idCol, textCol)
        .filter(org.apache.spark.sql.functions.col("is_new"))
        .drop("is_new", "__key")
      fresh.write.mode("append").saveAsTable(table)
    }
    docs.writeStream
      .option("checkpointLocation", checkpointDir)
      .foreachBatch(applyBatch)
      .start()
  }

  /** Validated ingestion with a DEAD-LETTER QUEUE (ST12): each micro-batch
    * is row-flagged against quality rules ([[graft.engine.Checks.flagRows]]);
    * clean rows take the [[ingestDeduped]] path, dirty rows append to
    * `quarantine` with their violation names and batch id — nothing is
    * silently dropped, nothing dirty reaches the corpus, and the
    * quarantine table IS the re-ingestion queue after a fix. Both sinks
    * are idempotent under foreachBatch's at-least-once replay: the corpus
    * via content dedup, the DLQ via a per-batch-id anti-join. The flagging
    * pass is narrow (+ broadcast dims for referential rules), so the DLQ
    * costs one extra column until the split. */
  def ingestValidated(docs: DataFrame, table: String, quarantine: String,
      idCol: String, textCol: String, rules: Seq[graft.engine.Checks.Rule],
      checkpointDir: String): StreamingQuery = {
    val applyBatch: (DataFrame, Long) => Unit = (batch, batchId) => {
      import org.apache.spark.sql.functions._
      val spark = batch.sparkSession
      val flagged = graft.engine.Checks.flagRows(batch, rules)
      val dirty = flagged.filter(size(col("violations")) > 0)
        .withColumn("violations", concat_ws(";", col("violations")))
        .withColumn("batch_id", lit(batchId))
      // foreachBatch is at-least-once: a replayed batch must not double
      // its quarantine rows (the corpus side is idempotent via dedup; the
      // DLQ needs its own guard). Anti-join on (batch_id, id) against the
      // already-quarantined rows of THIS batch id makes the append
      // idempotent even under a partial-append replay — and costs one
      // filtered scan of the (small by design) quarantine table.
      val toQuarantine =
        if (!spark.catalog.tableExists(quarantine)) dirty
        else dirty.join(
          spark.table(quarantine)
            .filter(col("batch_id") === batchId).select(col(idCol)),
          Seq(idCol), "left_anti")
      toQuarantine.write.mode("append").saveAsTable(quarantine)
      val clean = flagged.filter(size(col("violations")) === 0)
        .drop("violations")
      val fresh = graft.ext.Dedup
        .incrementalNew(clean, spark.table(table), idCol, textCol)
        .filter(col("is_new"))
        .drop("is_new", "__key")
      fresh.write.mode("append").saveAsTable(table)
    }
    docs.writeStream
      .option("checkpointLocation", checkpointDir)
      .foreachBatch(applyBatch)
      .start()
  }

  /** Merge-on-read CDC ingestion (ST13) — [[upsertInto]]'s semantics at
    * Iceberg-v2 cost: each micro-batch lands through
    * [[graft.engine.Layout.upsertMor]] as new data files + an
    * equality-delete file, so a batch costs O(batch) regardless of table
    * size, where the merge sink's copy-on-write rewrite is O(table) per
    * batch — THE difference between a CDC stream that keeps up at 100 TB
    * and one that falls behind. This is the Flink→Iceberg streaming
    * upsert write model.
    *
    * Idempotence under at-least-once replay comes from sequence-number
    * scoping rather than content dedup: a replayed batch's equality
    * delete (higher data sequence) erases the earlier application's rows
    * for the same keys while its own identical rows land — the table
    * converges to exactly one copy, byte-equal to the single-delivery
    * state. The batch is first deduplicated to one row per key (latest
    * `tieBreakCol`, content-hash tie-break — the [[upsertInto]]
    * discipline, and [[graft.engine.Layout.upsertMor]]'s precondition).
    * Schedule [[graft.engine.Layout.compact]] to bound the delete-file
    * pile (read amplification), exactly as Iceberg documents for
    * streaming upserts. */
  def ingestCdc(updates: DataFrame, table: String, keyCol: String,
      tieBreakCol: String, checkpointDir: String): StreamingQuery = {
    val applyBatch: (DataFrame, Long) => Unit = (batch, _) => {
      import org.apache.spark.sql.expressions.Window
      import org.apache.spark.sql.functions._
      val contentHash = xxhash64(batch.columns.map(col).toIndexedSeq: _*)
      val w = Window.partitionBy(col(keyCol))
        .orderBy(col(tieBreakCol).desc, contentHash)
      val deduped = batch
        .withColumn("__rn", row_number().over(w))
        .filter(col("__rn") === 1).drop("__rn")
      // an empty micro-batch must not commit (manifest churn)
      if (!deduped.isEmpty)
        Layout.upsertMor(batch.sparkSession, table, deduped, keyCol)
    }
    updates.writeStream
      .option("checkpointLocation", checkpointDir)
      .foreachBatch(applyBatch)
      .start()
  }
}
