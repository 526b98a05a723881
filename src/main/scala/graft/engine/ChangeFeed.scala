package graft.engine

import java.nio.file.{Files, Path, Paths}

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Incremental change-feed FOLLOWER over [[Layout.changelog]] — the
  * consumer loop a downstream ingest runs against the CDC surface
  * (Iceberg's Spark streaming read is exactly this poll: "give me the
  * snapshots committed since my cursor"). The cursor is DURABLE (a
  * file, written atomically via temp+move), so a restarted follower
  * resumes where it stopped instead of re-reading history.
  *
  * Delivery contract — at-least-once with explicit commit:
  *
  *   - [[poll]] answers the changes in `(cursor, head]` WITHOUT moving
  *     the cursor; no new commits → None (cheap: one refs read).
  *   - [[commit]] advances the cursor to the polled batch's end —
  *     called AFTER the consumer has durably processed the batch.
  *   - A crash between poll and commit replays the SAME batch on
  *     restart; consumers dedup on `_change_version_id` (every change
  *     row carries its committing snapshot — replay is idempotent by
  *     construction). Committing before processing would instead drop
  *     a batch on crash — the wrong default for a feed.
  *
  * Scale: each poll costs one refs read + the changelog's
  * O(changed data) generators (BASELINE §Round 17: flat ~0.25 s per
  * 10k-row step at ANY table size). The cursor file is one long. */
object ChangeFeed {

  final case class Batch(changes: DataFrame, fromSeq: Long, toSeq: Long)

  private def read(cursor: Path): Option[Long] =
    if (!Files.exists(cursor)) None
    else Some(new String(Files.readAllBytes(cursor),
      java.nio.charset.StandardCharsets.UTF_8).trim.toLong)

  /** Initialize a cursor at the table's CURRENT head — the follower
    * starts from "now" (history is served by [[Layout.changelog]]
    * directly when a consumer wants a backfill). Refuses to clobber an
    * existing cursor. */
  def init(spark: SparkSession, table: String, cursorPath: String): Long = {
    val cursor = Paths.get(cursorPath)
    require(!Files.exists(cursor),
      s"cursor $cursorPath already exists — a follower resumes, never re-inits")
    val head = Manifests.loadRefs(Manifests.root(spark, table)).head
    require(head >= 0, s"$table has no committed snapshots yet")
    write(cursor, head)
    head
  }

  /** The changes committed since the cursor, or None when the head has
    * not moved. Does NOT advance the cursor — [[commit]] does, after
    * the consumer is durably done with the batch. */
  def poll(spark: SparkSession, table: String, cursorPath: String): Option[Batch] = {
    val cursor = Paths.get(cursorPath)
    val from = read(cursor).getOrElse(throw new IllegalStateException(
      s"no cursor at $cursorPath — call init first"))
    val head = Manifests.loadRefs(Manifests.root(spark, table)).head
    if (head <= from) None
    else Some(Batch(Layout.changelog(spark, table, from, head), from, head))
  }

  /** Advance the cursor past `batch` — atomic (temp + move), so a
    * crash mid-commit leaves the OLD cursor intact and the batch
    * replays. Refuses a stale commit (cursor moved by someone else —
    * two followers sharing one cursor file is a deployment error this
    * surfaces instead of silently skipping a window). */
  def commit(cursorPath: String, batch: Batch): Unit = {
    val cursor = Paths.get(cursorPath)
    val cur = read(cursor).getOrElse(throw new IllegalStateException(
      s"no cursor at $cursorPath"))
    require(cur == batch.fromSeq,
      s"stale commit: cursor is at $cur but the batch started at " +
        s"${batch.fromSeq} — another follower moved this cursor")
    write(cursor, batch.toSeq)
  }

  /** Recover a follower stranded by a ROLLBACK: after
    * [[Layout.assignHead]] abandons the commits past the rollback
    * target, a cursor pointing into the abandoned line makes every
    * [[poll]] refuse (the changelog's ancestor walk — correctly: those
    * transitions never happened on the surviving line). `rebase` moves
    * the cursor BACK to the fork point — the newest snapshot that is an
    * ancestor of BOTH the cursor and the current head — so the next
    * poll replays the surviving line from the divergence. At-least-once
    * holds: rows committed before the fork were already delivered once
    * and are not replayed; rows on the abandoned line were delivered
    * but no longer exist (the consumer's `_change_version_id` dedup
    * plus compensating logic owns that — same contract as Kafka
    * consumers after a truncating leader change). Refuses when the
    * cursor is still an ancestor of head (nothing to recover — poll
    * works) so an accidental rebase cannot silently rewind a healthy
    * follower. Cost: two driver-side parent-chain walks, zero data I/O.
    * Returns the fork seq now in the cursor. */
  def rebase(spark: SparkSession, table: String, cursorPath: String): Long = {
    val cursor = Paths.get(cursorPath)
    val cur = read(cursor).getOrElse(throw new IllegalStateException(
      s"no cursor at $cursorPath — call init first"))
    val root = Manifests.root(spark, table)
    def ancestors(seq: Long): Seq[Long] = {
      var chain = List.empty[Long]
      var at = seq
      while (at >= 0) {
        chain = at :: chain
        at = Manifests.loadSnapshot(root, at).parent
      }
      chain
    }
    val head = Manifests.loadRefs(root).head
    val headChain = ancestors(head).toSet
    require(!headChain.contains(cur),
      s"cursor $cur is an ancestor of head $head — the feed is healthy, " +
        "poll instead of rebasing")
    val fork = ancestors(cur).filter(headChain.contains).lastOption
      .getOrElse(throw new IllegalStateException(
        s"cursor $cur of $table shares no ancestor with head $head"))
    write(cursor, fork)
    fork
  }

  private def write(cursor: Path, seq: Long): Unit = {
    Option(cursor.getParent).foreach(Files.createDirectories(_))
    val tmp = cursor.resolveSibling(cursor.getFileName.toString + ".tmp")
    Files.write(tmp, seq.toString.getBytes(
      java.nio.charset.StandardCharsets.UTF_8))
    Files.move(tmp, cursor,
      java.nio.file.StandardCopyOption.REPLACE_EXISTING,
      java.nio.file.StandardCopyOption.ATOMIC_MOVE)
    ()
  }
}
