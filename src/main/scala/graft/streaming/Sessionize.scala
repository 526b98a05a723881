package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Sessionization — gap-based user sessions over the events stream, the
  * canonical custom-state streaming operator (SURVEY.md §2.9 extension;
  * the arbitrary-stateful tier beyond built-in windows).
  *
  * Two implementations with one contract:
  *
  *   - [[batch]]: pure window functions (lag → new-session flag → running
  *     sum as session id → group). Oracle-checkable (Q44) and the
  *     ground truth the stream is specified against.
  *   - [[stream]]: `flatMapGroupsWithState` with event-time timeout —
  *     per-user open-session state, closed sessions emitted either by a
  *     gap-exceeding event or by the watermark passing start-of-gap
  *     (timeout). State is one (start, end, n) triple per active user:
  *     bounded by active users, not history — the property that lets it
  *     run forever at 100 TB/day.
  */
object Sessionize {

  final case class Session(user_id: Long, session_start: Timestamp,
      session_end: Timestamp, n_events: Long)
  final case class OpenSession(startMs: Long, endMs: Long, n: Long)

  /** Batch twin: sessions = maximal event chains with inter-event gap ≤
    * `gapMinutes` per user. */
  def batch(events: DataFrame, gapMinutes: Int): DataFrame = {
    val wOrd = Window.partitionBy(col("user_id")).orderBy(col("ts"))
    val wRun = wOrd.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val gapUs = gapMinutes * 60L * 1000000L
    events
      .withColumn("__new_s",
        when(lag(col("ts"), 1).over(wOrd).isNull ||
          unix_micros(col("ts")) - unix_micros(lag(col("ts"), 1).over(wOrd)) > gapUs, 1)
          .otherwise(0))
      .withColumn("__sid", sum(col("__new_s")).over(wRun))
      .groupBy(col("user_id"), col("__sid"))
      .agg(min(col("ts")).as("session_start"), max(col("ts")).as("session_end"),
        count(lit(1)).as("n_events"))
      .drop("__sid")
  }

  /** Streaming sessionization: one OpenSession per user in state; emit on
    * gap break or event-time timeout (watermark ≥ session end + gap). */
  def stream(events: DataFrame, gapMinutes: Int, watermark: String = "1 hour"): Dataset[Session] = {
    val spark = events.sparkSession
    import spark.implicits._
    val gapMs = gapMinutes * 60L * 1000L

    def fn(user: Long, rows: Iterator[(Long, Timestamp)],
        state: GroupState[OpenSession]): Iterator[Session] = {
      if (state.hasTimedOut) {
        val s = state.get
        state.remove()
        Iterator.single(Session(user, new Timestamp(s.startMs), new Timestamp(s.endMs), s.n))
      } else {
        val ts = rows.map(_._2.getTime).toArray.sorted
        var closed = List.empty[Session]
        var open = state.getOption
        // Out-of-order events more than a gap OLDER than the open session
        // can never chain with it (t - endMs <= gapMs is trivially true for
        // past t, but the batch twin splits on the start side too). They
        // sessionize among THEMSELVES — a late train [09:00, 09:05] closes
        // as ONE 2-event session exactly like the batch ground truth. A
        // train split across micro-batches still splits (closed-session
        // state isn't kept); that residual divergence only occurs when
        // gapMinutes < the watermark delay and is the documented bound.
        val cutoff = open.map(_.startMs - gapMs)
        val (late, current) = cutoff match {
          case Some(c) => ts.partition(_ < c)
          case None => (Array.empty[Long], ts)
        }
        var lateOpen = Option.empty[OpenSession]
        late.foreach { t =>
          lateOpen match {
            case Some(s) if t - s.endMs <= gapMs =>
              lateOpen = Some(OpenSession(s.startMs, t, s.n + 1))
            case Some(s) =>
              closed ::= Session(user, new Timestamp(s.startMs), new Timestamp(s.endMs), s.n)
              lateOpen = Some(OpenSession(t, t, 1))
            case None => lateOpen = Some(OpenSession(t, t, 1))
          }
        }
        lateOpen.foreach(s =>
          closed ::= Session(user, new Timestamp(s.startMs), new Timestamp(s.endMs), s.n))
        current.foreach { t =>
          open match {
            case None => open = Some(OpenSession(t, t, 1))
            case Some(s) if t - s.endMs <= gapMs =>
              open = Some(OpenSession(math.min(s.startMs, t), math.max(s.endMs, t), s.n + 1))
            case Some(s) =>
              closed ::= Session(user, new Timestamp(s.startMs), new Timestamp(s.endMs), s.n)
              open = Some(OpenSession(t, t, 1))
          }
        }
        open.foreach { s =>
          state.update(s)
          state.setTimeoutTimestamp(s.endMs + gapMs)
        }
        closed.reverseIterator
      }
    }

    events.select(col("user_id").cast("long").as("_1"), col("ts").as("_2"))
      .withWatermark("_2", watermark)
      .as[(Long, Timestamp)]
      .groupByKey(_._1)
      .flatMapGroupsWithState(OutputMode.Append(), GroupStateTimeout.EventTimeTimeout())(fn)
  }
}
