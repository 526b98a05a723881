package graft.streaming

import org.apache.spark.sql.{Dataset, Encoder, Encoders}
import org.apache.spark.sql.streaming.{OutputMode, StatefulProcessor, TimeMode, TimerValues, TTLConfig, ValueState}

/** ST11: per-user running purchase totals on `transformWithState` — the
  * Spark-4 arbitrary-state API (StatefulProcessor + typed state handles
  * over the RocksDB state store) that supersedes
  * `mapGroupsWithState`/`flatMapGroupsWithState` (which Sessionize still
  * exercises as the legacy surface).
  *
  * Shape: one ValueState[(count, sum)] per user — constant-size state, no
  * history — updated per micro-batch, emitting the new running totals for
  * exactly the users that changed (update semantics). The live
  * "customer lifetime value" feed every event-driven dashboard needs:
  * state size is bounded by |active users|, emission by |users changed
  * this batch|, never by stream length.
  *
  * Requires the RocksDB state store provider (bundled), which is what
  * makes large keyspaces viable: state lives off-heap/on-disk per
  * partition, not in executor heap.
  */
object RunningTotals {

  final case class Event(user_id: Long, value: Double)
  final case class Totals(user_id: Long, n_events: Long, total_value: Double)

  private final case class Agg(n: Long, sum: Double)

  class Processor extends StatefulProcessor[Long, Event, Totals] {
    @transient private var state: ValueState[Agg] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
      state = getHandle.getValueState[Agg]("agg", Encoders.product[Agg], TTLConfig.NONE)

    override def handleInputRows(key: Long, rows: Iterator[Event],
        timerValues: TimerValues): Iterator[Totals] = {
      val prev = if (state.exists()) state.get() else Agg(0L, 0.0)
      val next = rows.foldLeft(prev)((a, e) => Agg(a.n + 1, a.sum + e.value))
      state.update(next)
      Iterator.single(Totals(key, next.n, math.rint(next.sum * 100) / 100))
    }
  }

  /** Update-mode running totals keyed by user. */
  def totals(events: Dataset[Event]): Dataset[Totals] = {
    implicit val enc: Encoder[Totals] = Encoders.product[Totals]
    events.groupByKey(_.user_id)(Encoders.scalaLong)
      .transformWithState(new Processor, TimeMode.None(), OutputMode.Update(), enc)
  }
}
