package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Stream-stream interval join — the streaming twin of
  * [[graft.ext.TemporalJoin.intervalPairs]] (SURVEY.md §2.12 ST3): pair each
  * `from` event with every `to` event of the same key whose event time falls
  * in `(fromTs, fromTs + windowSec]`, continuously, as both sides arrive.
  *
  * Shape: watermark BOTH inputs, then an inner equi-join on the key with the
  * interval as a time-range join condition. Because the range bounds the two
  * event times against each other in both directions
  * (`to > from` and `to <= from + window`), Structured Streaming can derive a
  * state-eviction horizon for each side from the other side's watermark:
  * a buffered `from` row is dropped once the `to`-watermark passes
  * `fromTs + windowSec`; a buffered `to` row once the `from`-watermark passes
  * its own time. State on each side is therefore bounded by
  * (arrival rate × (watermark delay + window)), not stream history — the
  * property that lets the join run forever. The shuffle is a plain hash
  * exchange on the key, same as the batch twin.
  *
  * Output: (key, from_id, to_id, gap_us) — identical schema and semantics to
  * the batch operator; the spec asserts replay-equivalence on real data.
  */
object StreamJoin {

  /** Interval-pair two watermarked streams.
    *
    * @param from       left stream; its rows open the pairing window
    * @param to         right stream; rows land in open windows of their key
    * @param keyCol     entity key column name, present in both inputs
    * @param fromTsCol  event-time column of `from` (TimestampType)
    * @param toTsCol    event-time column of `to` (TimestampType)
    * @param fromIdCol  id column of `from`, emitted as `from_id`
    * @param toIdCol    id column of `to`, emitted as `to_id`
    * @param windowSec  forward pairing horizon, strict-left/inclusive-right
    * @param watermark  max out-of-orderness tolerated on each side
    */
  def intervalJoin(from: DataFrame, to: DataFrame, keyCol: String,
      fromTsCol: String, toTsCol: String, fromIdCol: String, toIdCol: String,
      windowSec: Long, watermark: String = "1 hour"): DataFrame = {
    val f = from
      .select(col(keyCol).as("key"), col(fromIdCol).as("from_id"),
        col(fromTsCol).as("__fts"))
      .withWatermark("__fts", watermark)
    val t = to
      .select(col(keyCol).as("__tkey"), col(toIdCol).as("to_id"),
        col(toTsCol).as("__tts"))
      .withWatermark("__tts", watermark)
    f.join(t,
        col("key") === col("__tkey") &&
          col("__tts") > col("__fts") &&
          col("__tts") <= col("__fts") + expr(s"INTERVAL $windowSec SECONDS"))
      .select(col("key"), col("from_id"), col("to_id"),
        (unix_micros(col("__tts")) - unix_micros(col("__fts"))).as("gap_us"))
  }

  /** LEFT OUTER interval join (ST9): same pairing as [[intervalJoin]], but a
    * `from` row whose window closes with no match is still emitted — with
    * null `to_id`/`gap_us` — at the moment its state is evicted (the
    * engine knows "no match can still arrive" only once the right-side
    * watermark passes `fromTs + windowSec`). This is the
    * abandoned-checkout / unanswered-alert shape: the null-padded row IS
    * the signal. Same bounded-state property as the inner form; the outer
    * row's emission latency is the watermark delay, the price of
    * correctness under out-of-order arrival. */
  def intervalJoinLeftOuter(from: DataFrame, to: DataFrame, keyCol: String,
      fromTsCol: String, toTsCol: String, fromIdCol: String, toIdCol: String,
      windowSec: Long, watermark: String = "1 hour"): DataFrame = {
    val f = from
      .select(col(keyCol).as("key"), col(fromIdCol).as("from_id"),
        col(fromTsCol).as("__fts"))
      .withWatermark("__fts", watermark)
    val t = to
      .select(col(keyCol).as("__tkey"), col(toIdCol).as("to_id"),
        col(toTsCol).as("__tts"))
      .withWatermark("__tts", watermark)
    f.join(t,
        col("key") === col("__tkey") &&
          col("__tts") > col("__fts") &&
          col("__tts") <= col("__fts") + expr(s"INTERVAL $windowSec SECONDS"),
        "leftOuter")
      .select(col("key"), col("from_id"), col("to_id"),
        (unix_micros(col("__tts")) - unix_micros(col("__fts"))).as("gap_us"))
  }
}
