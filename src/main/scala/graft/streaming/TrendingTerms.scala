package graft.streaming

import org.apache.spark.sql.{Dataset, Encoder, Encoders}
import org.apache.spark.sql.streaming.{OutputMode, StatefulProcessor, TimeMode, TimerValues, TTLConfig, ValueState}

/** ST18: exponentially-decayed term frequencies on `transformWithState`
  * — the "what is trending in the live corpus" feed a streaming
  * curation pipeline monitors (spiking n-grams = a crawl source gone
  * spammy or a breaking-news dup storm; the per-batch top-k is one
  * `orderBy` on the update table downstream).
  *
  * Decay discipline: deterministic EVENT-TIME ticks carried on the data
  * (`tick`, a logical ingest bucket — Kafka partition-time, crawl hour),
  * never processing time, so replays and the batch twin reproduce the
  * stream bit-for-bit. Score semantics: an occurrence at tick b has
  * weight decay^(t−b) when observed at tick t, i.e.
  *
  *   score_t(term) = Σ_b n_b(term) · decay^(t−b)
  *
  * maintained incrementally with O(1) per-key state — (score, lastTick),
  * lazily decayed by decay^Δ on the next arrival, exactly the classic
  * decayed-counter shape. State is bounded by |distinct live terms|;
  * emission by |terms seen this batch| (update semantics — silent terms
  * decay implicitly and emit nothing, their score reconstructible as
  * score · decay^Δ by any reader holding lastTick).
  *
  * RocksDB state store for the keyspace (the [[RunningTotals]] note);
  * arrivals within a batch fold in tick order (sorted per key —
  * bounded by the key's batch rows), so out-of-order rows inside one
  * micro-batch cannot change the result.
  */
object TrendingTerms {

  final case class TermEvent(term: String, tick: Long, n: Long)
  final case class TermScore(term: String, tick: Long, score: Double)

  private final case class St(score: Double, lastTick: Long)

  /** `strict = true` turns a cross-batch tick regression into a query
    * failure. The DEFAULT is lenient: a late row (tick < the key's
    * lastTick — data that outran the upstream watermark) is CLAMPED to
    * lastTick and folded in with decay^0, i.e. it still counts but
    * earns no retroactive decay credit, and the query keeps running.
    * Strict mode must stay opt-in because the failure is persistent,
    * not transient: after a restart the checkpoint replays the same
    * late batch, the same require throws again, and the query is
    * permanently wedged until its state is discarded — one late record
    * must never poison a checkpoint. */
  class Processor(decay: Double, strict: Boolean = false)
      extends StatefulProcessor[String, TermEvent, TermScore] {
    @transient private var state: ValueState[St] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
      state = getHandle.getValueState[St]("decayed",
        Encoders.product[St], TTLConfig.NONE)

    override def handleInputRows(key: String, rows: Iterator[TermEvent],
        timerValues: TimerValues): Iterator[TermScore] = {
      val sorted = rows.toSeq.sortBy(e => (e.tick, e.n))
      val prev = if (state.exists()) state.get() else St(0.0, Long.MinValue)
      val next = sorted.foldLeft(prev) { (s, e) =>
        require(e.n >= 0, s"negative count for '$key' at tick ${e.tick}")
        if (strict) require(e.tick >= s.lastTick || s.lastTick == Long.MinValue,
          s"tick regression for '$key': ${e.tick} < ${s.lastTick} — " +
            "late data beyond the current tick needs an upstream watermark")
        val tick =
          if (s.lastTick != Long.MinValue && e.tick < s.lastTick) s.lastTick
          else e.tick
        val decayed =
          if (s.lastTick == Long.MinValue) 0.0
          else s.score * math.pow(decay, (tick - s.lastTick).toDouble)
        St(decayed + e.n, tick)
      }
      state.update(next)
      // HALF_UP like the batch twin's Spark round() — math.rint is
      // half-EVEN and would diverge by 1e-9 exactly on .5 boundaries;
      // scores are non-negative (n ≥ 0 required above), where
      // floor(x+0.5) IS HALF_UP
      Iterator.single(TermScore(key, next.lastTick,
        math.floor(next.score * 1e9 + 0.5) / 1e9))
    }
  }

  /** Update-mode decayed scores keyed by term; one row per term per
    * batch it appears in, carrying the score as of its latest tick. */
  def scores(events: Dataset[TermEvent], decay: Double,
      strict: Boolean = false): Dataset[TermScore] = {
    require(decay > 0.0 && decay <= 1.0, s"decay must be in (0,1], got $decay")
    implicit val enc: Encoder[TermScore] = Encoders.product[TermScore]
    events.groupByKey(_.term)(Encoders.STRING)
      .transformWithState(new Processor(decay, strict), TimeMode.None(),
        OutputMode.Update(), enc)
  }

  /** The BATCH twin — the same score law computed declaratively over a
    * static table (the stream ≡ batch spec contract): for each (term,
    * tick) with arrivals, score = Σ over its history of n·decay^Δ. */
  def scoresBatch(events: Dataset[TermEvent], decay: Double): Dataset[TermScore] = {
    val spark = events.sparkSession
    import org.apache.spark.sql.functions._
    import spark.implicits._
    val perTick = events.groupBy($"term", $"tick")
      .agg(sum($"n").as("n"))
    val a = perTick.select($"term", $"tick".as("t"))
    val b = perTick.select($"term", $"tick".as("b"), $"n")
    a.join(b, Seq("term")).where($"b" <= $"t")
      .groupBy($"term", $"t")
      .agg(sum($"n" * pow(lit(decay), $"t" - $"b")).as("s"))
      .select($"term", $"t".as("tick"),
        (round($"s" * 1e9) / 1e9).as("score"))
      .as[TermScore]
  }
}
