package graft.ext

import java.sql.Timestamp

import org.apache.spark.sql.functions._

import graft.SparkSpec

class TemporalJoinSpec extends SparkSpec {
  import spark.implicits._

  private def ts(s: String): Timestamp = Timestamp.valueOf(s)

  test("asOfJoin matches the latest right row at or before each left time") {
    val trades = Seq(
      (1L, 10L, ts("2026-01-01 10:00:05")),
      (2L, 10L, ts("2026-01-01 10:00:00")), // exactly simultaneous quote
      (3L, 10L, ts("2026-01-01 09:59:59")), // before any quote
      (4L, 20L, ts("2026-01-01 10:00:10"))  // other key
    ).toDF("trade_id", "acct", "t_ts")
    val quotes = Seq(
      (100L, 10L, ts("2026-01-01 10:00:00"), 5.0),
      (101L, 10L, ts("2026-01-01 10:00:03"), 6.0),
      (102L, 20L, ts("2026-01-01 10:00:10"), 7.0)
    ).toDF("quote_id", "q_acct", "q_ts", "px")

    val out = TemporalJoin.asOfJoin(trades, quotes,
        "acct", "q_acct", "t_ts", "q_ts", "quote_id")
      .select("trade_id", "quote_id", "px")
      .collect().map(r => r.getLong(0) -> ((Option(r.get(1)), Option(r.get(2))))).toMap

    assert(out(1L) === (Some(101L), Some(6.0)))  // latest <= 10:00:05
    assert(out(2L) === (Some(100L), Some(5.0)))  // inclusive at equal ts
    assert(out(3L) === (None, None))             // nothing before
    assert(out(4L) === (Some(102L), Some(7.0)))  // keys don't leak
  }

  test("asOfJoin tie at equal right times picks the max tiebreak, atomically") {
    val left = Seq((1L, 1L, ts("2026-01-01 00:00:10"))).toDF("lid", "k", "lt")
    val right = Seq(
      (5L, 1L, ts("2026-01-01 00:00:01"), "a"),
      (9L, 1L, ts("2026-01-01 00:00:01"), "b"), // same ts, higher id wins
      (7L, 1L, ts("2026-01-01 00:00:01"), "c")
    ).toDF("rid", "rk", "rt", "tag")
    val row = TemporalJoin.asOfJoin(left, right, "k", "rk", "lt", "rt", "rid")
      .select("rid", "tag").head()
    // the whole matched row comes from rid=9 — no column mixing
    assert((row.getLong(0), row.getString(1)) === ((9L, "b")))
  }

  test("asOfJoin equals the per-row subquery definition on real data") {
    val events = graft.Tables.load(spark, sf0001, "events")
    val purchases = events.filter(col("event_type") === "purchase")
      .select(col("event_id").as("pid"), col("user_id"), col("ts").as("pts"))
    val clicks = events.filter(col("event_type") === "click")
      .select(col("event_id").as("cid"), col("user_id").as("cu"), col("ts").as("cts"))

    val fast = TemporalJoin.asOfJoin(purchases, clicks, "user_id", "cu", "pts", "cts", "cid")
      .select(col("pid"), coalesce(col("cid"), lit(-1L)).as("cid"))

    // naive definition: max-ts (then max-id) click <= purchase ts, per purchase
    val joined = purchases.join(clicks,
        col("user_id") === col("cu") && col("cts") <= col("pts"), "left")
    val w = org.apache.spark.sql.expressions.Window.partitionBy(col("pid"))
      .orderBy(col("cts").desc_nulls_last, col("cid").desc_nulls_last)
    val naive = joined.withColumn("rn", row_number().over(w)).filter(col("rn") === 1)
      .select(col("pid"), coalesce(col("cid"), lit(-1L)).as("cid"))

    assert(fast.exceptAll(naive).isEmpty && naive.exceptAll(fast).isEmpty)
  }

  test("proximityCount matches the naive theta join and keeps zero rows") {
    val events = graft.Tables.load(spark, sf0001, "events").limit(2000)
    val fast = TemporalJoin.proximityCount(events, "event_id", "ts", 300)

    val e = events.select(col("event_id"), unix_micros(col("ts")).as("us"))
    val naive = e.as("a").join(e.as("b"),
        abs(col("a.us") - col("b.us")) <= 300000000L
          && col("a.event_id") =!= col("b.event_id"), "left")
      .groupBy(col("a.event_id").as("event_id"))
      .agg(count(col("b.event_id")).as("n_near"))

    assert(fast.count() === events.count()) // zero-neighbor rows kept
    assert(fast.exceptAll(naive).isEmpty && naive.exceptAll(fast).isEmpty)
  }

  test("intervalPairs bounds are strict-left / inclusive-right") {
    val df = Seq(
      (1L, 1L, ts("2026-01-01 00:00:00"), "click"),
      (2L, 1L, ts("2026-01-01 00:00:00"), "purchase"), // simultaneous: excluded
      (3L, 1L, ts("2026-01-01 00:30:00"), "purchase"), // at window edge: included
      (4L, 1L, ts("2026-01-01 00:30:01"), "purchase"), // past edge: excluded
      (5L, 2L, ts("2026-01-01 00:10:00"), "purchase")  // other user: excluded
    ).toDF("event_id", "user_id", "ts", "event_type")
    val out = TemporalJoin.intervalPairs(df, "user_id", "ts", "event_id",
        "event_type", "click", "purchase", windowSec = 1800)
      .select("from_id", "to_id").as[(Long, Long)].collect().toSet
    assert(out === Set((1L, 3L)))
  }
}
