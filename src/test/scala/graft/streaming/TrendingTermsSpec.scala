package graft.streaming

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

import graft.SparkSpec

/** ST18: decayed trending terms — stream ≡ batch twin across batches
  * (including gap decay: a term silent for several ticks returns at the
  * correctly-decayed score), silent terms emit nothing. */
class TrendingTermsSpec extends SparkSpec {
  import spark.implicits._
  import TrendingTerms._

  test("decayed scores accumulate across batches and match the batch twin") {
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val prevProvider = spark.conf.getOption("spark.sql.streaming.stateStore.providerClass")
    spark.conf.set("spark.sql.streaming.stateStore.providerClass",
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    try {
      val in = MemoryStream[TermEvent]
      val q = scores(in.toDS(), decay = 0.5).writeStream.format("memory")
        .queryName("trending").outputMode("update").start()
      val all = Seq(
        // batch 1: tick 0
        Seq(TermEvent("spark", 0L, 4L), TermEvent("llm", 0L, 2L)),
        // batch 2: tick 1 — spark decays 0.5 then +2 = 4; news is new;
        // llm silent (emits nothing, decays implicitly)
        Seq(TermEvent("spark", 1L, 2L), TermEvent("news", 1L, 8L)),
        // batch 3: tick 3 — llm returns after a 3-tick gap:
        // 2·0.5³ + 1 = 1.25; one batch carries TWO ticks for spark
        // (2 then 3) to pin in-batch tick-order folding
        Seq(TermEvent("llm", 3L, 1L),
          TermEvent("spark", 3L, 1L), TermEvent("spark", 2L, 2L)))
      try {
        all.foreach { batch => in.addData(batch: _*); q.processAllAvailable() }
      } finally q.stop()

      val got = spark.table("trending").as[TermScore].collect().toSet
      // independent recomputation of the law score_t = Σ n_b·decay^(t−b)
      assert(got === Set(
        TermScore("spark", 0L, 4.0), TermScore("llm", 0L, 2.0),
        TermScore("spark", 1L, 4.0), TermScore("news", 1L, 8.0),
        TermScore("llm", 3L, 1.25),
        // spark at tick 3: ((4·0.5 + 2)·0.5 + 2)·0.5 + 1 = 3.0
        TermScore("spark", 3L, 3.0)))
      // llm emitted in exactly the two batches it appeared in
      assert(got.count(_.term == "llm") === 2)

      // the BATCH twin states the same law declaratively and agrees on
      // every (term, tick) the stream emitted
      val twin = scoresBatch(all.flatten.toDS(), decay = 0.5)
        .collect().map(s => (s.term, s.tick) -> s.score).toMap
      got.foreach { s =>
        assert(math.abs(twin((s.term, s.tick)) - s.score) < 1e-9,
          s"twin disagrees at (${s.term}, ${s.tick})")
      }
    } finally prevProvider match {
      case Some(v) => spark.conf.set("spark.sql.streaming.stateStore.providerClass", v)
      case None => spark.conf.unset("spark.sql.streaming.stateStore.providerClass")
    }
  }

  test("a late cross-batch row is clamped, not fatal — the query survives and stays exact after it") {
    // Default (lenient) mode: a tick regression across batches — data
    // that outran the upstream watermark — folds in at the key's current
    // tick with decay^0 instead of throwing. Strict mode's throw would
    // persist across checkpoint restarts (same batch replays, same
    // throw), so one late record must never poison the query.
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val prevProvider = spark.conf.getOption("spark.sql.streaming.stateStore.providerClass")
    spark.conf.set("spark.sql.streaming.stateStore.providerClass",
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    val in = MemoryStream[TermEvent]
    val q = scores(in.toDS(), decay = 0.5).writeStream.format("memory")
      .queryName("trending_late").outputMode("update").start()
    try {
      in.addData(TermEvent("spark", 2L, 4L)); q.processAllAvailable()
      // LATE: tick 0 arrives after tick 2 was folded — clamp to tick 2,
      // weight 1·decay^0: score 4 + 1 = 5, lastTick stays 2
      in.addData(TermEvent("spark", 0L, 1L)); q.processAllAvailable()
      // normal resumption: tick 4 decays the clamped state by 0.5²
      in.addData(TermEvent("spark", 4L, 2L)); q.processAllAvailable()
      // memory sink accumulates one row per batch the key emitted in;
      // the late batch re-emits tick 2 with the clamped score
      val got = spark.table("trending_late").as[TermScore].collect().toSet
      assert(got === Set(TermScore("spark", 2L, 4.0),
        TermScore("spark", 2L, 5.0), TermScore("spark", 4L, 3.25)))
    } finally {
      q.stop()
      prevProvider match {
        case Some(v) => spark.conf.set("spark.sql.streaming.stateStore.providerClass", v)
        case None => spark.conf.unset("spark.sql.streaming.stateStore.providerClass")
      }
    }
  }
}
