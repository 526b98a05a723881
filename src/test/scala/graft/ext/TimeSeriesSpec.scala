package graft.ext

import java.sql.Date

import graft.SparkSpec

class TimeSeriesSpec extends SparkSpec {
  import spark.implicits._

  private def d(s: String): Date = Date.valueOf(s)

  test("gapFillDaily densifies each key's range, carries last value, zero-fills the leading edge") {
    val obs = Seq(
      (1L, d("2026-01-01"), 10.0),
      (1L, d("2026-01-04"), 40.0), // 2-day gap → 10.0 carried into 01-02/01-03
      (2L, d("2026-02-10"), 7.0)   // different range entirely
    ).toDF("k", "day", "v")
    val got = TimeSeries.gapFillDaily(obs, "k", "day", "v")
      .as[(Long, Date, Double)].collect().toSet
    assert(got === Set(
      (1L, d("2026-01-01"), 10.0),
      (1L, d("2026-01-02"), 10.0),
      (1L, d("2026-01-03"), 10.0),
      (1L, d("2026-01-04"), 40.0),
      (2L, d("2026-02-10"), 7.0)))
  }

  test("dailySpine is exactly [min, max] per key — no global calendar bleed") {
    val obs = Seq((1L, d("2026-01-05"), 1.0), (1L, d("2026-01-07"), 1.0),
      (2L, d("2026-03-01"), 1.0)).toDF("k", "day", "v")
    val spine = TimeSeries.dailySpine(obs, "k", "day")
      .as[(Long, Date)].collect().toSet
    assert(spine === Set((1L, d("2026-01-05")), (1L, d("2026-01-06")),
      (1L, d("2026-01-07")), (2L, d("2026-03-01"))))
  }
}
