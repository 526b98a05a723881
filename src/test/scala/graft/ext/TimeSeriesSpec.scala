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

  // independent single-node Holt reference: the same floor-div recurrence
  // over a plain Scala fold (Math.floorDiv — the JDK's own floor division)
  private def holtRef(ys: Seq[Long], horizon: Int): Seq[(Long, Long, Long, Long)] = {
    var level = ys(1)
    var trend = ys(1) - ys(0)
    ys.drop(2).foreach { y =>
      val lv = Math.floorDiv(y + level + trend, 2L)
      trend = Math.floorDiv(lv - level + 3L * trend, 4L)
      level = lv
    }
    (1 to horizon).map(h => (level, trend, h.toLong, level + h * trend))
  }

  private def run(series: Seq[(String, Int, Long)], horizon: Int) =
    TimeSeries.holtForecast(series.toDF("k", "t", "y"), Seq("k"), "t", "y",
        horizon)
      .select("k", "level", "trend", "h", "yhat")
      .as[(String, Long, Long, Long, Long)].collect().toSet

  test("holtForecast matches the independent fold on rising/falling/flat series") {
    val a = Seq(100L, 120L, 150L, 130L, 170L, 210L)         // rising, noisy
    val b = Seq(500L, 450L, 380L, 300L, 210L)               // falling → negative trend
    val c = Seq(42L, 42L, 42L, 42L)                         // flat → zero trend
    val rows = a.zipWithIndex.map { case (y, i) => ("a", i, y) } ++
      b.zipWithIndex.map { case (y, i) => ("b", i, y) } ++
      c.zipWithIndex.map { case (y, i) => ("c", i, y) }
    val want = Seq("a" -> a, "b" -> b, "c" -> c).flatMap { case (k, ys) =>
      holtRef(ys, 3).map { case (l, tr, h, yh) => (k, l, tr, h, yh) }
    }.toSet
    assert(run(rows, 3) === want)
    // falling series must actually forecast downward
    assert(run(rows, 3).filter(_._1 == "b").forall(_._5 < 210L))
  }

  test("holtForecast floor-div is exact on negative values and negative trends") {
    // values crossing zero: floor(-7/2) = -4, not trunc's -3 — the case
    // where the two div conventions disagree
    val ys = Seq(10L, -3L, -15L, -6L, -29L)
    val rows = ys.zipWithIndex.map { case (y, i) => ("n", i, y) }
    val want = holtRef(ys, 2).map { case (l, t, h, yh) => ("n", l, t, h, yh) }.toSet
    assert(run(rows, 2) === want)
  }

  test("holtForecast drops sub-2-point series and is partition-invariant") {
    val rows = Seq(("solo", 0, 5L)) ++
      (0 until 40).map(i => ("big", i, (i * 37 % 11) * 100L - 300L))
    val one = run(rows, 3)
    assert(one.forall(_._1 == "big"), "1-point series must be dropped")
    val shuffled = TimeSeries.holtForecast(
        scala.util.Random.shuffle(rows).toDF("k", "t", "y").repartition(7),
        Seq("k"), "t", "y", 3)
      .select("k", "level", "trend", "h", "yhat")
      .as[(String, Long, Long, Long, Long)].collect().toSet
    assert(shuffled === one, "result must not depend on row order/partitioning")
  }

  test("holtForecast two-point series returns the init state unfolded") {
    val got = run(Seq(("p", 0, 7L), ("p", 1, 19L)), 2)
    // level = y2, trend = y2 − y1; ŷ = 19 + 12h
    assert(got === Set(("p", 19L, 12L, 1L, 31L), ("p", 19L, 12L, 2L, 43L)))
  }
}
