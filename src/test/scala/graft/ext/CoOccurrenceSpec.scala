package graft.ext

import graft.SparkSpec

/** [[CoOccurrence]] contracts: brute-force equality on known baskets, the
  * promiscuous-basket cap (dropped BEFORE pair minting), duplicate
  * membership rows collapsing, canonical pair order, null discipline.
  */
class CoOccurrenceSpec extends SparkSpec {
  import spark.implicits._

  private def run(m: Seq[(Long, Long)], cap: Int): Set[(Long, Long, Long)] =
    CoOccurrence.pairCounts(m.toDF("b", "i"), "b", "i", cap)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet

  private def brute(m: Seq[(Long, Long)], cap: Int): Set[(Long, Long, Long)] = {
    val byB = m.distinct.groupBy(_._1).view.mapValues(_.map(_._2).distinct)
      .filter(_._2.size <= cap)
    byB.values.flatMap { items =>
      for (a <- items; b <- items if a < b) yield (a, b)
    }.groupBy(identity).map { case ((a, b), xs) => (a, b, xs.size.toLong) }.toSet
  }

  test("equals brute force; duplicate memberships collapse") {
    val m = Seq(1L -> 10L, 1L -> 11L, 1L -> 12L, 1L -> 10L, // dup row
      2L -> 10L, 2L -> 11L, 3L -> 11L, 3L -> 12L)
    val got = run(m, cap = 10)
    assert(got === brute(m, 10))
    assert(got.contains((10L, 11L, 2L))) // baskets 1 and 2
  }

  test("promiscuous baskets are dropped, not truncated") {
    // basket 9 holds 5 items; cap 4 removes ALL its pairs
    val big = (1L to 5L).map(i => 9L -> (100L + i))
    val m = big ++ Seq(1L -> 101L, 1L -> 102L)
    val got = run(m, cap = 4)
    assert(got === Set((101L, 102L, 1L)))
    // raising the cap brings basket 9 back
    assert(run(m, cap = 5) === brute(m, 5))
  }

  test("canonical order and null discipline") {
    val m = Seq(Some(1L) -> Some(20L), Some(1L) -> Some(10L),
      Option.empty[Long] -> Some(30L), Some(2L) -> Option.empty[Long],
      Some(2L) -> Some(10L))
      .map { case (b, i) => (b, i) }.toDF("b", "i")
    val got = CoOccurrence.pairCounts(m, "b", "i", 10)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(got === Set((10L, 20L, 1L))) // a < b enforced; null rows gone
  }
}
