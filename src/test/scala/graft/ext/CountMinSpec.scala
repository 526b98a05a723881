package graft.ext

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Contracts for [[CountMin]]: one-sided error, exactness without
  * collisions, cell-wise mergeability, determinism. */
class CountMinSpec extends SparkSpec {

  private def itemsDf(xs: Seq[String]): DataFrame = {
    val s = spark; import s.implicits._
    xs.toDF("item")
  }

  private def estimates(items: Seq[String], depth: Int, width: Int,
      parts: Int = 1): Map[String, Long] = {
    val df0 = itemsDf(items)
    val df = if (parts > 1) df0.repartition(parts) else df0
    val sk = CountMin.sketch(df, "item", depth, width)
    val q = itemsDf(items.distinct)
    CountMin.estimate(sk, q, "item", depth, width)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
  }

  private val skewed: Seq[String] =
    Seq.fill(100)("hot") ++ (1 to 40).flatMap(i => Seq.fill(i % 5 + 1)(s"k$i"))

  test("never undercounts, and overshoot respects the epsilon*N bound") {
    val truth = skewed.groupBy(identity).view.mapValues(_.size.toLong).toMap
    val n = skewed.size
    val (depth, width) = (4, 16) // deliberately tight: collisions certain
    val est = estimates(skewed, depth, width)
    for ((k, t) <- truth) {
      assert(est(k) >= t, s"undercount on $k")
      // Markov bound per row: overshoot <= e/width * N holds w.h.p.;
      // with d=4 independent rows the min is comfortably inside 2eN/w.
      assert(est(k) <= t + 2 * math.E * n / width + 1, s"overshoot on $k")
    }
  }

  test("exact when the table is wide enough to avoid collisions") {
    val items = (1 to 20).flatMap(i => Seq.fill(i)(s"v$i"))
    val truth = items.groupBy(identity).view.mapValues(_.size.toLong).toMap
    // w >> distinct^2 makes all-rows-collision-free overwhelmingly
    // likely; with d=4 rows a single collision-free row suffices.
    assert(estimates(items, 4, 65536) == truth)
  }

  test("unseen keys estimate to zero when their cells are empty") {
    val sk = CountMin.sketch(itemsDf(Seq("a", "b")), "item", 4, 65536)
    val est = CountMin.estimate(sk, itemsDf(Seq("zz-never-seen")), "item", 4, 65536)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(est("zz-never-seen") == 0L)
  }

  test("merge of shard sketches equals the sketch of the union") {
    val (l, r) = skewed.splitAt(skewed.size / 3)
    val merged = CountMin.merge(
      CountMin.sketch(itemsDf(l), "item", 4, 32),
      CountMin.sketch(itemsDf(r), "item", 4, 32))
      .collect().map(x => (x.getInt(0), x.getLong(1)) -> x.getLong(2)).toMap
    val whole = CountMin.sketch(itemsDf(skewed), "item", 4, 32)
      .collect().map(x => (x.getInt(0), x.getLong(1)) -> x.getLong(2)).toMap
    assert(merged == whole)
  }

  test("sketch and estimates are partition-invariant") {
    assert(estimates(skewed, 4, 32) == estimates(skewed, 4, 32, parts = 7))
  }
}
