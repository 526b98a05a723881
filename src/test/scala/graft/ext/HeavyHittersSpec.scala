package graft.ext

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** [[HeavyHitters]] exactness contracts: the two-pass Misra–Gries +
  * recount scheme must return EXACTLY the items with count·k > n — equal
  * to the brute-force groupBy answer — for every partitioning, including
  * adversarial streams built to evict frequent items from a naive sketch.
  */
class HeavyHittersSpec extends SparkSpec {
  import spark.implicits._

  private def exact(items: Seq[String], k: Int): Set[(String, Long)] = {
    val n = items.size.toLong
    items.groupBy(identity).map { case (s, xs) => (s, xs.size.toLong) }
      .filter { case (_, c) => c * k > n }.toSet
  }

  private def run(items: Seq[String], k: Int, parts: Int): Set[(String, Long)] =
    HeavyHitters.frequentItems(
        items.toDF("item").repartition(parts), "item", k)
      .collect().map(r => (r.getString(0), r.getLong(1))).toSet

  test("equals brute force on a skewed stream, any partitioning") {
    // zipf-ish: item i appears ~1000/i times
    val items = (1 to 50).flatMap(i => Seq.fill(1000 / i)(s"w$i"))
    for (parts <- Seq(1, 3, 8)) {
      assert(run(items, k = 20, parts) === exact(items, 20), s"parts=$parts")
    }
  }

  test("adversarial eviction stream still yields the exact answer") {
    // k distinct rare items between every frequent occurrence — built to
    // force constant decrements in a k-counter sketch. The recount pass
    // makes the final set exact regardless.
    val k = 5
    val freq = "hot"
    val items = (1 to 200).flatMap { i =>
      freq +: (1 to 3).map(j => s"rare_${i}_$j")
    } // "hot": 200 of 800 → 200·5 > 800 holds
    for (parts <- Seq(1, 4)) {
      val got = run(items, k, parts)
      assert(got === exact(items, k))
      assert(got.exists(_._1 == freq))
    }
  }

  test("strict threshold: count·k == n is NOT frequent; nulls ignored") {
    // "a" has exactly n/2 occurrences with k=2 → excluded (strict >)
    val items = Seq("a", "a", "b", "c")
    assert(run(items, k = 2, parts = 2) === Set.empty)
    val withNulls = Seq(Some("a"), Some("a"), Some("a"), None, Some("b"))
      .toDF("item")
    val got = HeavyHitters.frequentItems(withNulls, "item", 2)
      .collect().map(r => (r.getString(0), r.getLong(1))).toSet
    // nulls are not items: n = 4, "a" has 3, 3·2 > 4
    assert(got === Set(("a", 3L)))
  }

  test("all-distinct stream returns empty; uniform two-item stream returns both at k=3") {
    val distinct = (1 to 100).map(i => s"u$i")
    assert(run(distinct, k = 10, parts = 4) === Set.empty)
    val uniform = Seq.fill(50)("x") ++ Seq.fill(50)("y")
    assert(run(uniform, k = 3, parts = 4) ===
      Set(("x", 50L), ("y", 50L)))
  }
}
