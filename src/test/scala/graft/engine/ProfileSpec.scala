package graft.engine

import graft.SparkSpec

class ProfileSpec extends SparkSpec {
  import spark.implicits._

  private def df = Seq(
    (Some(1L), Some("aa"), "x"),
    (Some(2L), None, "y"),
    (Some(2L), Some("bbbb"), "x"),
    (None, Some("aa"), "x")
  ).toDF("id", "s", "tag")

  test("profile: one row per column with exact stats") {
    val p = Profile.profile(df, Seq("id", "s", "tag"))
      .as[(String, Long, Long, Long, String, String, Double)]
      .collect().map(r => r._1 -> r).toMap
    assert(p.keySet === Set("id", "s", "tag"))
    val (_, rows, nullsId, distId, minId, maxId, _) = p("id")
    assert(rows === 4L && nullsId === 1L && distId === 2L)
    assert(minId === "1" && maxId === "2")
    val (_, _, nullsS, distS, minS, maxS, lenS) = p("s")
    assert(nullsS === 1L && distS === 2L && minS === "aa" && maxS === "bbbb")
    assert(math.abs(lenS - (2.0 + 2.0 + 4.0) / 3.0) < 1e-6)
    val (_, _, nullsT, distT, _, _, _) = p("tag")
    assert(nullsT === 0L && distT === 2L)
  }

  test("approx mode keeps shape and exact null/row counts") {
    val p = Profile.profile(df, Seq("id", "s", "tag"), exact = false)
      .as[(String, Long, Long, Long, String, String, Double)].collect()
    assert(p.length === 3)
    // HLL at this cardinality is exact
    assert(p.map(r => r._1 -> r._4).toMap === Map("id" -> 2L, "s" -> 2L, "tag" -> 2L))
    assert(p.forall(_._2 === 4L))
  }
}
