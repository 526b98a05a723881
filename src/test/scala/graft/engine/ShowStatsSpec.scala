package graft.engine

import graft.SparkSpec

/** WP4 — `SHOW STATS FOR t`: Trino's column-statistics statement,
  * computed live in one aggregate pass and unpivoted to Trino's exact
  * output shape. */
class ShowStatsSpec extends SparkSpec {
  import spark.implicits._

  private def freshName(p: String) =
    p + java.util.UUID.randomUUID().toString.replace("-", "").take(8)

  test("per-column rows carry distincts/nulls/bounds; the summary row carries row_count") {
    val t = freshName("ss_")
    Seq(
      (1L, Some("a"), Some(1.5)),
      (2L, Some("bb"), None),
      (3L, None, Some(9.0)),
      (4L, Some("a"), Some(1.5))
    ).toDF("id", "s", "x").write.saveAsTable(t)
    val rows = Lakehouse.sql(spark, s"SHOW STATS FOR $t").collect()
    assert(rows.map(_.getString(0)).toSeq === Seq("id", "s", "x", null))
    val byName = rows.filter(_.getString(0) != null)
      .map(r => r.getString(0) -> r).toMap
    // id: 4 distinct, no nulls, bounds 1..4
    assert(byName("id").getDouble(2) === 4.0)
    assert(byName("id").getDouble(3) === 0.0)
    assert(byName("id").getString(5) === "1" && byName("id").getString(6) === "4")
    // s: 2 distinct non-null values, 1/4 nulls, data_size = 4 bytes
    assert(byName("s").getDouble(2) === 2.0)
    assert(byName("s").getDouble(3) === 0.25)
    assert(byName("s").getDouble(1) === 4.0)
    assert(byName("s").getString(5) === "a" && byName("s").getString(6) === "bb")
    // x: nulls_fraction 0.25, bounds as strings
    assert(byName("x").getDouble(3) === 0.25)
    assert(byName("x").getString(5) === "1.5" && byName("x").getString(6) === "9.0")
    // summary row: only row_count set
    val summary = rows.last
    assert(summary.isNullAt(0) && summary.getDouble(4) === 4.0)
  }

  test("the subquery form profiles the FILTERED relation") {
    val t = freshName("ss_q_")
    Seq.tabulate(10)(i => (i.toLong, i % 3)).toDF("id", "g").write.saveAsTable(t)
    val rows = Lakehouse.sql(spark,
      s"SHOW STATS FOR (SELECT id FROM $t WHERE g = 0)").collect()
    assert(rows.map(_.getString(0)).toSeq === Seq("id", null))
    assert(rows.last.getDouble(4) === 4.0, "rows 0,3,6,9 → count 4")
    assert(rows.head.getString(5) === "0" && rows.head.getString(6) === "9")
  }

  test("complex columns render with NULL stats instead of erroring; backticked tables parse") {
    val t = freshName("ss_cx_")
    Seq((1L, Seq(1, 2))).toDF("id", "arr").write.saveAsTable(t)
    val rows = Lakehouse.sql(spark, s"SHOW STATS FOR `$t`").collect()
    val arr = rows.find(r => r.getString(0) == "arr").get
    assert(arr.isNullAt(2) && arr.isNullAt(5) && arr.isNullAt(6))
    assert(rows.last.getDouble(4) === 1.0)
  }
}
