package graft.bi

import graft.SparkSpec
import graft.engine.Seed

class ChartCompilerSpec extends SparkSpec {

  private def events = Seed.events(spark)

  test("raw mode: projection + order + row limit (init_db.py:151-154)") {
    val df = ChartCompiler.compile(spark,
      ChartSpec(datasource = "events", queryMode = "raw",
        allColumns = Seq("id", "event_type"), orderBy = Seq(("id", true)), rowLimit = 7),
      _ => events)
    val rows = df.collect()
    assert(df.columns.toSeq === Seq("id", "event_type"))
    assert(rows.length === 7)
    assert(rows.map(_.getLong(0)).toSeq === (1L to 7L))
  }

  test("aggregate mode: groupby + metrics + order by metric desc") {
    val df = ChartCompiler.compile(spark,
      ChartSpec(datasource = "events", queryMode = "aggregate",
        groupby = Seq("event_type"),
        metrics = Seq(Metric("count", None, "cnt")),
        orderBy = Seq(("cnt", false), ("event_type", true)), rowLimit = 100),
      _ => events)
    val rows = df.collect().map(r => r.getString(0) -> r.getLong(1))
    assert(rows.map(_._2).sum === 200L)
    assert(rows.map(_._2).toSeq === rows.map(_._2).toSeq.sorted.reverse)
  }

  test("time range filter compiles to a pushed WHERE (init_db.py:145-147)") {
    val all = ChartCompiler.compile(spark,
      ChartSpec(datasource = "events", queryMode = "aggregate",
        metrics = Seq(Metric("count", None, "cnt")), rowLimit = 1),
      _ => events).collect().head.getLong(0)
    val some = ChartCompiler.compile(spark,
      ChartSpec(datasource = "events", queryMode = "aggregate",
        metrics = Seq(Metric("count", None, "cnt")),
        timeColumn = Some("ts"),
        timeRange = Some(("2025-12-15 00:00:00", "2026-01-01 00:00:00")),
        rowLimit = 1),
      _ => events).collect().head.getLong(0)
    assert(all === 200L)
    assert(some > 0L && some < all)
  }

  test("ungrouped aggregate and unsupported modes") {
    val df = ChartCompiler.compile(spark,
      ChartSpec(datasource = "events", queryMode = "aggregate",
        metrics = Seq(Metric("sum", Some("user_id"), "s")), rowLimit = 10),
      _ => events)
    assert(df.columns.toSeq === Seq("s"))
    intercept[IllegalArgumentException] {
      ChartCompiler.compile(spark, ChartSpec(datasource = "x", queryMode = "nope"), _ => events)
    }
  }

  test("dataset registry introspects columns like the Superset inspector") {
    Seed.seedCatalog(spark, "demo_bi")
    val ds = Datasets.describe(spark, "demo_bi", "events")
    assert(ds.columns.map(_.name).toSet ===
      Set("id", "ts", "event_type", "payload", "user_id", "amount"))
  }
}
