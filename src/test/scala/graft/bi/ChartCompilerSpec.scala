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

  test("time grain buckets to __timestamp; percent metrics sum to 1") {
    val df = ChartCompiler.compile(spark,
      ChartSpec(datasource = "events", queryMode = "aggregate",
        metrics = Seq(Metric("count", None, "cnt")),
        percentMetrics = Seq(Metric("count", None, "cnt")),
        timeColumn = Some("ts"), timeGrain = Some("day"),
        orderBy = Seq(("__timestamp", true)), rowLimit = 1000),
      _ => events)
    val rows = df.collect()
    assert(df.columns.toSeq === Seq("__timestamp", "cnt", "pct_cnt"))
    assert(rows.map(_.getLong(1)).sum === 200L)
    assert(math.abs(rows.map(_.getDouble(2)).sum - 1.0) < 1e-9)
  }

  test("time_compare adds __prev twins; first period has no history; needs a grain") {
    val df = ChartCompiler.compile(spark,
      ChartSpec(datasource = "events", queryMode = "aggregate",
        metrics = Seq(Metric("count", None, "cnt")),
        timeColumn = Some("ts"), timeGrain = Some("day"),
        timeCompare = Some("1 day"),
        orderBy = Seq(("__timestamp", true)), rowLimit = 1000),
      _ => events)
    val rows = df.collect()
    assert(df.columns.toSeq === Seq("__timestamp", "cnt", "cnt__prev"))
    // earliest day can have no predecessor; later days compare to the prior one
    val byTs = rows.sortBy(_.getTimestamp(0).getTime)
    assert(byTs.head.isNullAt(2), "first period must have a null twin")
    byTs.sliding(2).foreach {
      case Array(prev, cur) =>
        if (cur.getTimestamp(0).getTime - prev.getTimestamp(0).getTime == 86400000L)
          assert(cur.getLong(2) === prev.getLong(1))
      case _ =>
    }
    intercept[IllegalArgumentException] {
      ChartCompiler.compile(spark,
        ChartSpec(datasource = "events", queryMode = "aggregate",
          metrics = Seq(Metric("count", None, "cnt")),
          timeCompare = Some("1 day")),
        _ => events)
    }
  }

  test("multiple percent metrics share one broadcast total row") {
    val df = ChartCompiler.compile(spark,
      ChartSpec(datasource = "events", queryMode = "aggregate",
        groupby = Seq("event_type"),
        metrics = Seq(Metric("count", None, "cnt"), Metric("sum", Some("amount"), "amt")),
        percentMetrics = Seq(Metric("count", None, "cnt"), Metric("sum", Some("amount"), "amt")),
        orderBy = Seq(("event_type", true)), rowLimit = 1000),
      _ => events)
    val rows = df.collect()
    assert(df.columns.toSeq === Seq("event_type", "cnt", "amt", "pct_cnt", "pct_amt"))
    assert(math.abs(rows.map(_.getDouble(3)).sum - 1.0) < 1e-9)
    assert(math.abs(rows.map(_.getDouble(4)).sum - 1.0) < 1e-9)
    // each pct column is its metric / grand total
    val totalCnt = rows.map(_.getLong(1)).sum.toDouble
    rows.foreach(r => assert(math.abs(r.getDouble(3) - r.getLong(1) / totalCnt) < 1e-9))
  }

  test("contribution mode: per-timestamp shares sum to 1; window stays grain-partitioned") {
    val df = ChartCompiler.compile(spark,
      ChartSpec(datasource = "events", queryMode = "aggregate",
        groupby = Seq("event_type"),
        metrics = Seq(Metric("count", None, "cnt")),
        timeColumn = Some("ts"), timeGrain = Some("day"),
        contribution = true, rowLimit = 10000),
      _ => events)
    import org.apache.spark.sql.functions._
    // shares within every timestamp sum to 1 (one group per day)
    val sums = df.groupBy("__timestamp").agg(sum("contrib_cnt").as("s")).collect()
    assert(sums.nonEmpty && sums.forall(r => math.abs(r.getDouble(1) - 1.0) < 1e-12))
    // the share window partitions by the grain key — never a global window
    df.write.format("noop").mode("overwrite").save()
    val plan = df.queryExecution.executedPlan match {
      case a: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec => a.executedPlan
      case p => p
    }
    val wins = plan.collect {
      case w: org.apache.spark.sql.execution.window.WindowExec => w
    }
    assert(wins.nonEmpty && wins.forall(_.partitionSpec.nonEmpty), plan.toString)
    // contribution without a grain or groupby is refused
    intercept[IllegalArgumentException] {
      ChartCompiler.compile(spark,
        ChartSpec(datasource = "events", queryMode = "aggregate",
          groupby = Seq("event_type"), metrics = Seq(Metric("count", None, "cnt")),
          contribution = true),
        _ => events).collect()
    }
  }

  test("simple adhoc filters compile to predicates") {
    val df = ChartCompiler.compile(spark,
      ChartSpec(datasource = "events", queryMode = "aggregate",
        metrics = Seq(Metric("count", None, "cnt")),
        filters = Seq(SimpleFilter("event_type", "=", "click"),
          SimpleFilter("user_id", "<=", 25)),
        rowLimit = 1),
      _ => events)
    val expected = events.filter("event_type = 'click' AND user_id <= 25").count()
    assert(df.collect().head.getLong(0) === expected && expected > 0)
  }

  test("series Others preserves totals and refuses non-additive metrics") {
    import org.apache.spark.sql.functions._
    val base = ChartSpec(datasource = "events", queryMode = "aggregate",
      groupby = Seq("event_type"),
      metrics = Seq(Metric("count", None, "cnt")),
      timeColumn = Some("ts"), timeGrain = Some("day"), rowLimit = 10000)
    val plain = ChartCompiler.compile(spark, base, _ => events)
    val others = ChartCompiler.compile(spark,
      base.copy(seriesLimit = Some(1), seriesOthers = true), _ => events)
    // totals per timestamp are preserved (nothing dropped, only relabeled)
    val totalPlain = plain.agg(sum("cnt")).collect()(0).getLong(0)
    val totalOthers = others.agg(sum("cnt")).collect()(0).getLong(0)
    assert(totalPlain === totalOthers)
    // exactly top-1 series + "Others" remain
    val series = others.select("event_type").distinct()
      .collect().map(_.getString(0)).toSet
    assert(series.size === 2 && series.contains("Others"))
    // non-additive metric refused under re-merge
    intercept[IllegalArgumentException] {
      ChartCompiler.compile(spark,
        base.copy(metrics = Seq(Metric("avg", Some("amount"), "m")),
          seriesLimit = Some(1), seriesOthers = true), _ => events).collect()
    }
  }

  test("RLS policies restrict a role's charts before aggregation; others unaffected") {
    import org.apache.spark.sql.functions._
    val spec = ChartSpec(datasource = "events", queryMode = "aggregate",
      groupby = Seq("event_type"),
      metrics = Seq(Metric("count", None, "cnt")), rowLimit = 100)
    val policies = Seq(
      Rls.Policy("tenant_a", "events", Seq(SimpleFilter("event_type", "=", "view"))),
      Rls.Policy("tenant_a", "other_table", Seq(SimpleFilter("id", ">", 5))))
    val restricted = Rls.compileAs(spark, spec, "tenant_a", policies, _ => events)
      .collect()
    // tenant_a sees ONLY its rows — and the aggregate is computed over
    // them, not filtered after the fact
    assert(restricted.map(_.getString(0)).toSet === Set("view"))
    assert(restricted.head.getLong(1) ===
      events.filter(col("event_type") === "view").count())
    // a role without a policy on this datasource sees everything
    val open = Rls.compileAs(spark, spec, "admin", policies, _ => events)
    assert(open.collect().length > 1)
  }

  test("dashboard grid lays out 2-per-row, width 6 (init_db.py:273-307)") {
    val d = Dashboard.grid("Demo", Seq("a", "b", "c"))
    assert(d.cells.map(c => (c.row, c.colOffset)) === Seq((0, 0), (0, 6), (1, 0)))
    assert(d.cells.map(_.chartId) === Seq(1, 2, 3))
  }

  test("position_json is byte-identical to the reference's json.dumps output") {
    // Pinned vector: the EXACT bytes `json.dumps(dashboard_json)` emits
    // when init_db.py:272-307 runs over three charts named a/b/c with
    // slice ids 1/2/3 (python dict insertion order, default ", "/": "
    // separators). Byte equality means a reference Superset instance
    // ingests our layout unmodified.
    val want =
      """{"DASHBOARD_VERSION_KEY": "v2", "ROOT_ID": {"children": ["GRID_ID"], "id": "ROOT_ID", "type": "ROOT"}, "GRID_ID": {"children": ["CHART-1", "CHART-2", "CHART-3"], "id": "GRID_ID", "parents": ["ROOT_ID"], "type": "GRID"}, "CHART-1": {"children": [], "id": "CHART-1", "meta": {"chartId": 1, "height": 50, "sliceName": "a", "width": 6}, "type": "CHART", "parents": ["ROOT_ID", "GRID_ID"]}, "CHART-2": {"children": [], "id": "CHART-2", "meta": {"chartId": 2, "height": 50, "sliceName": "b", "width": 6}, "type": "CHART", "parents": ["ROOT_ID", "GRID_ID"]}, "CHART-3": {"children": [], "id": "CHART-3", "meta": {"chartId": 3, "height": 50, "sliceName": "c", "width": 6}, "type": "CHART", "parents": ["ROOT_ID", "GRID_ID"]}}"""
    assert(Dashboard.toJson(Dashboard.grid("Demo", Seq("a", "b", "c"))) === want)
  }

  test("position_json survives a field-for-field walk of the init_db.py shape") {
    val mapper = new com.fasterxml.jackson.databind.ObjectMapper()
    val node = mapper.readTree(
      Dashboard.toJson(Dashboard.grid("Demo", Seq("x", "y", "z", "w", "v"))))
    assert(node.get("DASHBOARD_VERSION_KEY").asText() === "v2")
    assert(node.get("ROOT_ID").get("children").get(0).asText() === "GRID_ID")
    val grid = node.get("GRID_ID")
    assert(grid.get("parents").get(0).asText() === "ROOT_ID")
    val children = (0 until grid.get("children").size())
      .map(grid.get("children").get(_).asText())
    assert(children === (1 to 5).map(i => s"CHART-$i"))
    children.zipWithIndex.foreach { case (cid, i) =>
      val c = node.get(cid)
      assert(c.get("id").asText() === cid)
      assert(c.get("type").asText() === "CHART")
      assert(c.get("children").size() === 0)
      assert((0 until c.get("parents").size()).map(c.get("parents").get(_).asText())
        === Seq("ROOT_ID", "GRID_ID"))
      val meta = c.get("meta")
      assert(meta.get("chartId").asInt() === i + 1)
      assert(meta.get("height").asInt() === 50)
      assert(meta.get("width").asInt() === 6)
    }
  }

  test("dataset registry introspects columns like the Superset inspector") {
    Seed.seedCatalog(spark, "demo_bi")
    val ds = Datasets.describe(spark, "demo_bi", "events")
    assert(ds.columns.map(_.name).toSet ===
      Set("id", "ts", "event_type", "payload", "user_id", "amount"))
  }
}
