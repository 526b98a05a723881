package graft

import graft.engine.Lakehouse

/** Exercises the literal SQL DDL/DML surface the reference seeds through
  * (seed.sh:34-118, README.md:62): schema creation, typed table DDL,
  * INSERT VALUES, INSERT SELECT with the sequence generator, idempotent
  * drop/re-create. */
class LakehouseSpec extends SparkSpec {

  test("liveness + catalog probes (seed.sh:34,49)") {
    assert(Lakehouse.ping(spark))
    assert(Lakehouse.listSchemas(spark).contains("default"))
  }

  test("full seed.sh DDL/DML round-trip as literal SQL") {
    Lakehouse.createSchema(spark, "lh_demo")
    Lakehouse.dropTable(spark, "lh_demo.mini_events")
    // seed.sh:72 shape, trimmed
    Lakehouse.createTable(spark, "lh_demo.mini_events",
      Seq("id" -> "BIGINT", "event_type" -> "STRING", "amount" -> "DOUBLE"))
    // README.md:62 — INSERT INTO ... VALUES
    spark.sql("INSERT INTO lh_demo.mini_events VALUES (999, 'click', 123.45)")
    // seed.sh:75 — INSERT INTO ... SELECT over the row generator, with the
    // reference's CASE / modulo / concat expression shapes
    spark.sql(
      """INSERT INTO lh_demo.mini_events
        |SELECT n AS id,
        |  CASE (n % 5) WHEN 0 THEN 'click' WHEN 1 THEN 'purchase' WHEN 2 THEN 'view'
        |       WHEN 3 THEN 'login' ELSE 'logout' END AS event_type,
        |  CAST((n * 10.5) + 100.0 AS DOUBLE) AS amount
        |FROM (SELECT explode(sequence(1, 200)) AS n)""".stripMargin)
    assert(spark.table("lh_demo.mini_events").count() === 201)
    // re-seed idempotency: drop + recreate converges (seed.sh:69 pattern)
    Lakehouse.dropTable(spark, "lh_demo.mini_events")
    Lakehouse.createTable(spark, "lh_demo.mini_events",
      Seq("id" -> "BIGINT", "event_type" -> "STRING", "amount" -> "DOUBLE"))
    assert(spark.table("lh_demo.mini_events").count() === 0)
  }

  test("CSV result delivery round-trips with header (S12, seed.sh:9)") {
    val out = java.nio.file.Files.createTempDirectory("graft-csv").toString
    Lakehouse.deliverCsv(
      Lakehouse.sql(spark, "SELECT 1 AS a, 'x' AS b").coalesce(1), out)
    val back = spark.read.option("header", "true").csv(out).collect()
    assert(back.map(r => (r.getString(0), r.getString(1))).toSeq === Seq(("1", "x")))
  }

  test("external table registration reads driver parquet in place (S11)") {
    Lakehouse.createSchema(spark, "lh_demo")
    Lakehouse.dropTable(spark, "lh_demo.ext_nation")
    Lakehouse.registerExternal(spark, "lh_demo.ext_nation", s"$sf0001/nation.parquet")
    assert(spark.table("lh_demo.ext_nation").count() === 25)
  }

  test("views are saved queries resolved at read time (Superset dataset shape)") {
    Lakehouse.createSchema(spark, "lh_demo")
    Lakehouse.dropTable(spark, "lh_demo.v_src")
    Lakehouse.registerExternal(spark, "lh_demo.v_src", s"$sf0001/nation.parquet")
    Lakehouse.createView(spark, "lh_demo.v_small",
      "SELECT n_regionkey, count(*) AS n FROM lh_demo.v_src GROUP BY n_regionkey")
    val viaView = spark.table("lh_demo.v_small").collect()
      .map(r => r.getInt(0) -> r.getLong(1)).toMap
    val direct = spark.table("lh_demo.v_src").groupBy("n_regionkey").count()
      .collect().map(r => r.getInt(0) -> r.getLong(1)).toMap
    assert(viaView === direct && viaView.nonEmpty)
    // views re-resolve: replacing the body changes the result without DDL churn
    Lakehouse.createView(spark, "lh_demo.v_small",
      "SELECT n_regionkey, count(*) + 1 AS n FROM lh_demo.v_src GROUP BY n_regionkey")
    assert(spark.table("lh_demo.v_small").collect()
      .map(r => r.getInt(0) -> r.getLong(1)).toMap === direct.map { case (k, v) => k -> (v + 1) })
  }

  test("ANALYZE TABLE lands statistics in the catalog for the cost model") {
    Lakehouse.createSchema(spark, "lh_demo")
    Lakehouse.dropTable(spark, "lh_demo.an_nation")
    graft.Tables.nation(spark, sf0001).write.saveAsTable("lh_demo.an_nation")
    assert(Lakehouse.tableStats(spark, "lh_demo.an_nation").forall(!_.contains("rows")))
    Lakehouse.analyze(spark, "lh_demo.an_nation", Seq("n_nationkey", "n_regionkey"))
    val stats = Lakehouse.tableStats(spark, "lh_demo.an_nation")
    assert(stats.exists(s => s.contains("25 rows")), s"no row stats: $stats")
  }

  test("CACHE TABLE swaps parquet scans for InMemoryTableScan") {
    Lakehouse.createSchema(spark, "lh_demo")
    Lakehouse.dropTable(spark, "lh_demo.c_nation")
    Lakehouse.registerExternal(spark, "lh_demo.c_nation", s"$sf0001/nation.parquet")
    Lakehouse.cacheTable(spark, "lh_demo.c_nation")
    try {
      val df = spark.table("lh_demo.c_nation").filter("n_regionkey = 1")
      assert(df.count() === 5)
      val plan = df.queryExecution.executedPlan.toString
      assert(plan.contains("In-memory table") || plan.contains("InMemoryTableScan"), plan)
    } finally Lakehouse.uncacheTable(spark, "lh_demo.c_nation")
  }
}
