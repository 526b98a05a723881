package graft

import graft.engine.Seed

/** End-to-end smoke of the ad-hoc SQL runner: seed the demo catalog, run
  * the reference's own verification query (seed.sh:118's UNION of per-table
  * counts) from SQL text, check the golden counts, and deliver CSV. */
class ReplSpec extends SparkSpec {

  test("seed.sh:118 union query runs end-to-end from SQL text") {
    Seed.seedCatalog(spark, "repl_demo")
    val sql =
      """USE repl_demo;
        |SELECT 'events' AS table_name, count(*) AS n_rows FROM events
        |UNION ALL SELECT 'users', count(*) FROM users
        |UNION ALL SELECT 'orders', count(*) FROM orders
        |UNION ALL SELECT 'products', count(*) FROM products
        |UNION ALL SELECT 'transactions', count(*) FROM transactions
        |ORDER BY table_name""".stripMargin
    val rows = Repl.execute(spark, sql).collect()
      .map(r => (r.getString(0), r.getLong(1))).toSeq
    assert(rows === Seq("events" -> 200L, "orders" -> 150L, "products" -> 20L,
      "transactions" -> 300L, "users" -> 50L))

    // CSV delivery (S12): header + all rows round-trip
    val out = java.nio.file.Files.createTempDirectory("repl-csv").toString
    graft.engine.Lakehouse.deliverCsv(Repl.execute(spark, sql), out)
    val back = spark.read.option("header", "true").csv(out).collect()
    assert(back.length === 5)
    spark.sql("USE default")
  }

  test("statement splitter respects quoted semicolons") {
    assert(Repl.splitStatements("SELECT 1; SELECT 2") ===
      Seq("SELECT 1", "SELECT 2"))
    assert(Repl.splitStatements("SELECT 'a;b' AS x;\nSELECT 2;") ===
      Seq("SELECT 'a;b' AS x", "SELECT 2"))
    assert(Repl.splitStatements("  \n") === Seq.empty)
  }
}
