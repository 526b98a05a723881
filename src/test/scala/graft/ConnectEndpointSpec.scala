package graft

import graft.engine.{Lakehouse, Seed}

/** §3 lifecycle closure: the reference's clients are all REMOTE (Trino CLI
  * over HTTP, SQLAlchemy, browser), so the engine must answer over a real
  * wire protocol, not just in-process. This spec seeds the demo catalog,
  * starts the Spark Connect gRPC endpoint, and drives the reference's own
  * verification query (seed.sh:118's UNION of per-table counts) from a
  * genuine Spark Connect CLIENT session — separate session object, gRPC
  * transport, Arrow result batches — asserting the golden counts come
  * back over the wire. */
class ConnectEndpointSpec extends SparkSpec {

  test("seed union query answers over the Spark Connect wire protocol") {
    Seed.seedCatalog(spark, "wire_demo")
    val port = 15990
    Lakehouse.startConnectServer(spark, port)
    try {
      val remote = org.apache.spark.sql.connect.SparkSession.builder()
        .remote(s"sc://localhost:$port").create()
      try {
        // the client session is a CONNECT session, not the local one —
        // everything below travels the gRPC wire
        assert(remote.getClass.getName
          === "org.apache.spark.sql.connect.SparkSession")
        val rows = remote.sql(
          """SELECT 'events' AS table_name, count(*) AS n_rows FROM wire_demo.events
            |UNION ALL SELECT 'users', count(*) FROM wire_demo.users
            |UNION ALL SELECT 'orders', count(*) FROM wire_demo.orders
            |UNION ALL SELECT 'products', count(*) FROM wire_demo.products
            |UNION ALL SELECT 'transactions', count(*) FROM wire_demo.transactions
            |ORDER BY table_name""".stripMargin).collect()
          .map(r => (r.getString(0), r.getLong(1))).toSeq
        assert(rows === Seq("events" -> 200L, "orders" -> 150L,
          "products" -> 20L, "transactions" -> 300L, "users" -> 50L))
        // DDL + DML round-trip: a remote writer's table is visible to the
        // local session (shared catalog — the coordinator model)
        remote.sql("CREATE TABLE wire_demo.wire_scratch AS SELECT 42 AS x")
        assert(spark.table("wire_demo.wire_scratch").collect()
          .map(_.getInt(0)).toSeq === Seq(42))
        remote.sql("DROP TABLE wire_demo.wire_scratch")
      } finally remote.close()
    } finally Lakehouse.stopConnectServer()
  }
}
