package graft

import graft.engine.Seed

/** Golden-count + idempotency contract of the seed replica
  * (/root/reference/compose/seed.sh:74-118: 200/50/150/20/300 rows). */
class SeedSpec extends SparkSpec {

  test("seed tables match the reference's golden row counts") {
    val counts = Seed.all(spark).map { case (n, df) => n -> df.count() }.toMap
    assert(counts === Map(
      "events" -> 200L, "users" -> 50L, "orders" -> 150L,
      "products" -> 20L, "transactions" -> 300L))
  }

  test("seed generation is deterministic (two builds are identical)") {
    val a = Seed.events(spark).collect().toSeq
    val b = Seed.events(spark).collect().toSeq
    assert(a === b)
  }

  test("events schema matches the reference DDL (seed.sh:72)") {
    val fields = Seed.events(spark).schema.fields.map(f => f.name -> f.dataType.sql).toMap
    assert(fields("id") === "BIGINT")
    assert(fields("ts") === "TIMESTAMP")
    assert(fields("event_type") === "STRING")
    assert(fields("amount") === "DOUBLE")
  }

  test("transactions keeps the reserved-word `timestamp` column (seed.sh:112)") {
    assert(Seed.transactions(spark).columns.contains("timestamp"))
  }

  test("seedCatalog is idempotent (reference re-seed invariant)") {
    Seed.seedCatalog(spark, "demo_test")
    val first = spark.table("demo_test.events").count()
    Seed.seedCatalog(spark, "demo_test")
    val second = spark.table("demo_test.events").count()
    assert(first === 200L && second === 200L)
  }
}
