package graft

import org.apache.spark.sql.execution.FileSourceScanExec
import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec

/** Typed Dataset[T] access: schema checked at plan time, column pruning
  * preserved through the encoder. */
class TypedTablesSpec extends SparkSpec {

  test("typed loads round-trip with correct Scala types") {
    val li = TypedTables.lineitem(spark, sf0001)
    val first = li.head()
    assert(first.l_orderkey > 0 && first.l_extendedprice > 0.0)
    assert(TypedTables.nation(spark, sf0001).collect().length === 25)
    val doc = TypedTables.documents(spark, sf0001).head()
    assert(doc.text.nonEmpty && doc.lang.nonEmpty)
    val emb = TypedTables.embeddings(spark, sf0001).head()
    assert(emb.embedding.length === 64)
  }

  test("typed pipeline prunes the parquet scan to case-class fields") {
    val spark0 = spark
    import spark0.implicits._
    // pruning engages once the typed deserializer is in the plan (a bare
    // as[T] keeps the full relation schema until the fields are used)
    val li = TypedTables.lineitem(spark, sf0001).map(l => l)
    val plan = li.queryExecution.executedPlan match {
      case a: AdaptiveSparkPlanExec => a.executedPlan
      case p => p
    }
    val scans = plan.collect { case s: FileSourceScanExec => s }
    assert(scans.nonEmpty)
    // parquet lineitem has 11 columns; the case class declares 7
    assert(scans.head.requiredSchema.fieldNames.toSet ===
      Set("l_orderkey", "l_partkey", "l_suppkey", "l_quantity",
        "l_extendedprice", "l_discount", "l_shipdate"))
  }

  test("typed aggregation composes with the untyped API") {
    val spark0 = spark
    import spark0.implicits._
    val revenue = TypedTables.lineitem(spark, sf0001)
      .filter(l => l.l_discount > 0.05)
      .map(l => l.l_extendedprice * (1 - l.l_discount))
      .reduce(_ + _)
    assert(revenue > 0.0)
  }
}
