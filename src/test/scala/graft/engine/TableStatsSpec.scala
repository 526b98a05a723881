package graft.engine

import org.apache.spark.sql.functions._

import graft.{SparkSpec, Tables}

class TableStatsSpec extends SparkSpec {

  private def jobCount: Int =
    spark.sparkContext.statusTracker.getJobIdsForGroup(null).length

  test("parquet-backed row count is exact and launches no Spark job") {
    val emb = Tables.embeddings(spark, sf0001)
    val before = jobCount
    val n = TableStats.rowCountNoJob(emb)
    assert(jobCount === before, "rowCountNoJob must not launch a job")
    assert(n === emb.count())
  }

  test("projections and casts above the scan do not hide the footer count") {
    val df = Tables.embeddings(spark, sf0001)
      .select(col("vec_id"), col("embedding").cast("array<double>").as("v"))
    assert(TableStats.rowCountNoJob(df) ===
      Tables.embeddings(spark, sf0001).count())
  }

  test("driver-local data resolves from the relation, not a job") {
    import spark.implicits._
    val df = (1 to 137).toDF("x")
    val before = jobCount
    assert(TableStats.rowCountNoJob(df) === 137L)
    assert(jobCount === before)
  }

  test("estimate fallback is positive and order-of-magnitude sane") {
    import spark.implicits._
    // A join is multi-leaf: summed leaf counts are an upper bound — the
    // safe direction for bucket sizing (more bits, never fewer).
    val a = (1 to 100).toDF("x")
    val b = (1 to 100).toDF("x")
    val n = TableStats.rowCountNoJob(a.join(b, "x"))
    assert(n >= 100L && n <= 400L)
  }
}
