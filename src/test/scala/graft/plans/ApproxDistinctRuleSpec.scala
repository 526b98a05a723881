package graft.plans

import org.apache.spark.sql.functions._

import graft.{SparkSpec, Tables}

/** The flag-gated COUNT(DISTINCT) → HLL++ rewrite: plan actually changes,
  * estimates land inside the sketch's error envelope, and the default
  * (flag off / other aggregates) stays exact. */
class ApproxDistinctRuleSpec extends SparkSpec {

  private def withRule[A](body: => A): A = {
    val saved = spark.experimental.extraOptimizations
    spark.experimental.extraOptimizations = saved :+ ApproxDistinctRule
    try body finally spark.experimental.extraOptimizations = saved
  }

  private def distinctCustomers = Tables.orders(spark, sf0001)
    .groupBy("o_orderstatus")
    .agg(countDistinct(col("o_custkey")).as("u"))

  test("flag on: COUNT DISTINCT lowers to HLL++ and estimates within rsd envelope") {
    withRule {
      val exact = distinctCustomers.collect()
        .map(r => r.getString(0) -> r.getLong(1)).toMap
      spark.conf.set(ApproxDistinctRule.FLAG, "true")
      try {
        val df = distinctCustomers
        assert(df.queryExecution.optimizedPlan.toString.contains("approx_count_distinct"),
          df.queryExecution.optimizedPlan.toString)
        val approx = df.collect().map(r => r.getString(0) -> r.getLong(1)).toMap
        assert(approx.keySet === exact.keySet)
        approx.foreach { case (k, est) =>
          val ex = exact(k)
          assert(math.abs(est - ex) <= math.max(1L, (ex * 0.1).toLong),
            s"$k: est $est vs exact $ex")
        }
      } finally spark.conf.unset(ApproxDistinctRule.FLAG)
    }
  }

  test("flag off (default): plan keeps the exact distinct; other distincts never rewrite") {
    withRule {
      val plan = distinctCustomers.queryExecution.optimizedPlan.toString
      assert(!plan.contains("approx_count_distinct"), plan)
      spark.conf.set(ApproxDistinctRule.FLAG, "true")
      try {
        // sum(DISTINCT) is not a count — must stay exact
        val sums = Tables.orders(spark, sf0001)
          .agg(sum_distinct(col("o_custkey")).as("s"))
        assert(!sums.queryExecution.optimizedPlan.toString
          .contains("approx_count_distinct"))
        // exact semantics preserved for it
        val expected = Tables.orders(spark, sf0001)
          .select("o_custkey").distinct()
          .agg(sum("o_custkey")).collect()(0).getLong(0)
        assert(sums.collect()(0).getLong(0) === expected)
      } finally spark.conf.unset(ApproxDistinctRule.FLAG)
    }
  }
}
