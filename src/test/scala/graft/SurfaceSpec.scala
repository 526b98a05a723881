package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.SparkPlan
import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
import org.apache.spark.sql.execution.window.WindowExec
import org.apache.spark.sql.functions._

import graft.queries.Registry

/** Function-surface tier (Q126+): semantics cross-checks against naive
  * reference formulations plus the plan shapes that make them scale. */
class SurfaceSpec extends SparkSpec {

  import spark.implicits._

  private def run(name: String): DataFrame = Registry.byName(name).run(spark, sf0001)

  private def executed(df: DataFrame): SparkPlan = {
    df.write.format("noop").mode("overwrite").save()
    df.queryExecution.executedPlan match {
      case a: AdaptiveSparkPlanExec => a.executedPlan
      case p => p
    }
  }

  test("q126 array HOFs match the explode-based reference formulation") {
    val hof = run("q126_array_hofs")
    val docs = Tables.load(spark, sf0001, "documents")
    val ref = docs
      .select(col("doc_id"), explode(split(lower(trim(col("text"))), "\\s+")).as("w"))
      .groupBy("doc_id")
      .agg(count(lit(1)).cast("int").as("n_tokens"),
        sum(when(length(col("w")) >= 8, 1).otherwise(0)).cast("int").as("n_long"),
        sum(length(col("w"))).as("total_chars"),
        max(length(col("w"))).cast("long").as("max_len"))
    assert(hof.count() === ref.count())
    assert(hof.except(ref).isEmpty && ref.except(hof).isEmpty)
  }

  test("q126 stays narrow: no explode, no aggregate exchange before the display sort") {
    val plan = executed(run("q126_array_hofs"))
    val generates = plan.collect {
      case g: org.apache.spark.sql.execution.GenerateExec => g
    }
    assert(generates.isEmpty, s"array HOFs should not lower to explode:\n$plan")
    val aggs = plan.collect {
      case a: org.apache.spark.sql.execution.aggregate.BaseAggregateExec => a
    }
    assert(aggs.isEmpty, s"per-row array fold should not shuffle to an aggregate:\n$plan")
  }

  test("q127 position comes from the generator, not a window over the exploded set") {
    val plan = executed(run("q127_unnest_ordinality"))
    assert(plan.collect { case w: WindowExec => w }.isEmpty, plan.toString)
  }

  test("q129 HLL union of per-group sketches reproduces the direct global estimate") {
    // Union-of-parts ≡ sketch-of-whole is the mergeability contract that
    // makes HLL rollups trustworthy; for deterministic DataSketches HLL the
    // estimates are identical, not merely close.
    val row = run("q129_hll_mergeable").collect().head
    assert(row.getBoolean(1) && row.getBoolean(2), row.toString)
    val cust = Tables.load(spark, sf0001, "orders").select(col("o_custkey"))
    val direct = cust.agg(hll_sketch_estimate(hll_sketch_agg(col("o_custkey"))))
      .collect().head.getLong(0)
    val merged = cust.withColumn("g", col("o_custkey") % 7)
      .groupBy("g").agg(hll_sketch_agg(col("o_custkey")).as("sk"))
      .agg(hll_sketch_estimate(hll_union_agg(col("sk"))))
      .collect().head.getLong(0)
    assert(direct === merged)
  }

  test("q131 forward fill carries the last purchase and is -1 before the first") {
    val events = Seq(
      (1L, 1L, "view", 5.0), (1L, 2L, "purchase", 10.0),
      (1L, 3L, "click", 7.0), (1L, 4L, "purchase", 20.0), (1L, 5L, "view", 9.0),
      (2L, 6L, "view", 3.0))
      .toDF("user_id", "event_id", "event_type", "value")
      .withColumn("ts", timestamp_seconds(col("event_id")))
    events.createOrReplaceTempView("ff_tiny")
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("user_id").orderBy("ts", "event_id")
      .rowsBetween(Long.MinValue, 0)
    val out = events.select(col("user_id"), col("event_id"),
        coalesce(last(when(col("event_type") === "purchase", col("value")),
          ignoreNulls = true).over(w), lit(-1d)).as("lp"))
      .orderBy("user_id", "event_id")
      .as[(Long, Long, Double)].collect().toSeq
    assert(out === Seq(
      (1L, 1L, -1d), (1L, 2L, 10d), (1L, 3L, 10d), (1L, 4L, 20d), (1L, 5L, 20d),
      (2L, 6L, -1d)))
  }

  test("q131 window is user-partitioned (no global single-partition window)") {
    val plan = executed(run("q131_forward_fill"))
    val wins = plan.collect { case w: WindowExec => w }
    assert(wins.nonEmpty && wins.forall(_.partitionSpec.nonEmpty), plan.toString)
  }
}
