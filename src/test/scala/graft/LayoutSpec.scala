package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.execution.FileSourceScanExec
import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
import org.apache.spark.sql.execution.exchange.ShuffleExchangeLike

import graft.engine.Layout

/** The two storage-layout levers must actually change the physical plan:
  * day-partitioned writes prune partitions under time filters, and
  * co-bucketed tables join without any Exchange on the join inputs. */
class LayoutSpec extends SparkSpec {

  private def finalPlan(df: org.apache.spark.sql.DataFrame) =
    df.queryExecution.executedPlan match {
      case a: AdaptiveSparkPlanExec => a.executedPlan
      case p => p
    }

  test("partitioned-by-day write prunes partitions for time-range filters") {
    val events = Tables.events(spark, sf0001)
    Layout.writePartitionedByDay(events, "ts", "layout_events_byday")
    val all = spark.table("layout_events_byday")
    val day = events.agg(date_format(min(col("ts")), "yyyy-MM-dd")).collect()(0).getString(0)
    val oneDay = all.filter(col("p_day") === day)
    val scansAll = finalPlan(all).collect { case s: FileSourceScanExec => s }
    val scansPruned = finalPlan(oneDay).collect { case s: FileSourceScanExec => s }
    assert(scansAll.nonEmpty && scansPruned.nonEmpty)
    assert(scansPruned.forall(_.partitionFilters.nonEmpty), "filter must prune at partition level")
    assert(scansAll.map(_.relation.location.inputFiles.length).sum > 1,
      "partitioned table should span multiple partition directories")
    val expected = events.filter(date_format(col("ts"), "yyyy-MM-dd") === day).count()
    assert(oneDay.count() === expected && expected > 0)
  }

  test("co-bucketed tables equi-join with no shuffle on either input") {
    val orders = Tables.orders(spark, sf0001)
    val customer = Tables.customer(spark, sf0001)
    Layout.writeBucketed(orders.select("o_orderkey", "o_custkey", "o_totalprice"),
      "o_custkey", 8, "layout_orders_b")
    Layout.writeBucketed(customer.select("c_custkey", "c_mktsegment"),
      "c_custkey", 8, "layout_customer_b")
    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try {
      // force a non-broadcast join so the bucketing (not a broadcast) is
      // what removes the exchanges — the 100 TB fact⋈fact shape
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      val joined = spark.table("layout_orders_b")
        .join(spark.table("layout_customer_b"), col("o_custkey") === col("c_custkey"))
        .select("o_orderkey", "c_mktsegment")
      val rows = joined.collect()
      val shuffles = finalPlan(joined).collect { case e: ShuffleExchangeLike => e }
      assert(shuffles.isEmpty, s"bucketed join must not shuffle:\n${finalPlan(joined)}")
      // result parity with the plain join
      val expected = orders.join(customer, col("o_custkey") === col("c_custkey"))
        .select("o_orderkey", "c_mktsegment").collect()
      assert(rows.map(r => (r.getLong(0), r.getString(1))).sorted.toSeq ===
        expected.map(r => (r.getLong(0), r.getString(1))).sorted.toSeq)
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
  }
}
