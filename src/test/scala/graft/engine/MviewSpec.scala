package graft.engine

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Incremental MV maintenance: refresh after appends must equal a full
  * recompute, repeated refreshes converge, and empty deltas are no-ops. */
class MviewSpec extends SparkSpec {
  import spark.implicits._

  private val measures = Seq(
    Mview.Measure("count", None, "n"),
    Mview.Measure("sum", Some("v"), "total"))

  private def fullRecompute(source: String) =
    spark.table(source).groupBy("k")
      .agg(count(lit(1)).as("n"), sum(col("v")).as("total"))
      .as[(String, Long, Double)].collect().toSet

  test("refresh folds appended rows only; result equals full recompute") {
    val (src, view) = ("mv_source", "mv_daily")
    spark.sql(s"DROP TABLE IF EXISTS $src")
    spark.sql(s"DROP TABLE IF EXISTS $view")
    Seq(("a", 1.0), ("a", 2.0), ("b", 3.0)).toDF("k", "v")
      .write.saveAsTable(src)

    Mview.create(spark, view, src, Seq("k"), measures)
    assert(spark.table(view).as[(String, Long, Double)].collect().toSet ===
      fullRecompute(src))

    // epoch 1: append new keys and updates to old keys
    Seq(("a", 10.0), ("c", 5.0)).toDF("k", "v")
      .write.mode("append").saveAsTable(src)
    Mview.refresh(spark, view, src, Seq("k"), measures)
    assert(spark.table(view).as[(String, Long, Double)].collect().toSet ===
      fullRecompute(src))
    assert(spark.table(view).filter($"k" === "a")
      .select("n", "total").as[(Long, Double)].head() === ((3L, 13.0)))

    // epoch 2: nothing appended — refresh is a no-op and stays correct
    Mview.refresh(spark, view, src, Seq("k"), measures)
    assert(spark.table(view).as[(String, Long, Double)].collect().toSet ===
      fullRecompute(src))

    // epoch 3: another append, still converges
    Seq(("b", 1.0)).toDF("k", "v").write.mode("append").saveAsTable(src)
    Mview.refresh(spark, view, src, Seq("k"), measures)
    assert(spark.table(view).as[(String, Long, Double)].collect().toSet ===
      fullRecompute(src))
  }

  test("approx_distinct sketch measures refresh incrementally and match recompute") {
    val (src, view) = ("mv_sk_source", "mv_sk_view")
    spark.sql(s"DROP TABLE IF EXISTS $src")
    spark.sql(s"DROP TABLE IF EXISTS $view")
    val ms = Seq(
      Mview.Measure("count", None, "n"),
      Mview.Measure("approx_distinct", Some("u"), "uniq"))
    Seq(("a", 1L), ("a", 2L), ("a", 2L), ("b", 3L)).toDF("k", "u")
      .write.saveAsTable(src)
    Mview.create(spark, view, src, Seq("k"), ms)

    def viewEst = Mview.read(spark, view, Seq("k"), ms)
      .as[(String, Long, Long)].collect().toSet
    def recompute = spark.table(src).groupBy("k")
      .agg(count(lit(1)).as("n"),
        hll_sketch_estimate(hll_sketch_agg(col("u"))).as("uniq"))
      .as[(String, Long, Long)].collect().toSet

    assert(viewEst === recompute)
    // the estimate is exact at this cardinality: a=2, b=1
    assert(viewEst === Set(("a", 3L, 2L), ("b", 1L, 1L)))

    // append: new distincts for a (one repeated — must not double count),
    // a brand-new key c
    Seq(("a", 2L), ("a", 9L), ("c", 7L)).toDF("k", "u")
      .write.mode("append").saveAsTable(src)
    Mview.refresh(spark, view, src, Seq("k"), ms)
    assert(viewEst === recompute)
    assert(viewEst === Set(("a", 5L, 3L), ("b", 1L, 1L), ("c", 1L, 1L)))
  }

  test("non-additive measures are refused with a clear message") {
    val ex = intercept[IllegalArgumentException] {
      Mview.create(spark, "mv_bad", "mv_source", Seq("k"),
        Seq(Mview.Measure("avg", Some("v"), "a")))
    }
    assert(ex.getMessage.contains("non-additive"))
  }
}
