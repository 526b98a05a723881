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

  test("join view: appends on either or both sides equal a full re-join") {
    val (fact, dim, view) = ("mvj_fact", "mvj_dim", "mvj_view")
    Seq(fact, dim, view).foreach(t => spark.sql(s"DROP TABLE IF EXISTS $t"))
    Seq((1L, 10.0), (1L, 20.0), (2L, 5.0)).toDF("id", "v")
      .write.saveAsTable(fact)
    Seq((1L, "east"), (2L, "west")).toDF("id", "region")
      .write.saveAsTable(dim)
    val ms = Seq(
      Mview.Measure("count", None, "n"),
      Mview.Measure("sum", Some("v"), "total"))
    def fullJoin = spark.table(fact).join(spark.table(dim), Seq("id"))
      .groupBy("region")
      .agg(count(lit(1)).as("n"), sum(col("v")).as("total"))
      .as[(String, Long, Double)].collect().toSet
    def stored = spark.table(view).as[(String, Long, Double)].collect().toSet

    Mview.createJoin(spark, view, fact, dim, Seq("id"), Seq("region"), ms)
    assert(stored === fullJoin)

    // epoch 1: fact-side append only (old dim rows must join the delta)
    Seq((1L, 7.0), (2L, 1.0)).toDF("id", "v")
      .write.mode("append").saveAsTable(fact)
    Mview.refreshJoin(spark, view, fact, dim, Seq("id"), Seq("region"), ms)
    assert(stored === fullJoin)

    // epoch 2: dim-side append only — NEW dim row joins historical fact
    // rows it previously dropped (id 3 appears in fact first)
    Seq((3L, 2.0)).toDF("id", "v").write.mode("append").saveAsTable(fact)
    Mview.refreshJoin(spark, view, fact, dim, Seq("id"), Seq("region"), ms)
    Seq((3L, "north")).toDF("id", "region")
      .write.mode("append").saveAsTable(dim)
    Mview.refreshJoin(spark, view, fact, dim, Seq("id"), Seq("region"), ms)
    assert(stored === fullJoin)
    assert(spark.table(view).filter($"region" === "north")
      .select("n", "total").as[(Long, Double)].head() === ((1L, 2.0)))

    // epoch 3: both sides append in the same epoch (the ΔA⋈ΔB corner —
    // a brand-new id appears on both sides at once and must count ONCE)
    Seq((4L, 9.0)).toDF("id", "v").write.mode("append").saveAsTable(fact)
    Seq((4L, "south")).toDF("id", "region")
      .write.mode("append").saveAsTable(dim)
    Mview.refreshJoin(spark, view, fact, dim, Seq("id"), Seq("region"), ms)
    assert(stored === fullJoin)

    // epoch 4: empty deltas are a no-op and stay correct
    Mview.refreshJoin(spark, view, fact, dim, Seq("id"), Seq("region"), ms)
    assert(stored === fullJoin)
  }

  test("refreshMor: upsert retractions, positional deletes, group deletion") {
    val (src, view) = ("mvmor_src", "mvmor_view")
    Seq(src, view).foreach(t => spark.sql(s"DROP TABLE IF EXISTS $t"))
    Seq((1L, "a", 1.0), (2L, "a", 2.0), (3L, "b", 3.0), (4L, "tiny", 4.0))
      .toDF("id", "k", "v").write.saveAsTable(src)
    def current = Layout.readCurrent(spark, src).groupBy("k")
      .agg(count(lit(1)).as("n"), sum(col("v")).as("total"))
      .as[(String, Long, Double)].collect().toSet
    def stored = spark.table(view).as[(String, Long, Double)].collect().toSet

    Mview.create(spark, view, src, Seq("k"), measures)
    assert(stored === current)

    // epoch 1: one upsert batch — id 2 changes VALUE within 'a'
    // (retract 2.0, insert 20.0), id 4 MOVES OUT of 'tiny' (the group
    // empties and must leave the view), ids 5–6 are brand new
    Layout.upsertMor(spark, src,
      Seq((2L, "a", 20.0), (4L, "a", 40.0), (5L, "d", 5.0), (6L, "d", 6.0))
        .toDF("id", "k", "v"), "id")
    Mview.refreshMor(spark, view, src, Seq("k"), measures)
    assert(stored === current)
    assert(!stored.exists(_._1 == "tiny"), "emptied group must leave the view")
    assert(spark.table(view).filter($"k" === "a")
      .select("n", "total").as[(Long, Double)].head() === ((3L, 61.0)))

    // epoch 2: positional MOR delete empties 'b' — the other delete shape
    Layout.deleteWhereMor(spark, src, col("k") === "b")
    Mview.refreshMor(spark, view, src, Seq("k"), measures)
    assert(stored === current)
    assert(!stored.exists(_._1 == "b"))

    // epoch 3: nothing changed — no-op refresh stays correct
    Mview.refreshMor(spark, view, src, Seq("k"), measures)
    assert(stored === current)

    // epoch 4: upsert + delete in the SAME window: id 5 moves d→e, then
    // everything in 'e' dies — the insert must not resurrect at merge
    Layout.upsertMor(spark, src,
      Seq((5L, "e", 50.0)).toDF("id", "k", "v"), "id")
    Layout.deleteWhereMor(spark, src, col("k") === "e")
    Mview.refreshMor(spark, view, src, Seq("k"), measures)
    assert(stored === current)
    assert(!stored.exists(_._1 == "e"))
  }

  test("refreshJoinMor: CDC fact + dim rename/appends equal a full re-join") {
    val (fact, dim, view) = ("mvjm_fact", "mvjm_dim", "mvjm_view")
    Seq(fact, dim, view).foreach(t => spark.sql(s"DROP TABLE IF EXISTS $t"))
    Seq((1L, 10L, 1.0), (2L, 10L, 2.0), (3L, 20L, 3.0), (4L, 30L, 4.0))
      .toDF("id", "fk", "v").write.saveAsTable(fact)
    Seq((10L, "east"), (20L, "west"), (30L, "tiny"))
      .toDF("fk", "region").write.saveAsTable(dim)
    val ms = Seq(
      Mview.Measure("count", None, "n"),
      Mview.Measure("sum", Some("v"), "total"))
    def fullJoin = Layout.readCurrent(spark, fact)
      .join(Layout.readCurrent(spark, dim), Seq("fk"))
      .groupBy("region")
      .agg(count(lit(1)).as("n"), sum(col("v")).as("total"))
      .as[(String, Long, Double)].collect().toSet
    def stored = spark.table(view).as[(String, Long, Double)].collect().toSet

    Mview.createJoin(spark, view, fact, dim, Seq("fk"), Seq("region"), ms)
    assert(stored === fullJoin)

    // epoch 1: CDC on the fact side only — id 2 changes VALUE (retract
    // 2.0 / insert 20.0 within east), id 4 MOVES 30→10 (the 'tiny'
    // group empties and must leave the view), id 5 is brand new
    Layout.upsertMor(spark, fact,
      Seq((2L, 10L, 20.0), (4L, 10L, 40.0), (5L, 20L, 5.0))
        .toDF("id", "fk", "v"), "id")
    Mview.refreshJoinMor(spark, view, fact, dim, Seq("fk"), Seq("region"), ms)
    assert(stored === fullJoin)
    assert(!stored.exists(_._1 == "tiny"), "emptied group must leave the view")
    assert(spark.table(view).filter($"region" === "east")
      .select("n", "total").as[(Long, Double)].head() === ((3L, 61.0)))

    // epoch 2: BOTH sides move at once — a new id appears on both sides
    // (must count ONCE, the ΔA⋈ΔB corner under signs) AND the dim
    // renames fk 10 east→eastern via CDC (old fact rows must migrate
    // groups through A_old ⋈ ΔB's signed pair) while a new fact row
    // lands on the renamed key (counted once, under the NEW name,
    // through ΔA ⋈ B_new)
    Layout.upsertMor(spark, fact,
      Seq((6L, 40L, 6.0), (7L, 10L, 7.0)).toDF("id", "fk", "v"), "id")
    Layout.upsertMor(spark, dim,
      Seq((40L, "north"), (10L, "eastern")).toDF("fk", "region"), "fk")
    Mview.refreshJoinMor(spark, view, fact, dim, Seq("fk"), Seq("region"), ms)
    assert(stored === fullJoin)
    assert(!stored.exists(_._1 == "east"), "renamed group must migrate")
    assert(spark.table(view).filter($"region" === "eastern")
      .select("n", "total").as[(Long, Double)].head() === ((4L, 68.0)))

    // epoch 3: positional MOR delete empties 'west' on the fact side
    Layout.deleteWhereMor(spark, fact, col("fk") === 20L)
    Mview.refreshJoinMor(spark, view, fact, dim, Seq("fk"), Seq("region"), ms)
    assert(stored === fullJoin)
    assert(!stored.exists(_._1 == "west"))

    // epoch 4: nothing changed — no-op refresh stays correct
    Mview.refreshJoinMor(spark, view, fact, dim, Seq("fk"), Seq("region"), ms)
    assert(stored === fullJoin)

    // loud refusals: sketch measures and missing count(*) support
    assert(intercept[IllegalArgumentException] {
      Mview.refreshJoinMor(spark, view, fact, dim, Seq("fk"), Seq("region"),
        ms :+ Mview.Measure("approx_distinct", Some("id"), "du"))
    }.getMessage.contains("sketch"))
    assert(intercept[IllegalArgumentException] {
      Mview.refreshJoinMor(spark, view, fact, dim, Seq("fk"), Seq("region"),
        Seq(Mview.Measure("sum", Some("v"), "total")))
    }.getMessage.contains("support"))
  }

  test("refreshMor refuses sketch measures and missing count(*) support") {
    val (src, view) = ("mvmor_ref_src", "mvmor_ref_view")
    Seq(src, view).foreach(t => spark.sql(s"DROP TABLE IF EXISTS $t"))
    Seq((1L, "a", 1.0)).toDF("id", "k", "v").write.saveAsTable(src)
    Mview.create(spark, view, src, Seq("k"), measures)
    val sketch = measures :+ Mview.Measure("approx_distinct", Some("id"), "du")
    assert(intercept[IllegalArgumentException] {
      Mview.refreshMor(spark, view, src, Seq("k"), sketch)
    }.getMessage.contains("sketch"))
    val noSupport = Seq(Mview.Measure("sum", Some("v"), "total"))
    assert(intercept[IllegalArgumentException] {
      Mview.refreshMor(spark, view, src, Seq("k"), noSupport)
    }.getMessage.contains("support"))
  }
}
