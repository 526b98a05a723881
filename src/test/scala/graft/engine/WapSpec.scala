package graft.engine

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Write–Audit–Publish + snapshot CDC diff: a failing batch must never
  * remain visible; the changelog must name exactly what changed. */
class WapSpec extends SparkSpec {
  import spark.implicits._

  test("WAP publishes a clean batch, rolls back a dirty one") {
    val table = "wap_target"
    spark.sql(s"DROP TABLE IF EXISTS $table")
    Seq((1L, 10.0), (2L, 20.0)).toDF("id", "v").write.saveAsTable(table)
    val rules = Seq(Checks.NotNull("v"), Checks.UniqueKey("id"),
      Checks.InRange("v", 0.0, 100.0))

    // clean batch publishes
    val ok = Wap.writeAuditPublish(spark, table,
      Seq((3L, 30.0)).toDF("id", "v"), rules, tag = "wap1")
    assert(ok.published && ok.failedRules.isEmpty)
    assert(spark.table(table).count() === 3)

    // dirty batch (dup key + out-of-range) audits on the APPENDED state,
    // fails, and the table rolls back to exactly the pre-write rows
    val bad = Wap.writeAuditPublish(spark, table,
      Seq((3L, 999.0)).toDF("id", "v"), rules, tag = "wap2")
    assert(!bad.published)
    assert(bad.failedRules.toSet === Set("unique(id)", "range(v,0.0,100.0)"))
    assert(spark.table(table).as[(Long, Double)].collect().toSet ===
      Set((1L, 10.0), (2L, 20.0), (3L, 30.0)))
  }

  test("branched WAP: staged rows never touch main; dirty batch costs only a branch drop") {
    val table = "wap_br_target"
    spark.sql(s"DROP TABLE IF EXISTS $table")
    spark.sql(s"DROP TABLE IF EXISTS ${table}__branch_audit1")
    spark.sql(s"DROP TABLE IF EXISTS ${table}__branch_audit2")
    Seq((1L, 10.0), (2L, 20.0)).toDF("id", "v").write.saveAsTable(table)
    val rules = Seq(Checks.UniqueKey("id"), Checks.InRange("v", 0.0, 100.0))

    val ok = Wap.writeAuditPublishBranched(spark, table,
      Seq((3L, 30.0)).toDF("id", "v"), rules, branch = "audit1")
    assert(ok.published && spark.table(table).count() === 3)

    val bad = Wap.writeAuditPublishBranched(spark, table,
      Seq((3L, 999.0)).toDF("id", "v"), rules, branch = "audit2")
    assert(!bad.published)
    assert(bad.failedRules.toSet === Set("unique(id)", "range(v,0.0,100.0)"))
    // main was never touched — no append, no restore, and no leftover refs
    assert(spark.table(table).as[(Long, Double)].collect().toSet ===
      Set((1L, 10.0), (2L, 20.0), (3L, 30.0)))
    assert(!spark.catalog.tableExists(s"${table}__branch_audit2"))
    assert(Layout.listSnapshots(spark, table).isEmpty)
  }

  test("changesBetween emits insert/delete/update_postimage, nothing for unchanged keys") {
    val table = "cdc_target"
    spark.sql(s"DROP TABLE IF EXISTS $table")
    Seq((1L, "a"), (2L, "b"), (3L, "c")).toDF("id", "v").write.saveAsTable(table)
    Layout.snapshot(spark, table, "v1")
    // rewrite: update 2, delete 3, insert 4, keep 1 — through the format
    Layout.overwrite(spark, table,
      Seq((1L, "a"), (2L, "B!"), (4L, "d")).toDF("id", "v"))
    Layout.snapshot(spark, table, "v2")

    val changes = Layout.changesBetween(spark, table, "v1", "v2", "id")
      .as[(String, Long, String)].collect().toSet
    assert(changes === Set(
      ("update_postimage", 2L, "B!"),
      ("delete", 3L, "c"),
      ("insert", 4L, "d")))
  }
}
