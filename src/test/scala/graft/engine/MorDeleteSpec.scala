package graft.engine

import org.apache.spark.sql.functions._

import graft.{SparkSpec, Tables}

/** Merge-on-read positional deletes (Iceberg v2 shape): DELETE writes a
  * (file_path, pos) parquet, data files stay untouched, readers subtract
  * during the scan, copy-on-write verbs materialize. */
class MorDeleteSpec extends SparkSpec {

  private def freshTable(prefix: String): String = {
    val t = s"${prefix}_${java.util.UUID.randomUUID().toString.take(8)}"
    Tables.events(spark, sf0001)
      .select("event_id", "event_type", "value").repartition(4)
      .write.saveAsTable(t)
    t
  }

  private def headSnap(table: String): Manifests.Snapshot = {
    val root = Manifests.root(spark, table)
    Manifests.loadSnapshot(root, Manifests.loadRefs(root).head)
  }

  test("MOR delete: rows vanish from the manifest surface, data files untouched") {
    val t = freshTable("mor_basic")
    val before = spark.table(t).count()
    val clicks = spark.table(t).filter(col("event_type") === "click").count()
    val n = Layout.deleteWhereMor(spark, t, col("event_type") === "click")
    assert(n === clicks && n > 0)
    val snap = headSnap(t)
    assert(snap.operation === "delete-mor")
    assert(snap.deleteEntries.nonEmpty, "commit must carry delete files")
    // data files are the SAME paths as before — nothing rewritten
    assert(snap.files.map(_.path).toSet ===
      Manifests.listDataFiles(Layout.tableLocation(spark, t)).map(_._1).toSet)
    // manifest surface honors the delete...
    assert(Layout.readCurrent(spark, t).count() === before - n)
    assert(Layout.readCurrent(spark, t)
      .filter(col("event_type") === "click").count() === 0)
    // ...while the raw storage listing (behind the format's back) still
    // shows the rows — exactly Iceberg v2 semantics
    assert(spark.table(t).count() === before)
  }

  test("MOR deletes accumulate without double-deleting") {
    val t = freshTable("mor_accum")
    val before = spark.table(t).count()
    val n1 = Layout.deleteWhereMor(spark, t, col("event_id") < 100L)
    val n2 = Layout.deleteWhereMor(spark, t, col("event_id") < 200L)
    assert(n1 === 100 && n2 === 100, s"second delete must not re-delete ($n1, $n2)")
    assert(Layout.readCurrent(spark, t).count() === before - 200)
    // no-match delete: no commit, count unchanged
    val head = headSnap(t).seq
    assert(Layout.deleteWhereMor(spark, t, col("event_id") < 0L) === 0L)
    assert(headSnap(t).seq === head, "empty delete must not commit")
  }

  test("tags taken after a MOR delete inherit the outstanding deletes") {
    val t = freshTable("mor_tag")
    Layout.deleteWhereMor(spark, t, col("event_id") % 2 === 0)
    Layout.snapshot(spark, t, "after_del")
    val rows = Layout.readAt(spark, t, "after_del")
    assert(rows.filter(col("event_id") % 2 === 0).count() === 0)
    assert(rows.count() === Layout.readCurrent(spark, t).count())
  }

  test("copy-on-write verbs base on the deleted state: no resurrection") {
    val t = freshTable("mor_cow")
    val before = spark.table(t).count()
    val n = Layout.deleteWhereMor(spark, t, col("event_id") < 500L)
    // compact = CoW rewrite: must materialize the MOR deletes
    Layout.compact(spark, t, 2)
    assert(headSnap(t).deleteEntries.isEmpty, "compact materializes deletes")
    assert(spark.table(t).count() === before - n)
    assert(spark.table(t).filter(col("event_id") < 500L).count() === 0)
    assert(Layout.readCurrent(spark, t).count() === before - n)
  }

  test("expiry GC never reaps the head's outstanding delete files") {
    val t = freshTable("mor_gc")
    Layout.snapshot(spark, t, "v1")
    val before = spark.table(t).count()
    val n = Layout.deleteWhereMor(spark, t, col("event_id") < 300L)
    Layout.expireSnapshots(spark, t, keep = Set.empty) // drops v1, runs GC
    assert(Layout.readCurrent(spark, t).count() === before - n,
      "delete files must survive tag expiry while head references them")
  }

  test("readAsOf resolves the commit chain by timestamp") {
    val t = freshTable("mor_asof")
    Layout.snapshot(spark, t, "v1")
    val before = spark.table(t).count()
    Thread.sleep(5) // commit timestamps must be strictly ordered
    val betweenMs = System.currentTimeMillis()
    Thread.sleep(5)
    val n = Layout.deleteWhereMor(spark, t, col("event_id") < 400L)
    // as-of between the commits: pre-delete state
    assert(Layout.readAsOf(spark, t, betweenMs).count() === before)
    // as-of now: post-delete state, deletes applied
    assert(Layout.readAsOf(spark, t, System.currentTimeMillis()).count()
      === before - n)
    // before the first commit: loud failure, not an empty table
    intercept[IllegalArgumentException] {
      Layout.readAsOf(spark, t, 0L)
    }
  }

  test("pre-MOR manifests (no deletes field) deserialize with empty deletes") {
    import java.nio.file.{Files, Paths}
    val dir = Files.createTempDirectory("oldsnap")
    val json = """{"seq":0,"parent":-1,"operation":"snapshot","createdMs":1,
      |"basePath":"/x","schemaJson":"{}","files":[]}""".stripMargin.replace("\n", "")
    Files.write(dir.resolve("snap-000000.json"), json.getBytes)
    val snap = Manifests.loadSnapshot(dir, 0L)
    assert(snap.deleteEntries === Seq.empty)
  }
}
