package graft.engine

import org.apache.spark.sql.functions._

import graft.{SparkSpec, Tables}

/** Equality-delete upserts (Iceberg v2 / Flink CDC ingest model): one
  * commit = new data files + an equality-delete file; sequence-number
  * scoping decides which rows each delete can see. */
class UpsertMorSpec extends SparkSpec {

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

  test("upsert updates existing keys and inserts new ones, O(batch) commit") {
    import spark.implicits._
    val t = freshTable("ups_basic")
    val before = spark.table(t).count()
    val baseFiles = Manifests.listDataFiles(Layout.tableLocation(spark, t))
    val updates = Seq(
      (5L, "upserted", 1.5), (7L, "upserted", 2.5),        // existing keys
      (1000001L, "inserted", 3.5))                          // new key
      .toDF("event_id", "event_type", "value")
    Layout.upsertMor(spark, t, updates, "event_id")
    val cur = Layout.readCurrent(spark, t)
    assert(cur.count() === before + 1) // 2 replaced in place, 1 new
    assert(cur.filter(col("event_id") === 5L).collect()
      .map(r => (r.getAs[String]("event_type"), r.getAs[Double]("value")))
      .toSeq === Seq(("upserted", 1.5)))
    assert(cur.filter(col("event_id") === 1000001L).count() === 1)
    // untouched keys intact, base data files untouched on disk
    assert(cur.filter(col("event_id") === 9L)
      .select("event_type").collect() ===
      spark.table(t).filter(col("event_id") === 9L)
        .select("event_type").collect())
    // the managed→versioned conversion RENAMES the table dir (first
    // versioned touch), so compare file names + sizes: same bytes, no
    // rewrite
    assert(Manifests.listDataFiles(Layout.tableLocation(spark, t))
      .map { case (p, b) => (p.split('/').last, b) }
      === baseFiles.map { case (p, b) => (p.split('/').last, b) },
      "upsert must not touch the base table's files")
    val snap = headSnap(t)
    assert(snap.operation === "upsert-mor" && snap.eqDeleteEntries.nonEmpty)
  }

  test("successive upserts: the newest version wins") {
    import spark.implicits._
    val t = freshTable("ups_twice")
    Layout.upsertMor(spark, t,
      Seq((5L, "v1", 1.0)).toDF("event_id", "event_type", "value"), "event_id")
    Layout.upsertMor(spark, t,
      Seq((5L, "v2", 2.0)).toDF("event_id", "event_type", "value"), "event_id")
    val rows = Layout.readCurrent(spark, t)
      .filter(col("event_id") === 5L).collect()
    assert(rows.length === 1 && rows.head.getAs[String]("event_type") === "v2")
  }

  test("rows appended AFTER an upsert survive its equality delete") {
    import spark.implicits._
    val t = freshTable("ups_append")
    Layout.upsertMor(spark, t,
      Seq((5L, "upserted", 1.0)).toDF("event_id", "event_type", "value"),
      "event_id")
    // raw append behind the format: same key again, later in time
    Seq((5L, "appended", 9.0)).toDF("event_id", "event_type", "value")
      .write.mode("append").saveAsTable(t)
    val vals = Layout.readCurrent(spark, t)
      .filter(col("event_id") === 5L)
      .select("event_type").collect().map(_.getString(0)).sorted.toSeq
    // the upserted row AND the appended row: the append postdates the
    // delete (higher data sequence), so the delete cannot see it
    assert(vals === Seq("appended", "upserted"))
  }

  test("compact materializes equality deletes; raw and manifest reads converge") {
    import spark.implicits._
    val t = freshTable("ups_compact")
    val before = spark.table(t).count()
    Layout.upsertMor(spark, t,
      Seq((5L, "upserted", 1.0), (2000000L, "inserted", 2.0))
        .toDF("event_id", "event_type", "value"), "event_id")
    Layout.compact(spark, t, 2)
    val snap = headSnap(t)
    assert(snap.eqDeleteEntries.isEmpty && snap.deleteEntries.isEmpty)
    assert(spark.table(t).count() === before + 1)
    assert(spark.table(t).filter(col("event_id") === 5L)
      .collect().head.getAs[String]("event_type") === "upserted")
  }

  test("positional and equality deletes compose") {
    import spark.implicits._
    val t = freshTable("ups_mixed")
    val before = spark.table(t).count()
    Layout.upsertMor(spark, t,
      Seq((5L, "upserted", 1.0)).toDF("event_id", "event_type", "value"),
      "event_id")
    val n = Layout.deleteWhereMor(spark, t, col("event_type") === "upserted")
    assert(n === 1L, "positional delete must see the upserted row")
    val cur = Layout.readCurrent(spark, t)
    assert(cur.filter(col("event_id") === 5L).count() === 0)
    assert(cur.count() === before - 1)
  }

  test("multi-row-per-key batches are rejected loudly") {
    import spark.implicits._
    val t = freshTable("ups_dup")
    intercept[IllegalArgumentException] {
      Layout.upsertMor(spark, t,
        Seq((5L, "a", 1.0), (5L, "b", 2.0))
          .toDF("event_id", "event_type", "value"), "event_id")
    }
  }
}
