package graft.engine

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.{SparkSpec, Tables}

/** Bloom sidecar: the driver-side probe hash must equal Spark's SQL
  * xxhash64 bit-for-bit (build/probe drift would cause WRONG skips, not
  * just missed ones), membership must hold for every inserted key, and
  * the end-to-end point lookup must skip files that bounds cannot. */
class BloomsSpec extends SparkSpec {

  test("probeHash equals SQL xxhash64 for long, int, string, date") {
    import spark.implicits._
    val longs = Seq(0L, 1L, -1L, 42L, Long.MaxValue, Long.MinValue)
    val gotL = spark.createDataset(longs).toDF("v")
      .select(xxhash64(col("v"))).collect().map(_.getLong(0)).toSeq
    assert(gotL === longs.map(v => Blooms.probeHash(v, LongType).get))

    val strs = Seq("", "a", "click", "ünïcode-η", "x" * 100)
    val gotS = spark.createDataset(strs).toDF("v")
      .select(xxhash64(col("v"))).collect().map(_.getLong(0)).toSeq
    assert(gotS === strs.map(v => Blooms.probeHash(v, StringType).get))

    val ints = Seq(0, 7, -3, Int.MaxValue)
    val gotI = spark.createDataset(ints).toDF("v")
      .select(xxhash64(col("v"))).collect().map(_.getLong(0)).toSeq
    assert(gotI === ints.map(v => Blooms.probeHash(v, IntegerType).get))

    val dates = Seq("2024-01-01", "1969-12-31").map(java.sql.Date.valueOf)
    val gotD = spark.createDataset(dates.map(_.toString)).toDF("v")
      .select(xxhash64(col("v").cast(DateType))).collect().map(_.getLong(0)).toSeq
    assert(gotD === dates.map(v => Blooms.probeHash(v, DateType).get))

    // Int literal probed against a LongType column hashes as long
    assert(Blooms.probeHash(7, LongType) === Blooms.probeHash(7L, LongType))
    // fail-open for unsupported combos
    assert(Blooms.probeHash(1.5, DoubleType).isEmpty)
  }

  test("built sidecar: no false negatives, low false-positive rate") {
    val run = java.util.UUID.randomUUID().toString.take(8)
    val table = s"bloom_fn_$run"
    Tables.events(spark, sf0001)
      .select("event_id", "event_type", "value").repartition(4)
      .write.saveAsTable(table)
    Layout.snapshot(spark, table, "v1", bloomCols = Seq("event_id"))
    val root = Manifests.root(spark, table)
    val snap = Manifests.loadSnapshot(root, Manifests.loadRefs(root).tags("v1"))
    val sc = Manifests.loadBlooms(root, snap.seq).get

    // ground truth: which ids live in which file
    val truth = spark.read.parquet(snap.files.map(_.path): _*)
      .select(col("_metadata.file_path").as("f"), col("event_id"))
      .collect()
      .map(r => (new java.net.URI(r.getString(0)).getPath, r.getLong(1)))
    // sidecar keys must be in manifest (plain-path) form
    assert(truth.map(_._1).toSet === snap.files.map(_.path).toSet)
    // no false negatives: every (file, id) present must pass
    truth.foreach { case (f, id) =>
      assert(Blooms.fileMayContain(sc, f, "event_id", LongType, id),
        s"false negative for id=$id in $f")
    }
    // false positives bounded: absent ids should mostly miss
    val present = truth.map(_._2).toSet
    val absent = (1000000L until 1001000L).filterNot(present)
    val fps = snap.files.map { fe =>
      absent.count(id =>
        Blooms.fileMayContain(sc, fe.path, "event_id", LongType, id))
    }.sum
    val rate = fps.toDouble / (absent.size * snap.files.size)
    assert(rate < 0.05, s"false-positive rate $rate too high")
  }

  test("point lookup: blooms skip files that bounds cannot") {
    val run = java.util.UUID.randomUUID().toString.take(8)
    val table = s"bloom_pt_$run"
    // round-robin layout: every file spans the full event_id range, so
    // BOUNDS keep everything; an event_id lives in exactly one file, so
    // BLOOMS must cut the file set down
    Tables.events(spark, sf0001)
      .select("event_id", "event_type", "value").repartition(8)
      .write.saveAsTable(table)
    Layout.snapshot(spark, table, "v1", bloomCols = Seq("event_id"))
    val probe = 123L
    val preds = Seq(Pruning.Eq("event_id", probe))
    val (total, kept) = Layout.scanAtFileCounts(spark, table, "v1", preds)
    assert(total === 8)
    assert(kept < total, s"bloom must skip files ($kept/$total kept)")
    val rows = Layout.scanAt(spark, table, "v1", preds).collect()
    assert(rows.length === 1 && rows.head.getAs[Long]("event_id") === probe)

    // without blooms the same layout cannot skip anything
    val table2 = s"bloom_nb_$run"
    Tables.events(spark, sf0001)
      .select("event_id", "event_type", "value").repartition(8)
      .write.saveAsTable(table2)
    Layout.snapshot(spark, table2, "v1")
    val (t2, k2) = Layout.scanAtFileCounts(spark, table2, "v1", preds)
    assert(t2 === 8 && k2 === 8, "bounds alone keep every round-robin file")
  }

  test("In predicate unions bloom probes; other types fail open") {
    val run = java.util.UUID.randomUUID().toString.take(8)
    val table = s"bloom_in_$run"
    Tables.events(spark, sf0001)
      .select("event_id", "event_type").repartition(8)
      .write.saveAsTable(table)
    Layout.snapshot(spark, table, "v1",
      bloomCols = Seq("event_id", "event_type"))
    val preds = Seq(Pruning.In("event_id", Seq(5L, 700L)))
    val (total, kept) = Layout.scanAtFileCounts(spark, table, "v1", preds)
    assert(kept < total, "In-probe should keep only files holding 5 or 700")
    assert(Layout.scanAt(spark, table, "v1", preds).count() === 2)
    // string bloom column works too
    val sPreds = Seq(Pruning.Eq("event_type", "view"),
      Pruning.Eq("event_id", 123L))
    val got = Layout.scanAt(spark, table, "v1", sPreds).count()
    val want = Layout.readAt(spark, table, "v1")
      .filter(col("event_type") === "view" && col("event_id") === 123L).count()
    assert(got === want)
  }
}
