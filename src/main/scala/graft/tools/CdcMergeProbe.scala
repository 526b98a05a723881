package graft.tools

import org.apache.spark.sql.functions._

import graft.Tables
import graft.engine.{Lakehouse, Layout, Manifests}

/** One-off measurement for the round-17 SQL surfaces (not a gate): what
  * the commit-grain CDC feed and the two merge disciplines actually
  * cost as the table grows a decade at a time — the 100 TB argument for
  * L24/L26 made with data, like the pHash/video probes before it.
  *
  * Per run (one dir): a table of the events rows is committed, a small
  * fixed-size batch (default 10k: half updates of existing keys, half
  * new keys) arrives, and four things are timed (min of `passes`):
  *
  *   1. `changelog` over the append step — the SQL
  *      `TABLE(system.table_changes(...))` engine. EXPECTED flat across
  *      decades: each step reads only the files the commit added
  *      (manifest set-diffs are driver-side), never the table.
  *   2. a full-table key-matched diff (`changesBetween`) over the same
  *      window — the reconciliation alternative the feed replaces.
  *      EXPECTED to grow with the table: it shuffles both tagged reads.
  *   3. SQL `MERGE INTO` (copy-on-write) of the batch — EXPECTED to
  *      grow with the table: COW rewrites every unmatched row. This is
  *      the honest price of the every-reader-correct SQL plane.
  *   4. `Layout.upsertMor` of the same batch — EXPECTED flat: one
  *      commit of O(batch) new files + one equality-delete file. Plus
  *      the read tax it leaves: a manifest-aware `readCurrent` count
  *      (one broadcast anti join per outstanding delete family).
  *
  * `CdcMergeProbe [dir] [batch] [passes]`. Emits one JSON line per
  * measurement; results recorded in BASELINE.md §Round 17. */
object CdcMergeProbe {

  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val batch = args.lift(1).map(_.toInt).getOrElse(10000)
    val passes = args.lift(2).map(_.toInt).getOrElse(3)
    val spark = graft.GraftSession.local("graft-cdcmergeprobe")
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._

    def timeMin(f: () => Unit): Double = (1 to passes).map { _ =>
      val t0 = System.nanoTime()
      f()
      (System.nanoTime() - t0) / 1e9
    }.min

    val ev = Tables.load(spark, dir, "events")
      .select(col("event_id"), col("event_type"), col("value"))
    val rows = ev.count()
    val run = java.util.UUID.randomUUID().toString.replace("-", "").take(8)

    // ---- CDC: base commit + one appended batch ----------------------
    val tc = s"cdcprobe_$run"
    ev.write.saveAsTable(tc)
    Layout.snapshot(spark, tc, "p0")
    val maxId = ev.agg(max("event_id")).head().getLong(0)
    val appendBatch = spark.range(batch).select(
      (col("id") + maxId + 1).as("event_id"),
      concat(lit("new_"), (col("id") % 7).cast("string")).as("event_type"),
      (col("id") % 1000).cast("double").as("value"))
    appendBatch.write.mode("append").saveAsTable(tc)
    Layout.snapshot(spark, tc, "p1")
    val refs = Manifests.loadRefs(Manifests.root(spark, tc))
    val (s0, s1) = (refs.tags("p0"), refs.tags("p1"))
    val tFeed = timeMin(() => {
      Lakehouse.sql(spark,
        s"""SELECT _change_type, count(*) AS n, sum(event_id) AS s
           |FROM TABLE(system.table_changes('default', '$tc', $s0, $s1))
           |GROUP BY _change_type""".stripMargin)
        .write.format("noop").mode("overwrite").save()
    })
    println(f"""{"probe":"cdc_feed","dir":"$dir","rows":$rows,"batch":$batch,"sec":$tFeed%.3f}""")
    val tDiff = timeMin(() => {
      Layout.changesBetween(spark, tc, "p0", "p1", "event_id")
        .groupBy("_change_type").agg(count(lit(1)).as("n"))
        .write.format("noop").mode("overwrite").save()
    })
    println(f"""{"probe":"full_key_diff","dir":"$dir","rows":$rows,"batch":$batch,"sec":$tDiff%.3f}""")

    // ---- MERGE: COW SQL statement vs MOR upsert ---------------------
    // the update batch: half existing keys (values replaced), half new
    val updates = spark.range(batch).select(
      when(col("id") % 2 === 0, col("id") * 2) // existing even ids
        .otherwise(col("id") + maxId + batch + 1000000L).as("event_id"),
      lit("upd").as("event_type"),
      (col("id") % 777).cast("double").as("value"))
    val us = s"cdcsrc_$run"
    updates.write.saveAsTable(us)

    // COW: each pass merges into a FRESH copy (the rewrite is the cost)
    val tCow = (1 to passes).map { i =>
      val tt = s"cowtgt_${run}_$i"
      ev.write.saveAsTable(tt)
      val t0 = System.nanoTime()
      Lakehouse.sql(spark,
        s"""MERGE INTO $tt AS t USING $us AS s ON t.event_id = s.event_id
           |WHEN MATCHED THEN UPDATE SET event_type = s.event_type, value = s.value
           |WHEN NOT MATCHED THEN INSERT (event_id, event_type, value)
           |  VALUES (s.event_id, s.event_type, s.value)""".stripMargin)
        .collect()
      val sec = (System.nanoTime() - t0) / 1e9
      spark.sql(s"DROP TABLE $tt")
      sec
    }.min
    println(f"""{"probe":"merge_cow_sql","dir":"$dir","rows":$rows,"batch":$batch,"sec":$tCow%.3f}""")

    val tMor = (1 to passes).map { i =>
      val tt = s"mortgt_${run}_$i"
      ev.write.saveAsTable(tt)
      Layout.snapshot(spark, tt, "m0") // versioned base, like an ingest table
      val t0 = System.nanoTime()
      Layout.upsertMor(spark, tt, spark.table(us), "event_id")
      val sec = (System.nanoTime() - t0) / 1e9
      // the read tax MOR leaves behind: one manifest-aware count
      val tr0 = System.nanoTime()
      val n = Layout.readCurrent(spark, tt).count()
      val readSec = (System.nanoTime() - tr0) / 1e9
      if (i == passes)
        println(f"""{"probe":"mor_read_tax","dir":"$dir","rows":$n,"batch":$batch,"sec":$readSec%.3f}""")
      spark.sql(s"DROP TABLE $tt")
      sec
    }.min
    println(f"""{"probe":"upsert_mor","dir":"$dir","rows":$rows,"batch":$batch,"sec":$tMor%.3f}""")

    spark.stop()
  }
}
