package graft.tools

import org.apache.spark.sql.functions._

import graft.Tables
import graft.engine.{Lakehouse, Layout, Manifests}

/** One-off measurement for the round-18 SQL DML surfaces (not a gate):
  * what row-level DELETE/UPDATE and snapshot rollback actually cost as
  * the table grows a decade at a time — the 100 TB argument for
  * L28/L29 made with data, the [[CdcMergeProbe]] discipline applied to
  * this round's verbs.
  *
  * Per run (one dir), a ~0.1% predicate (`event_id % 1009 = 0`) and
  * five disciplines, each on a FRESH copy of the events table (the
  * statements mutate; min of `passes`):
  *
  *   1. SQL `DELETE FROM t WHERE ...` — copy-on-write: EXPECTED to
  *      grow with the table (the rewrite term; the price of a plane
  *      where plain SELECT is always correct).
  *   2. `Layout.deleteWhereMor` same predicate — merge-on-read:
  *      EXPECTED to grow only with the SCAN (find the doomed
  *      positions), never the rewrite: the commit is one small
  *      positional-delete file.
  *   3. SQL `UPDATE t SET ... WHERE ...` — same COW term as DELETE.
  *   4. `Layout.assignHead` — the pointer-swap half of rollback:
  *      EXPECTED O(1) at every size (one refs CAS, zero data I/O).
  *      This is the verb that still works at 100 TB.
  *   5. SQL `ALTER TABLE ... EXECUTE rollback_to_snapshot` — pointer
  *      swap + the content-restore commit: EXPECTED to grow with the
  *      RESTORED state (a COW copy), the measured price of keeping
  *      the raw-reader plane correct.
  *
  * `DmlProbe [dir] [passes]`. Emits one JSON line per measurement;
  * results recorded in BASELINE.md §Round 18. */
object DmlProbe {

  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val passes = args.lift(1).map(_.toInt).getOrElse(2)
    val spark = graft.GraftSession.local("graft-dmlprobe")
    spark.sparkContext.setLogLevel("ERROR")

    val ev = Tables.load(spark, dir, "events")
      .select(col("event_id"), col("event_type"), col("value"))
    val rows = ev.count()
    val run = java.util.UUID.randomUUID().toString.replace("-", "").take(8)

    def emit(probe: String, sec: Double): Unit =
      println(f"""{"probe":"$probe","dir":"$dir","rows":$rows,"sec":$sec%.3f}""")

    /** Min over passes of `body` on a fresh table copy each pass. */
    def onFresh(label: String)(body: String => Unit): Double =
      (1 to passes).map { i =>
        val t = s"dmlp_${label}_${run}_$i"
        ev.write.saveAsTable(t)
        val t0 = System.nanoTime()
        body(t)
        val sec = (System.nanoTime() - t0) / 1e9
        spark.sql(s"DROP TABLE $t")
        sec
      }.min

    emit("delete_cow_sql", onFresh("dc") { t =>
      Lakehouse.sql(spark,
        s"DELETE FROM $t WHERE event_id % 1009 = 0").collect()
    })
    emit("delete_mor", onFresh("dm") { t =>
      Layout.deleteWhereMor(spark, t, col("event_id") % 1009 === 0)
      ()
    })
    emit("update_cow_sql", onFresh("uc") { t =>
      Lakehouse.sql(spark,
        s"UPDATE $t SET value = value + 1 WHERE event_id % 1009 = 0").collect()
    })
    // rollback: base snapshot + one appended batch, then roll back.
    // The pointer swap and the full SQL verb are timed SEPARATELY so
    // the O(1) term and the restore term are both visible.
    val swapSecs = Seq.newBuilder[Double]
    val sqlSecs = Seq.newBuilder[Double]
    (1 to passes).foreach { i =>
      val t = s"dmlp_rb_${run}_$i"
      ev.write.saveAsTable(t)
      Layout.snapshot(spark, t, "base")
      spark.range(10000).select(
        (col("id") + 2000000000L).as("event_id"),
        lit("rb").as("event_type"),
        lit(1.0).as("value"))
        .write.mode("append").saveAsTable(t)
      Layout.snapshot(spark, t, "grown")
      val base = Manifests.loadRefs(Manifests.root(spark, t)).tags("base")
      val t0 = System.nanoTime()
      Layout.assignHead(spark, t, base)
      swapSecs += (System.nanoTime() - t0) / 1e9
      // restore head to grown so the SQL verb rolls back a real diff
      val grown = Manifests.loadRefs(Manifests.root(spark, t)).tags("grown")
      Layout.assignHead(spark, t, grown)
      val t1 = System.nanoTime()
      Lakehouse.sql(spark,
        s"ALTER TABLE $t EXECUTE rollback_to_snapshot($base)").collect()
      sqlSecs += (System.nanoTime() - t1) / 1e9
      spark.sql(s"DROP TABLE $t")
    }
    emit("rollback_pointer_swap", swapSecs.result().min)
    emit("rollback_sql_with_restore", sqlSecs.result().min)

    spark.stop()
  }
}
