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

  private def withIo[A](io: graft.engine.FileIO)(body: => A): A = {
    val prev = graft.engine.Manifests.io
    graft.engine.Manifests.io = io
    try body finally graft.engine.Manifests.io = prev
  }

  // The tag/branch lifecycles run over BOTH storage backends: the local
  // lock-file FileIO and the etag-CAS object store — the commit protocol
  // must not quietly depend on POSIX atomic rename.
  private val ioImpls: Seq[(String, () => graft.engine.FileIO)] = Seq(
    ("local", () => graft.engine.LocalFileIO),
    ("objectstore", () => new graft.engine.ObjectStoreFileIO()))

  for ((ioName, mkIo) <- ioImpls)
  test(s"snapshot tags survive a table overwrite (Nessie ref=main emulation) [$ioName]") {
    withIo(mkIo()) {
      val tbl = s"layout_snap_nation_$ioName"
      val nation = Tables.nation(spark, sf0001).select("n_nationkey", "n_name")
      nation.write.mode("overwrite").saveAsTable(tbl)
      val before = spark.table(tbl).collect()
        .map(r => (r.getInt(0), r.getString(1))).sorted.toSeq

      Layout.snapshot(spark, tbl, "v1")
      assert(Layout.listSnapshots(spark, tbl) === Seq("v1"))
      // tags are immutable: re-tagging the same name must fail
      intercept[IllegalArgumentException](
        Layout.snapshot(spark, tbl, "v1"))

      // overwrite with DIFFERENT data through the format's commit path
      // (a raw directory overwrite bypasses any table format — Iceberg
      // included — so destructive writes go through Layout.overwrite)
      Layout.overwrite(spark, tbl,
        nation.filter(col("n_nationkey") < 5))
      assert(spark.table(tbl).count() === 5)

      // the tag still reads the full pre-overwrite rows
      val atTag = Layout.readAt(spark, tbl, "v1").collect()
        .map(r => (r.getInt(0), r.getString(1))).sorted.toSeq
      assert(atTag === before)
      assert(before.size === 25)
    }
  }

  test("expireSnapshots deletes only unkept tags; kept tags and live data survive") {
    val nation = Tables.nation(spark, sf0001).select("n_nationkey", "n_name")
    nation.write.mode("overwrite").saveAsTable("layout_exp_nation")
    Layout.snapshot(spark, "layout_exp_nation", "old1")
    Layout.snapshot(spark, "layout_exp_nation", "old2")
    Layout.snapshot(spark, "layout_exp_nation", "keeper")
    // overwrite so the tags are the only reference to the original files
    Layout.overwrite(spark, "layout_exp_nation",
      nation.filter(col("n_nationkey") < 3))
    val keeperFiles = Layout.readAt(spark, "layout_exp_nation", "keeper")
      .inputFiles.toSet

    val expired = Layout.expireSnapshots(spark, "layout_exp_nation", Set("keeper"))
    assert(expired.sorted === Seq("old1", "old2"))
    assert(Layout.listSnapshots(spark, "layout_exp_nation") === Seq("keeper"))
    // the kept tag still reads the full pre-overwrite rows; expired don't
    assert(Layout.readAt(spark, "layout_exp_nation", "keeper").count() === 25)
    intercept[IllegalArgumentException](
      Layout.readAt(spark, "layout_exp_nation", "old1"))
    assert(spark.table("layout_exp_nation").count() === 3)
    // GC kept every byte the kept tag references (all three tags shared
    // the same immutable files, so nothing was reclaimable here)
    assert(keeperFiles.forall(f =>
      java.nio.file.Files.exists(java.nio.file.Paths.get(
        f.stripPrefix("file:")))))
  }

  for ((ioName, mkIo) <- ioImpls)
  test(s"branches isolate writes; merge fast-forwards when main is unmoved, refuses otherwise [$ioName]") {
    withIo(mkIo()) {
      import spark.implicits._
      val tbl = s"layout_br_$ioName"
      spark.sql(s"DROP TABLE IF EXISTS $tbl")
      spark.sql(s"DROP TABLE IF EXISTS ${tbl}__branch_etl")
      Seq((1L, "a"), (2L, "b")).toDF("id", "v").write.saveAsTable(tbl)

      // fork, write on the branch: main must not see it
      val bt = Layout.createBranch(spark, tbl, "etl")
      Seq((3L, "c")).toDF("id", "v").write.mode("append").saveAsTable(bt)
      assert(spark.table(tbl).count() === 2)
      assert(spark.table(bt).count() === 3)
      intercept[IllegalArgumentException](
        Layout.createBranch(spark, tbl, "etl")) // duplicate branch

      // fast-forward merge publishes the branch and cleans refs
      Layout.mergeBranch(spark, tbl, "etl")
      assert(spark.table(tbl).as[(Long, String)].collect().toSet ===
        Set((1L, "a"), (2L, "b"), (3L, "c")))
      assert(!spark.catalog.tableExists(bt))
      assert(Layout.listSnapshots(spark, tbl).isEmpty)

      // concurrent change on main since the fork → merge refuses, refs intact
      val bt2 = Layout.createBranch(spark, tbl, "etl2")
      Seq((4L, "d")).toDF("id", "v").write.mode("append").saveAsTable(bt2)
      Seq((9L, "z")).toDF("id", "v").write.mode("append").saveAsTable(tbl)
      val ex = intercept[IllegalStateException](
        Layout.mergeBranch(spark, tbl, "etl2"))
      assert(ex.getMessage.contains("conflict"))
      assert(spark.catalog.tableExists(bt2)) // branch survives for a rebase
      assert(spark.table(tbl).count() === 4) // main keeps its own write
      Layout.dropBranch(spark, tbl, "etl2")
      assert(!spark.catalog.tableExists(bt2))
    }
  }

  test("scdMerge closes current versions and chains multi-change batches correctly") {
    import spark.implicits._
    def ts(s: String) = java.sql.Timestamp.valueOf(s)
    spark.sql("DROP TABLE IF EXISTS layout_scd")
    // dim: u1 current 'bronze' since Jan 1; u2 current 'silver'; u1 has
    // one closed historical row that must never be touched
    Seq(
      (1L, "trial", ts("2025-12-01 00:00:00"), Option(ts("2026-01-01 00:00:00"))),
      (1L, "bronze", ts("2026-01-01 00:00:00"), None: Option[java.sql.Timestamp]),
      (2L, "silver", ts("2026-01-01 00:00:00"), None: Option[java.sql.Timestamp]))
      .toDF("user_id", "tier", "valid_from", "valid_to")
      .write.saveAsTable("layout_scd")

    // one batch: u1 changes TWICE (gold then platinum), u3 appears new
    val updates = Seq(
      (1L, "gold", ts("2026-02-01 00:00:00")),
      (1L, "platinum", ts("2026-03-01 00:00:00")),
      (3L, "bronze", ts("2026-02-15 00:00:00")))
      .toDF("user_id", "tier", "ts")
    Layout.scdMerge(spark, "layout_scd", updates, "user_id", "ts")

    val rows = spark.table("layout_scd")
      .as[(Long, String, java.sql.Timestamp, Option[java.sql.Timestamp])]
      .collect().toSet
    assert(rows === Set(
      (1L, "trial", ts("2025-12-01 00:00:00"), Some(ts("2026-01-01 00:00:00"))),
      (1L, "bronze", ts("2026-01-01 00:00:00"), Some(ts("2026-02-01 00:00:00"))),
      (1L, "gold", ts("2026-02-01 00:00:00"), Some(ts("2026-03-01 00:00:00"))),
      (1L, "platinum", ts("2026-03-01 00:00:00"), None),
      (2L, "silver", ts("2026-01-01 00:00:00"), None),
      (3L, "bronze", ts("2026-02-15 00:00:00"), None)))
    // schema mismatch in updates is refused
    intercept[IllegalArgumentException](
      Layout.scdMerge(spark, "layout_scd",
        Seq((1L, ts("2026-04-01 00:00:00"))).toDF("user_id", "ts"),
        "user_id", "ts"))
  }

  test("deleteWhere/updateWhere rewrite only targeted rows and respect NULL predicates") {
    import spark.implicits._
    spark.sql("DROP TABLE IF EXISTS layout_dml")
    Seq((1L, Some(10.0), "a"), (2L, None, "b"), (3L, Some(30.0), "c"))
      .toDF("id", "v", "s").write.saveAsTable("layout_dml")
    Layout.snapshot(spark, "layout_dml", "pre_dml")

    // NULL predicate (v > 20 over a null v) must KEEP row 2
    val deleted = Layout.deleteWhere(spark, "layout_dml", col("v") > 20)
    assert(deleted === 1)
    assert(spark.table("layout_dml").select("id").as[Long].collect().sorted
      === Array(1L, 2L))

    val updated = Layout.updateWhere(spark, "layout_dml", col("v") > 5,
      Map("s" -> concat(col("s"), lit("!")), "v" -> (col("v") * 2)))
    assert(updated === 1)
    assert(spark.table("layout_dml").orderBy("id")
      .as[(Long, Option[Double], String)].collect().toSeq ===
      Seq((1L, Some(20.0), "a!"), (2L, None, "b")))

    // unknown column refused; zero-hit predicates are no-op rewrites
    intercept[IllegalArgumentException](
      Layout.updateWhere(spark, "layout_dml", lit(true), Map("nope" -> lit(1))))
    assert(Layout.deleteWhere(spark, "layout_dml", col("id") > 99) === 0)

    // the pre-DML tag still reads the original 3 rows (erasure-with-audit)
    assert(Layout.readAt(spark, "layout_dml", "pre_dml").count() === 3)
  }

  test("restore rolls the table back to a tag; compact shrinks the file count") {
    val nation = Tables.nation(spark, sf0001).select("n_nationkey", "n_name")
    nation.write.mode("overwrite").saveAsTable("layout_restore_t")
    Layout.snapshot(spark, "layout_restore_t", "pre")
    Layout.overwrite(spark, "layout_restore_t",
      nation.filter(col("n_nationkey") < 3))
    assert(spark.table("layout_restore_t").count() === 3)

    Layout.restore(spark, "layout_restore_t", "pre")
    assert(spark.table("layout_restore_t").count() === 25)
    // the tag survives the restore (manifest + files are immutable)
    assert(Layout.listSnapshots(spark, "layout_restore_t") === Seq("pre"))

    // fragment into many files, then compact to 1
    spark.table("layout_restore_t").repartition(8)
      .write.mode("overwrite").saveAsTable("layout_compact_t")
    def files(t: String) =
      spark.table(t).inputFiles.count(_.endsWith(".parquet"))
    assert(files("layout_compact_t") === 8)
    Layout.compact(spark, "layout_compact_t", 1)
    assert(files("layout_compact_t") === 1)
    assert(spark.table("layout_compact_t").count() === 25)

    // size-targeted compaction derives the count from table stats:
    // target = half the stats size → 2 files
    spark.table("layout_compact_t").repartition(8)
      .write.mode("overwrite").saveAsTable("layout_compact_s")
    val statBytes = spark.table("layout_compact_s")
      .queryExecution.optimizedPlan.stats.sizeInBytes
    val chosen = Layout.compactToFileSize(spark, "layout_compact_s",
      (statBytes / 2 + 1).toLong)
    assert(chosen === 2 && files("layout_compact_s") === 2)
    assert(spark.table("layout_compact_s").count() === 25)
  }

  test("merge upserts matched keys, appends new ones, keeps the rest, and composes with snapshots") {
    import spark.implicits._
    val nation = Tables.nation(spark, sf0001).select("n_nationkey", "n_name")
    nation.write.mode("overwrite").saveAsTable("layout_merge_t")
    Layout.snapshot(spark, "layout_merge_t", "premerge")

    val updates = Seq(
      (0, "RENAMED-0"),   // update an existing key
      (1, "RENAMED-1-A"), // repeated update key: higher tiebreak (name) ...
      (1, "RENAMED-1-B"), // ... wins, deterministic
      (99, "NEWLAND")     // brand-new key
    ).toDF("n_nationkey", "n_name")
    Layout.merge(spark, "layout_merge_t", updates, "n_nationkey", "n_name")

    val after = spark.table("layout_merge_t")
      .collect().map(r => r.getInt(0) -> r.getString(1)).toMap
    assert(after.size === 26)                  // 25 original + 1 new key
    assert(after(0) === "RENAMED-0")
    assert(after(1) === "RENAMED-1-B")        // max tiebreak won
    assert(after(99) === "NEWLAND")
    assert(after(2) === nation.filter(col("n_nationkey") === 2)
      .head().getString(1))                    // untouched key survives

    // the pre-merge tag still reads the old contents
    val tagged = Layout.readAt(spark, "layout_merge_t", "premerge")
      .collect().map(r => r.getInt(0) -> r.getString(1)).toMap
    assert(tagged.size === 25 && !tagged.contains(99))
    assert(tagged(0) !== "RENAMED-0")
  }

  test("appendEvolved adds columns by name, old rows read null, old writers keep working") {
    import spark.implicits._
    spark.sql("DROP TABLE IF EXISTS layout_evolve_t")
    Seq((1L, "a"), (2L, "b")).toDF("id", "v").write.saveAsTable("layout_evolve_t")
    // evolved writer: adds a score column (and comes in a different column order)
    Layout.appendEvolved(spark, "layout_evolve_t",
      Seq((0.5, 3L, "c")).toDF("score", "id", "v"))
    // stale writer: still the old 2-column schema
    Layout.appendEvolved(spark, "layout_evolve_t", Seq((4L, "d")).toDF("id", "v"))
    val rows = spark.table("layout_evolve_t")
      .select("id", "v", "score")
      .collect().map(r => (r.getLong(0), r.getString(1),
        if (r.isNullAt(2)) None else Some(r.getDouble(2)))).toSet
    assert(rows === Set(
      (1L, "a", None), (2L, "b", None),          // pre-evolution rows: null score
      (3L, "c", Some(0.5)),                       // evolved row, name-resolved
      (4L, "d", None)))                           // stale-writer row
    // a retype is refused, not silently coerced
    val err = intercept[IllegalArgumentException] {
      Layout.appendEvolved(spark, "layout_evolve_t",
        Seq(("5", "e")).toDF("id", "v"))
    }
    assert(err.getMessage.contains("retype"))
    spark.sql("DROP TABLE layout_evolve_t")
  }

  test("readBetween returns only rows appended between two tags (incremental scan)") {
    import spark.implicits._
    spark.sql("DROP TABLE IF EXISTS layout_incr_t")
    Seq((1L, "a"), (2L, "b")).toDF("id", "v").write.saveAsTable("layout_incr_t")
    Layout.snapshot(spark, "layout_incr_t", "v1")
    Seq((3L, "c"), (4L, "d")).toDF("id", "v")
      .write.mode("append").saveAsTable("layout_incr_t")
    Layout.snapshot(spark, "layout_incr_t", "v2")
    val delta = Layout.readBetween(spark, "layout_incr_t", "v1", "v2")
      .as[(Long, String)].collect().toSet
    assert(delta === Set((3L, "c"), (4L, "d")), "only the appended rows")
    // same tag twice = empty delta with the table's schema
    val none = Layout.readBetween(spark, "layout_incr_t", "v2", "v2")
    assert(none.count() === 0L && none.columns.toSeq === Seq("id", "v"))
    // appends after v2 are invisible to the (v1, v2] window
    Seq((5L, "e")).toDF("id", "v").write.mode("append").saveAsTable("layout_incr_t")
    assert(Layout.readBetween(spark, "layout_incr_t", "v1", "v2")
      .as[(Long, String)].collect().toSet === delta)
    // schema evolution between tags: the delta keeps the evolved column
    // (toTag's merged schema, not a single old footer's)
    Layout.snapshot(spark, "layout_incr_t", "v3")
    Layout.appendEvolved(spark, "layout_incr_t",
      Seq((0.7, 6L, "f")).toDF("score", "id", "v"))
    Layout.snapshot(spark, "layout_incr_t", "v4")
    val evolved = Layout.readBetween(spark, "layout_incr_t", "v3", "v4")
    assert(evolved.columns.contains("score"), evolved.columns.mkString(","))
    assert(evolved.select("id", "score").as[(Long, Double)].collect().toSet
      === Set((6L, 0.7)))
    spark.sql("DROP TABLE layout_incr_t")
  }

  test("snapshot of a day-partitioned table preserves partition structure") {
    val events = Tables.events(spark, sf0001)
    Layout.writePartitionedByDay(events, "ts", "layout_snap_events")
    val total = spark.table("layout_snap_events").count()
    Layout.snapshot(spark, "layout_snap_events", "tag1")
    spark.sql("DROP TABLE layout_snap_events") // even a drop can't lose the tag
    // manifest-resolved read: no live catalog entry, no directory listing
    val snapDf = Layout.readAt(spark, "layout_snap_events", "tag1")
    assert(snapDf.count() === total && total > 0)
    assert(snapDf.columns.contains("p_day"), "partition column must survive the tag")
  }

  test("zorder preserves rows and shrinks per-file min-max ranges on BOTH columns") {
    import spark.implicits._
    val line = Tables.lineitem(spark, sf0001)
      .select("l_orderkey", "l_partkey", "l_quantity")
    // baseline: round-robin layout (what streaming/parallel ingest leaves)
    line.repartition(8).write.mode("overwrite").saveAsTable("layout_zorder_t")
    val before = spark.table("layout_zorder_t").count()
    val checksumBefore = spark.table("layout_zorder_t")
      .agg(expr("bit_xor(xxhash64(l_orderkey, l_partkey, l_quantity))"))
      .as[Long].head()

    // the data-skipping metric, measured directly: for a grid of point
    // probes over a column's global range, how many files' [min,max]
    // bounds contain the probe (= files a bounds-pruning scan must read)?
    // Round-robin layout: every file spans ~the full range → every probe
    // hits every file. A LINEAR sort fixes one column and leaves the
    // other at ~100%. Z-order bounds BOTH columns — the property pinned
    // here as an absolute budget: with 16 files, 4 z-bits are fixed per
    // file — two per column — so each column's per-file extent is ~1/4 of
    // its range (plus sampled-boundary overlap), while round-robin sits
    // at ~100% and a linear sort leaves the trailing column at ~100%.
    def fileBounds(c: String): Seq[(Long, Long)] =
      spark.table("layout_zorder_t")
        .groupBy(input_file_name())
        .agg(min(col(c)).cast("long").as("lo"), max(col(c)).cast("long").as("hi"))
        .collect().map(r => (r.getLong(1), r.getLong(2))).toSeq
    def avgProbeHitFrac(c: String): Double = {
      val bounds = fileBounds(c)
      val glo = bounds.map(_._1).min
      val ghi = bounds.map(_._2).max
      val probes = (0 until 64).map(i => glo + (ghi - glo) * i / 63)
      probes.map(p => bounds.count { case (a, b) => a <= p && p <= b })
        .sum.toDouble / (probes.size * bounds.size)
    }

    val rawOrd = avgProbeHitFrac("l_orderkey")
    val rawPart = avgProbeHitFrac("l_partkey")
    assert(rawOrd > 0.9 && rawPart > 0.9,
      s"round-robin baseline should be unprunable: $rawOrd / $rawPart")

    Layout.zorder(spark, "layout_zorder_t", Seq("l_orderkey", "l_partkey"), numFiles = 16)

    assert(spark.table("layout_zorder_t").count() === before)
    val checksumAfter = spark.table("layout_zorder_t")
      .agg(expr("bit_xor(xxhash64(l_orderkey, l_partkey, l_quantity))"))
      .as[Long].head()
    assert(checksumAfter === checksumBefore, "zorder must not change row contents")
    assert(spark.table("layout_zorder_t").inputFiles
      .count(_.endsWith(".parquet")) === 16, "zorder must keep the file budget")

    val zOrd = avgProbeHitFrac("l_orderkey")
    val zPart = avgProbeHitFrac("l_partkey")
    assert(zOrd <= 0.5,
      s"a point probe on l_orderkey should touch ≤50% of files: $zOrd")
    assert(zPart <= 0.5,
      s"a point probe on l_partkey should touch ≤50% of files too (the " +
        s"z-order property a linear sort lacks): $zPart")
  }

  test("createBranchAt forks from a historical tag; stale merges refuse") {
    import spark.implicits._
    val t = s"layout_brat_${java.util.UUID.randomUUID().toString.take(8)}"
    (0L until 100L).map(k => (k, s"v$k")).toDF("k", "payload")
      .write.saveAsTable(t)
    Layout.snapshot(spark, t, "v1")
    // main moves past the tag
    Layout.deleteWhere(spark, t, col("k") >= 50L)
    assert(spark.table(t).count() === 50)
    // fork AT the old tag: the branch sees the pinned historical state
    val bt = Layout.createBranchAt(spark, t, "repair", "v1")
    assert(spark.table(bt).count() === 100)
    // refs surface lists the branch
    assert(Layout.listRefs(spark, t)
      .filter(col("ref_name") === "repair").count() === 1)
    // main moved since the fork state → non-fast-forward merge refuses
    intercept[IllegalStateException] {
      Layout.mergeBranch(spark, t, "repair")
    }
    Layout.dropBranch(spark, t, "repair")

    // fork at a tag while main still SITS at that tag's files: writes on
    // the branch fast-forward into main
    val t2 = s"layout_brat2_${java.util.UUID.randomUUID().toString.take(8)}"
    (0L until 40L).map(k => (k, s"v$k")).toDF("k", "payload")
      .write.saveAsTable(t2)
    Layout.snapshot(spark, t2, "pin")
    val bt2 = Layout.createBranchAt(spark, t2, "repair2", "pin")
    Seq((1000L, "branched")).toDF("k", "payload")
      .write.mode("append").saveAsTable(bt2)
    Layout.mergeBranch(spark, t2, "repair2")
    assert(spark.table(t2).count() === 41)
  }
}
