package graft.engine

import graft.SparkSpec

/** L24/L25 — SQL-surface maintenance + CDC: `ALTER TABLE ... EXECUTE
  * expire_snapshots/optimize` and `TABLE(system.table_changes(...))`
  * land on the Layout machinery from pure SQL text. */
class TableFunctionsSpec extends SparkSpec {
  import spark.implicits._

  private def freshName(p: String) =
    p + java.util.UUID.randomUUID().toString.replace("-", "").take(8)

  private def seqOfTag(t: String, tag: String): Long =
    Manifests.loadRefs(Manifests.root(spark, t)).tags(tag)

  test("expire_snapshots through SQL: pinned tags survive, untagged old seqs refuse on read") {
    val t = freshName("tf_exp_")
    Seq((1L, "a")).toDF("id", "v").write.saveAsTable(t)
    Layout.snapshot(spark, t, "keep1") // seq pinned by a tag
    Seq((2L, "b")).toDF("id", "v").write.mode("append").saveAsTable(t)
    Layout.snapshot(spark, t, "drop_me")
    val victimSeq = seqOfTag(t, "drop_me")
    // untag the middle snapshot so retention can claim it, then move on
    Layout.expireSnapshots(spark, t, keep = Set("keep1"))
    Seq((3L, "c")).toDF("id", "v").write.mode("append").saveAsTable(t)
    Layout.snapshot(spark, t, "head_tag")
    Thread.sleep(30) // all commits strictly older than "now"
    val expired = Lakehouse.sql(spark,
      s"ALTER TABLE $t EXECUTE expire_snapshots(retention_threshold => '0s')")
      .as[Long].collect().toSeq
    assert(expired.contains(victimSeq),
      "the untagged old snapshot must expire")
    // the RETENTION CONTRACT: tag-pinned seqs and the head never expire
    val keptSeq = seqOfTag(t, "keep1")
    assert(!expired.contains(keptSeq))
    val pinned = Lakehouse.sql(spark,
      s"SELECT id FROM $t FOR VERSION AS OF 'keep1' ORDER BY id")
      .as[Long].collect().toSeq
    assert(pinned === Seq(1L), "pinned tag still reads after expiry")
    // an expired seq refuses LOUDLY at resolution with the expiry story
    val e = intercept[Exception] {
      Lakehouse.sql(spark, s"SELECT * FROM $t FOR VERSION AS OF $victimSeq")
        .collect()
    }
    assert(e.getMessage.contains("expire_snapshots"),
      s"wanted the expiry refusal, got: ${e.getMessage}")
    // live reads unaffected
    assert(Lakehouse.sql(spark, s"SELECT count(*) FROM $t")
      .collect().head.getLong(0) === 3L)
  }

  test("optimize through SQL compacts to the size-derived file count") {
    val t = freshName("tf_opt_")
    Seq.tabulate(64)(i => (i.toLong, s"v$i")).toDF("id", "v")
      .repartition(16).write.saveAsTable(t)
    val before = Layout.readCurrent(spark, t).inputFiles.length
    assert(before >= 8, s"fixture wants many small files, got $before")
    val files = Lakehouse.sql(spark,
      s"ALTER TABLE $t EXECUTE optimize(file_size_threshold => '1GB')")
      .collect().head.getInt(0)
    assert(files === 1)
    assert(Layout.readCurrent(spark, t).inputFiles.length === 1)
    assert(Lakehouse.sql(spark, s"SELECT count(*) FROM $t")
      .collect().head.getLong(0) === 64L)
  }

  test("unknown procedures and bad literals refuse loudly") {
    val e = intercept[IllegalArgumentException] {
      Lakehouse.sql(spark, "ALTER TABLE t EXECUTE vacuum('7d')")
    }
    assert(e.getMessage.contains("not supported"))
    // an ALTER whose COLUMN is named execute is plain DDL, not a
    // procedure call — it must pass through to Spark untouched
    val t2 = freshName("tf_ddl_")
    Seq((1L, "a")).toDF("id", "v").write.saveAsTable(t2)
    Lakehouse.sql(spark, s"ALTER TABLE $t2 ADD COLUMNS (execute INT)")
    assert(spark.table(t2).columns.contains("execute"))
    // the wire's requoted backticked table spelling parses
    Seq.tabulate(8)(i => (i.toLong, s"x$i")).toDF("id", "v")
      .repartition(4).write.saveAsTable(s"${t2}_bt")
    val files = Lakehouse.sql(spark,
      s"ALTER TABLE `${t2}_bt` EXECUTE optimize(file_size_threshold => '1GB')")
      .collect().head.getInt(0)
    assert(files === 1)
    assert(TableFunctions.parseDuration("7d") === 7L * 86400000)
    assert(TableFunctions.parseDuration("90m") === 90L * 60000)
    intercept[IllegalArgumentException](TableFunctions.parseDuration("7 fortnights"))
    assert(TableFunctions.parseSize("100MB") === 100L * 1024 * 1024)
    intercept[IllegalArgumentException](TableFunctions.parseSize("12 acres"))
  }

  test("table_changes SQL: append + COW delete-rewrite emit the commit-grain feed") {
    val t = freshName("tf_cdc_")
    Seq((1L, "a"), (2L, "b")).toDF("id", "v").write.saveAsTable(t)
    Layout.snapshot(spark, t, "s0")
    val s0 = seqOfTag(t, "s0")
    Seq((3L, "c")).toDF("id", "v").write.mode("append").saveAsTable(t)
    Layout.snapshot(spark, t, "s1")
    // copy-on-write DELETE rewrites files: id=1 disappears
    Layout.deleteWhere(spark, t, org.apache.spark.sql.functions.col("id") === 1L)
    Layout.snapshot(spark, t, "s2")
    val s2 = seqOfTag(t, "s2")
    val feed = Lakehouse.sql(spark,
      s"""SELECT _change_type, id, v
         |FROM TABLE(system.table_changes('default', '$t', $s0, $s2))
         |ORDER BY _change_ordinal, _change_type, id""".stripMargin)
      .as[(String, Long, String)].collect().toSeq
    // step 1: insert id=3. step 2 (COW rewrite): every surviving row is
    // delete+insert noise-free? No: the rewrite removes ALL old files and
    // adds the filtered file — the honest Iceberg-changelog degradation:
    // deletes for 1,2,3 then inserts for 2,3.
    val step1 = feed.filter(_._2 == 3L).map(_._1)
    assert(step1.contains("insert"))
    val deletes = feed.filter(_._1 == "delete").map(_._2).sorted
    val reinserts = feed.count(r => r._1 == "insert" && r._2 != 3L)
    assert(deletes.contains(1L), "the deleted row must appear as a delete")
    assert(reinserts >= 0) // rewrite re-inserts survivors; tolerated shape
    // NET effect reconciles with the states: final - initial
    val net = feed.groupBy(_._2).map { case (id, evs) =>
      id -> evs.foldLeft(0)((acc, e) => acc + (if (e._1 == "insert") 1 else -1))
    }
    assert(net.getOrElse(1L, 0) === -1, "id=1 nets to deleted")
    assert(net.getOrElse(2L, 0) === 0, "id=2 survives (net zero)")
    assert(net.getOrElse(3L, 0) === 1, "id=3 nets to inserted")
    // metadata columns carry the committing seq and step ordinal
    val meta = Lakehouse.sql(spark,
      s"""SELECT DISTINCT _change_version_id, _change_ordinal
         |FROM TABLE(system.table_changes('default', '$t', $s0, $s2))
         |ORDER BY _change_ordinal""".stripMargin).collect()
    assert(meta.length >= 2, "two commit steps in the window")
    // empty window: from == to answers zero rows with the full schema
    val empty = Lakehouse.sql(spark,
      s"SELECT * FROM TABLE(system.table_changes('default', '$t', $s2, $s2))")
    assert(empty.count() === 0L)
    assert(empty.columns.contains("_change_type"))
    // uncommitted bounds refuse
    intercept[Exception] {
      Lakehouse.sql(spark,
        s"SELECT * FROM TABLE(system.table_changes('default', '$t', 0, 999))")
    }
  }

  test("MOR deletes surface as delete rows on surviving files") {
    val t = freshName("tf_mor_")
    Seq((1L, "a"), (2L, "b"), (3L, "c")).toDF("id", "v").write.saveAsTable(t)
    Layout.snapshot(spark, t, "m0")
    val m0 = seqOfTag(t, "m0")
    // merge-on-read delete: a positional delete file, data files untouched
    Layout.deleteWhereMor(spark, t, org.apache.spark.sql.functions.col("id") === 2L)
    Layout.snapshot(spark, t, "m1")
    val m1 = seqOfTag(t, "m1")
    val feed = Lakehouse.sql(spark,
      s"""SELECT _change_type, id
         |FROM TABLE(system.table_changes('default', '$t', $m0, $m1))""".stripMargin)
      .as[(String, Long)].collect().toSeq
    assert(feed === Seq(("delete", 2L)),
      s"MOR delete must emit exactly the erased row, got $feed")
    // named-argument Trino spelling parses too
    val named = Lakehouse.sql(spark,
      s"""SELECT count(*) FROM TABLE(system.table_changes(
         |  schema_name => 'default', table_name => '$t',
         |  start_snapshot_id => $m0, end_snapshot_id => $m1))""".stripMargin)
      .collect().head.getLong(0)
    assert(named === 1L)
  }

  test("table_changes named arguments bind BY NAME in any order; unknown " +
      "names and positional-after-named refuse") {
    val t = freshName("tf_named_")
    Seq((1L, "a")).toDF("id", "v").write.saveAsTable(t)
    Layout.snapshot(spark, t, "n0")
    val n0 = seqOfTag(t, "n0")
    Seq((2L, "b")).toDF("id", "v").write.mode("append").saveAsTable(t)
    Layout.snapshot(spark, t, "n1")
    val n1 = seqOfTag(t, "n1")
    // REORDERED named args (the round-17 advisor's trap: the old parser
    // accepted names but bound positionally — table => first would have
    // read schema 't')
    val reordered = Lakehouse.sql(spark,
      s"""SELECT id FROM TABLE(system.table_changes(
         |  table_name => '$t', schema_name => 'default',
         |  end_snapshot_id => $n1, start_snapshot_id => $n0))""".stripMargin)
      .as[Long].collect().toSeq
    assert(reordered === Seq(2L))
    val unk = intercept[IllegalArgumentException] {
      Lakehouse.sql(spark,
        s"SELECT * FROM TABLE(system.table_changes(banana => '$t', " +
          s"schema_name => 'default', start_snapshot_id => $n0, " +
          s"end_snapshot_id => $n1))")
    }
    assert(unk.getMessage.contains("unknown table_changes argument"))
    val mixed = intercept[IllegalArgumentException] {
      Lakehouse.sql(spark,
        s"SELECT * FROM TABLE(system.table_changes(" +
          s"schema_name => 'default', '$t', $n0, $n1))")
    }
    assert(mixed.getMessage.contains("positional"))
    val badType = intercept[IllegalArgumentException] {
      Lakehouse.sql(spark,
        s"SELECT * FROM TABLE(system.table_changes('default', '$t', " +
          s"'$n0', $n1))")
    }
    assert(badType.getMessage.contains("snapshot id"))
  }

  test("rollback_to_snapshot via ALTER TABLE EXECUTE: content restores, " +
      "the restore commit parents off the target, and the abandoned " +
      "window falls off the ancestor chain") {
    val t = freshName("tf_rb_")
    Seq((1L, "a")).toDF("id", "v").write.saveAsTable(t)
    Layout.snapshot(spark, t, "r0")
    val r0 = seqOfTag(t, "r0")
    Seq((2L, "b")).toDF("id", "v").write.mode("append").saveAsTable(t)
    Layout.snapshot(spark, t, "r1")
    val r1 = seqOfTag(t, "r1")
    Seq((3L, "c")).toDF("id", "v").write.mode("append").saveAsTable(t)
    Layout.snapshot(spark, t, "r2")
    val back = Lakehouse.sql(spark,
      s"ALTER TABLE $t EXECUTE rollback_to_snapshot(snapshot_id => $r0)")
      .as[Long].collect().head
    assert(back === r0)
    // the PLAIN SQL plane reads the restored content immediately
    assert(Lakehouse.sql(spark, s"SELECT id FROM $t ORDER BY id")
      .as[Long].collect().toSeq === Seq(1L))
    // the restore commit's parent IS the rollback target (Iceberg's
    // shape: later commits parent off the rolled-back snapshot)
    val refs = Manifests.loadRefs(Manifests.root(spark, t))
    val head = Manifests.loadSnapshot(Manifests.root(spark, t), refs.head)
    assert(head.parent === r0, "restore commit parents off the target")
    assert(head.operation.startsWith("rollback"))
    // the abandoned r1..r2 line is NOT an ancestor of the new head:
    // a change window crossing it refuses (parent-chain walk, round-17
    // advisor) instead of diffing transitions that never happened
    val e = intercept[IllegalArgumentException] {
      Layout.changelog(spark, t, r1, refs.head).collect()
    }
    assert(e.getMessage.contains("ancestor"))
    // while a window along the surviving chain (r0 -> restore) serves
    val along = Layout.changelog(spark, t, r0, refs.head)
      .groupBy("_change_type").count().as[(String, Long)].collect().toMap
    // COW restore: the old file set swaps for the restored copy
    assert(along.getOrElse("insert", 0L) === 1L)
    // the abandoned tags still read their immutable state (time travel
    // by tag is ancestry-independent)
    assert(Lakehouse.sql(spark,
      s"SELECT count(*) FROM $t FOR VERSION AS OF 'r1'")
      .collect().head.getLong(0) === 2L)
  }

  test("CALL system.rollback_to_snapshot spelling works; uncommitted " +
      "targets and unknown system procedures refuse") {
    val t = freshName("tf_call_")
    Seq((1L, "a")).toDF("id", "v").write.saveAsTable(t)
    Layout.snapshot(spark, t, "c0")
    val c0 = seqOfTag(t, "c0")
    Seq((2L, "b")).toDF("id", "v").write.mode("append").saveAsTable(t)
    Layout.snapshot(spark, t, "c1")
    val back = Lakehouse.sql(spark,
      s"CALL iceberg.system.rollback_to_snapshot('default', '$t', $c0)")
      .as[Long].collect().head
    assert(back === c0)
    assert(spark.table(t).count() === 1L)
    val missing = intercept[Exception] {
      Lakehouse.sql(spark,
        s"ALTER TABLE $t EXECUTE rollback_to_snapshot(987654)")
    }
    assert(missing.getMessage.contains("no committed snapshot"))
    val unk = intercept[IllegalArgumentException] {
      Lakehouse.sql(spark, "CALL system.register_table('a', 'b', 'c')")
    }
    assert(unk.getMessage.contains("system procedure not supported"))
  }
}
