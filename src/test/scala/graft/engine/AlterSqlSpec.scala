package graft.engine

import graft.SparkSpec

/** L31 — schema-change + ref DDL from SQL: DROP/RENAME COLUMN execute
  * as one COW commit (Spark v1 refuses both natively), and Iceberg's
  * CREATE/REPLACE/DROP TAG/BRANCH spellings land on the refs-CAS
  * machinery; created refs immediately serve the existing read
  * spellings. */
class AlterSqlSpec extends SparkSpec {
  import spark.implicits._

  private def freshName(p: String) =
    p + java.util.UUID.randomUUID().toString.replace("-", "").take(8)

  private def seqOfTag(t: String, tag: String): Long =
    Manifests.loadRefs(Manifests.root(spark, t)).tags(tag)

  test("DROP COLUMN rewrites through one COW commit; existing tags keep " +
      "the pre-change schema and bytes") {
    val t = freshName("alt_drop_")
    Seq((1L, "a", 10L), (2L, "b", 20L)).toDF("id", "v", "x").write.saveAsTable(t)
    Layout.snapshot(spark, t, "wide")
    val out = Lakehouse.sql(spark, s"ALTER TABLE $t DROP COLUMN x")
      .as[String].collect().toSeq
    assert(out === Seq("x"))
    assert(spark.table(t).columns.toSeq === Seq("id", "v"))
    assert(spark.table(t).count() === 2L)
    // the tag still reads THREE columns — its files are immutable
    val tagged = Lakehouse.sql(spark,
      s"SELECT * FROM $t FOR VERSION AS OF 'wide' ORDER BY id")
    assert(tagged.columns.toSeq === Seq("id", "v", "x"))
    assert(tagged.count() === 2L)
    val unk = intercept[IllegalArgumentException] {
      Lakehouse.sql(spark, s"ALTER TABLE $t DROP COLUMN nope")
    }
    assert(unk.getMessage.contains("unknown column"))
    Lakehouse.sql(spark, s"ALTER TABLE $t DROP COLUMN v").collect()
    val last = intercept[IllegalArgumentException] {
      Lakehouse.sql(spark, s"ALTER TABLE $t DROP COLUMN id")
    }
    assert(last.getMessage.contains("only column"))
  }

  test("RENAME COLUMN preserves data under the new name; collisions and " +
      "native ADD COLUMNS behave") {
    val t = freshName("alt_ren_")
    Seq((1L, "a"), (2L, "b")).toDF("id", "v").write.saveAsTable(t)
    Lakehouse.sql(spark, s"ALTER TABLE $t RENAME COLUMN v TO label").collect()
    assert(spark.table(t).columns.toSeq === Seq("id", "label"))
    assert(Lakehouse.sql(spark, s"SELECT label FROM $t ORDER BY id")
      .as[String].collect().toSeq === Seq("a", "b"))
    val dup = intercept[IllegalArgumentException] {
      Lakehouse.sql(spark, s"ALTER TABLE $t RENAME COLUMN label TO id")
    }
    assert(dup.getMessage.contains("already exists"))
    // a native ALTER passes through untouched (the router is anchored)
    Lakehouse.sql(spark, s"ALTER TABLE $t ADD COLUMNS (extra INT)")
    assert(spark.table(t).columns.contains("extra"))
  }

  test("CREATE TAG (current and AS OF VERSION), REPLACE TAG, DROP TAG " +
      "drive the refs machinery from SQL") {
    val t = freshName("alt_tag_")
    Seq((1L, "a")).toDF("id", "v").write.saveAsTable(t)
    Lakehouse.sql(spark, s"ALTER TABLE $t CREATE TAG v1").collect()
    val v1 = seqOfTag(t, "v1")
    Seq((2L, "b")).toDF("id", "v").write.mode("append").saveAsTable(t)
    Lakehouse.sql(spark, s"ALTER TABLE $t CREATE TAG v2").collect()
    val v2 = seqOfTag(t, "v2")
    assert(Lakehouse.sql(spark,
      s"SELECT count(*) FROM $t FOR VERSION AS OF 'v1'")
      .collect().head.getLong(0) === 1L)
    // pin a NEW name to history by seq — metadata-only
    Lakehouse.sql(spark,
      s"ALTER TABLE $t CREATE TAG old_state AS OF VERSION $v1").collect()
    assert(Lakehouse.sql(spark,
      s"SELECT count(*) FROM $t FOR VERSION AS OF 'old_state'")
      .collect().head.getLong(0) === 1L)
    // REPLACE moves the existing pointer under the CAS guard
    Lakehouse.sql(spark,
      s"ALTER TABLE $t REPLACE TAG old_state AS OF VERSION $v2").collect()
    assert(Lakehouse.sql(spark,
      s"SELECT count(*) FROM $t FOR VERSION AS OF 'old_state'")
      .collect().head.getLong(0) === 2L)
    // plain REPLACE on a missing tag refuses; CREATE OR REPLACE upserts
    intercept[Exception] {
      Lakehouse.sql(spark,
        s"ALTER TABLE $t REPLACE TAG ghost AS OF VERSION $v1")
    }
    Lakehouse.sql(spark,
      s"ALTER TABLE $t CREATE OR REPLACE TAG ghost AS OF VERSION $v1").collect()
    assert(seqOfTag(t, "ghost") === v1)
    // DROP TAG dereferences; the expired read refuses loudly
    Lakehouse.sql(spark, s"ALTER TABLE $t DROP TAG v1").collect()
    val e = intercept[Exception] {
      Lakehouse.sql(spark, s"SELECT * FROM $t FOR VERSION AS OF 'v1'").collect()
    }
    assert(e.getMessage.contains("v1"))
    // RETAIN clauses refuse with the expire_snapshots story
    val r = intercept[IllegalArgumentException] {
      Lakehouse.sql(spark,
        s"ALTER TABLE $t CREATE TAG keep7 RETAIN 7 DAYS")
    }
    assert(r.getMessage.contains("expire_snapshots"))
  }

  test("CREATE BRANCH (current and AS OF VERSION) serves `t@branch` " +
      "reads; DROP BRANCH removes branch and anchor") {
    val t = freshName("alt_br_")
    Seq((1L, "a")).toDF("id", "v").write.saveAsTable(t)
    Lakehouse.sql(spark, s"ALTER TABLE $t CREATE TAG b0").collect()
    val b0 = seqOfTag(t, "b0")
    Seq((2L, "b")).toDF("id", "v").write.mode("append").saveAsTable(t)
    // branch from current state
    Lakehouse.sql(spark, s"ALTER TABLE $t CREATE BRANCH dev").collect()
    assert(Lakehouse.sql(spark, s"SELECT count(*) FROM `$t@dev`")
      .collect().head.getLong(0) === 2L)
    // branch from history by seq
    Lakehouse.sql(spark,
      s"ALTER TABLE $t CREATE BRANCH repro AS OF VERSION $b0").collect()
    assert(Lakehouse.sql(spark, s"SELECT count(*) FROM `$t@repro`")
      .collect().head.getLong(0) === 1L)
    // main is untouched by branch work
    assert(spark.table(t).count() === 2L)
    Lakehouse.sql(spark, s"ALTER TABLE $t DROP BRANCH dev").collect()
    Lakehouse.sql(spark, s"ALTER TABLE $t DROP BRANCH repro").collect()
    intercept[Exception] {
      Lakehouse.sql(spark, s"SELECT count(*) FROM `$t@dev`").collect()
    }
  }
}
