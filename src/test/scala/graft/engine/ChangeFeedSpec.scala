package graft.engine

import org.apache.spark.sql.functions._
import graft.SparkSpec

/** ST22 — the durable change-feed follower: poll/commit cursor
  * semantics over [[Layout.changelog]] (at-least-once with replay on
  * crash, exactly-once downstream via _change_version_id dedup). */
class ChangeFeedSpec extends SparkSpec {
  import spark.implicits._

  private def freshName(p: String) =
    p + java.util.UUID.randomUUID().toString.replace("-", "").take(8)

  test("poll sees only commits after the cursor; commit advances; crash replays the batch") {
    val t = freshName("cf_")
    val cursor = java.nio.file.Files.createTempDirectory("cf")
      .resolve("cursor").toString
    Seq((1L, "a")).toDF("id", "v").write.saveAsTable(t)
    Layout.snapshot(spark, t, "base")
    ChangeFeed.init(spark, t, cursor)
    // nothing new yet
    assert(ChangeFeed.poll(spark, t, cursor).isEmpty)
    // an appended-and-committed batch arrives
    Seq((2L, "b"), (3L, "c")).toDF("id", "v").write.mode("append").saveAsTable(t)
    Layout.snapshot(spark, t, "b1")
    val batch1 = ChangeFeed.poll(spark, t, cursor).get
    val got1 = batch1.changes.select("_change_type", "id")
      .as[(String, Long)].collect().sortBy(_._2).toSeq
    assert(got1 === Seq(("insert", 2L), ("insert", 3L)))
    // CRASH before commit: a fresh poll replays the SAME window
    val replay = ChangeFeed.poll(spark, t, cursor).get
    assert(replay.fromSeq === batch1.fromSeq && replay.toSeq === batch1.toSeq)
    // commit, then only NEW commits appear
    ChangeFeed.commit(cursor, batch1)
    assert(ChangeFeed.poll(spark, t, cursor).isEmpty)
    Seq((4L, "d")).toDF("id", "v").write.mode("append").saveAsTable(t)
    Layout.snapshot(spark, t, "b2")
    val batch2 = ChangeFeed.poll(spark, t, cursor).get
    val got2 = batch2.changes.select("id").as[Long].collect().toSeq
    assert(got2 === Seq(4L))
    // every change row carries its committing snapshot — the replay
    // dedup key the contract names
    assert(batch2.changes.columns.contains("_change_version_id"))
    ChangeFeed.commit(cursor, batch2)
  }

  test("stale commits and double init refuse loudly") {
    val t = freshName("cf_bad_")
    val dir = java.nio.file.Files.createTempDirectory("cf")
    val cursor = dir.resolve("cursor").toString
    Seq((1L, "a")).toDF("id", "v").write.saveAsTable(t)
    Layout.snapshot(spark, t, "base")
    ChangeFeed.init(spark, t, cursor)
    intercept[IllegalArgumentException](ChangeFeed.init(spark, t, cursor))
    Seq((2L, "b")).toDF("id", "v").write.mode("append").saveAsTable(t)
    Layout.snapshot(spark, t, "b1")
    val batch = ChangeFeed.poll(spark, t, cursor).get
    ChangeFeed.commit(cursor, batch)
    // a second follower holding the OLD batch must not rewind the cursor
    val e = intercept[IllegalArgumentException](ChangeFeed.commit(cursor, batch))
    assert(e.getMessage.contains("stale commit"))
    // polling an uninitialized cursor refuses with the remedy
    val e2 = intercept[IllegalStateException] {
      ChangeFeed.poll(spark, t, dir.resolve("nope").toString)
    }
    assert(e2.getMessage.contains("init"))
  }

  test("a delete-rewrite flows through the feed with both event kinds") {
    val t = freshName("cf_del_")
    val cursor = java.nio.file.Files.createTempDirectory("cf")
      .resolve("cursor").toString
    Seq((1L, "a"), (2L, "b")).toDF("id", "v").write.saveAsTable(t)
    Layout.snapshot(spark, t, "base")
    ChangeFeed.init(spark, t, cursor)
    Layout.deleteWhere(spark, t, col("id") === 1L)
    val batch = ChangeFeed.poll(spark, t, cursor).get
    val byType = batch.changes.groupBy("_change_type").count()
      .as[(String, Long)].collect().toMap
    // COW rewrite: both rows delete, the survivor re-inserts
    assert(byType("delete") === 2L && byType("insert") === 1L)
    ChangeFeed.commit(cursor, batch)
  }

  test("a follower whose cursor points into a rolled-back line surfaces " +
      "the ancestor refusal instead of emitting phantom change rows") {
    val t = freshName("cf_rb_")
    val cursor = java.nio.file.Files.createTempDirectory("cf")
      .resolve("cursor").toString
    Seq((1L, "a")).toDF("id", "v").write.saveAsTable(t)
    Layout.snapshot(spark, t, "base")
    val base = Manifests.loadRefs(Manifests.root(spark, t)).tags("base")
    Seq((2L, "b")).toDF("id", "v").write.mode("append").saveAsTable(t)
    Layout.snapshot(spark, t, "grown")
    // the follower catches up to the soon-to-be-abandoned head
    ChangeFeed.init(spark, t, cursor)
    // rollback abandons the grown commit; the restore commit parents
    // off base, so the follower's cursor is no longer an ancestor
    graft.engine.Lakehouse.sql(spark,
      s"ALTER TABLE $t EXECUTE rollback_to_snapshot($base)").collect()
    val e = intercept[IllegalArgumentException] {
      ChangeFeed.poll(spark, t, cursor).foreach(_.changes.collect())
    }
    assert(e.getMessage.contains("ancestor"),
      "the feed must refuse the non-ancestor window loudly — a " +
        "consecutive-seq diff would fabricate transitions")
    // recovery: rebase moves the cursor to the fork point (the base
    // commit — the newest common ancestor), and the next poll serves
    // the SURVIVING line (the restore commit) instead of refusing
    val fork = ChangeFeed.rebase(spark, t, cursor)
    assert(fork === base, "the fork point is the rollback target")
    val replay = ChangeFeed.poll(spark, t, cursor).get
    assert(replay.fromSeq === base)
    replay.changes.collect() // serves without refusing
    ChangeFeed.commit(cursor, replay)
    // a HEALTHY follower cannot be accidentally rewound
    val healthy = intercept[IllegalArgumentException] {
      ChangeFeed.rebase(spark, t, cursor)
    }
    assert(healthy.getMessage.contains("healthy"))
  }
}
