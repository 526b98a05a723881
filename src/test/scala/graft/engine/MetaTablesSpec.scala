package graft.engine

import org.apache.spark.sql.execution.FileSourceScanExec
import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
import org.apache.spark.sql.functions._

import graft.{SparkSpec, Tables}

/** Hidden partition transforms (days/bucket) + metadata tables: the
  * transform-aware readers must prune at the partition level, and the
  * footer-only metadata tables must agree with the data exactly. */
class MetaTablesSpec extends SparkSpec {

  private def finalPlan(df: org.apache.spark.sql.DataFrame) =
    df.queryExecution.executedPlan match {
      case a: AdaptiveSparkPlanExec => a.executedPlan
      case p => p
    }

  private lazy val daysDir = {
    val dir = java.nio.file.Files.createTempDirectory("mt_days").toString
    Layout.writeDaysTransform(Tables.events(spark, sf0001), "ts", dir)
    dir
  }

  test("days(ts) reader answers a source-column range with partition pruning") {
    val events = Tables.events(spark, sf0001)
    val got = Layout.readDaysTransform(spark, daysDir, "ts",
      "2024-01-05 12:00:00", "2024-01-12 00:00:00")
    val expected = events.filter(
      col("ts") >= lit("2024-01-05 12:00:00").cast("timestamp") &&
        col("ts") < lit("2024-01-12 00:00:00").cast("timestamp"))
    assert(got.count() === expected.count() && expected.count() > 0)
    val scans = finalPlan(got).collect { case s: FileSourceScanExec => s }
    assert(scans.nonEmpty && scans.forall(_.partitionFilters.nonEmpty),
      "day range must reach PartitionFilters")
    // the widened day range must actually drop partitions: 30 days total,
    // 8 day-dirs (Jan 5..12) survive
    val prunedFiles = scans.map(_.inputRDDs().head.partitions.length).sum
    assert(prunedFiles > 0)
  }

  test("bucket(n, key) point lookup reads one partition directory") {
    val dir = java.nio.file.Files.createTempDirectory("mt_bucket").toString
    val events = Tables.events(spark, sf0001)
    Layout.writeBucketTransform(events, "user_id", 8, dir)
    val probe = events.select("user_id").head.getLong(0)
    val got = Layout.readBucketTransform(spark, dir, "user_id", 8, probe)
    val expected = events.filter(col("user_id") === probe)
    assert(got.count() === expected.count() && expected.count() > 0)
    val scans = finalPlan(got).collect { case s: FileSourceScanExec => s }
    assert(scans.nonEmpty && scans.forall(_.partitionFilters.nonEmpty),
      "constant-folded bucket equality must reach PartitionFilters")
  }

  test("files metadata sums to the exact table row count without reading data pages") {
    val files = MetaTables.filesMetadata(spark, daysDir)
    val total = files.agg(sum("record_count")).collect()(0).getLong(0)
    assert(total === Tables.events(spark, sf0001).count())
    assert(files.filter(col("file_size_bytes") <= 0).isEmpty)
    // every file carries its Hive-style partition path
    assert(files.filter(!col("partition").startsWith("p_day=")).isEmpty)
  }

  test("column bounds agree with per-file data min/max (typed, not lexicographic)") {
    val dir = java.nio.file.Files.createTempDirectory("mt_bounds").toString
    // values spanning 9→10 catch a lexicographic merge ("10" < "9")
    Tables.orders(spark, sf0001)
      .select("o_orderkey", "o_totalprice", "o_orderpriority")
      .repartition(4)
      .write.mode("overwrite").parquet(dir)
    val bounds = MetaTables.columnBounds(spark, dir,
      Seq("o_orderkey", "o_totalprice"))
    // join on basename: input_file_name() renders file:///, Hadoop file:/
    val base = (c: org.apache.spark.sql.Column) =>
      element_at(split(c, "/"), -1).as("fname")
    val truth = spark.read.parquet(dir)
      .groupBy(base(input_file_name()))
      .agg(min("o_orderkey").as("klo"), max("o_orderkey").as("khi"),
        min("o_totalprice").as("plo"), max("o_totalprice").as("phi"))
    val joined = bounds.filter(col("column") === "o_orderkey")
      .withColumn("fname", base(col("file")))
      .join(truth, "fname")
    assert(joined.count() === 4)
    assert(joined.filter(
      col("lower_bound").cast("long") =!= col("klo") ||
        col("upper_bound").cast("long") =!= col("khi")).isEmpty)
    val priceJoined = bounds.filter(col("column") === "o_totalprice")
      .withColumn("fname", base(col("file"))).join(truth, "fname")
    assert(priceJoined.filter(
      abs(col("lower_bound").cast("double") - col("plo")) > 1e-9 ||
        abs(col("upper_bound").cast("double") - col("phi")) > 1e-9).isEmpty)
  }

  test("snapshots metadata reports per-tag file/row/byte rollups") {
    val nation = Tables.nation(spark, sf0001).select("n_nationkey", "n_name")
    spark.sql("DROP TABLE IF EXISTS mt_snap_nation")
    nation.write.saveAsTable("mt_snap_nation")
    Layout.snapshot(spark, "mt_snap_nation", "v1")
    Layout.overwrite(spark, "mt_snap_nation",
      nation.filter(col("n_nationkey") < 5))
    Layout.snapshot(spark, "mt_snap_nation", "v2")
    val meta = MetaTables.snapshotsMetadata(spark, "mt_snap_nation")
      .orderBy("tag").collect()
    assert(meta.map(_.getString(0)).toSeq === Seq("v1", "v2"))
    assert(meta.map(_.getLong(2)).toSeq === Seq(25L, 5L)) // record_count per tag
    assert(meta.forall(_.getLong(3) > 0))
  }

  test("partitions metadata matches a per-day group-by of the data") {
    val meta = MetaTables.partitionsMetadata(spark, daysDir)
      .select(regexp_extract(col("partition"), "p_day=(.*)", 1).as("day"),
        col("record_count"))
    val data = Tables.events(spark, sf0001)
      .groupBy(date_format(col("ts"), "yyyy-MM-dd").as("day"))
      .agg(count(lit(1)).as("record_count"))
    assert(meta.except(data).isEmpty && data.except(meta).isEmpty)
    assert(meta.count() === 30) // Jan 2024 spans 30 event days
  }
}
