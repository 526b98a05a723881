package graft.engine

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._

/** Physical-layout operators: the storage-side half of the 100 TB design.
  *
  * The reference declares no partitioning or bucketing on any seeded table
  * (seed.sh:72-112 — flat Iceberg tables); at its demo scale none is
  * needed. At engine scale they are the two levers that remove whole
  * shuffle/scan classes, so they are first-class here:
  *
  *   - [[writePartitionedByDay]]: fact tables land partitioned by event
  *     day → time-range queries (the Superset `time_range` shape, P7) scan
  *     only matching partitions (PartitionFilters in the plan, verified by
  *     LayoutSpec).
  *   - [[writeBucketed]]: dimension/fact tables bucketed on their join key
  *     → equi-joins between co-bucketed tables run with NO Exchange on
  *     either side (verified by LayoutSpec). On a 1000-executor cluster
  *     this turns the nightly fact⋈fact join from the dominant shuffle
  *     into a local zip.
  *
  * Both write through the session catalog (`saveAsTable`) — bucketing
  * metadata lives in the catalog, the Spark-native stand-in for the
  * reference's Nessie table metadata.
  */
object Layout {

  /** Write `df` as a managed table partitioned by the UTC day of `tsCol`
    * (directory-level partitioning → partition pruning for time filters). */
  def writePartitionedByDay(df: DataFrame, tsCol: String, table: String): Unit =
    df.withColumn("p_day", date_format(col(tsCol), "yyyy-MM-dd"))
      .write.mode(SaveMode.Overwrite)
      .partitionBy("p_day")
      .saveAsTable(table)

  /** Write `df` bucketed (and sorted) by `keyCol` into `numBuckets` — the
    * co-located-join layout. */
  def writeBucketed(df: DataFrame, keyCol: String, numBuckets: Int, table: String): Unit =
    df.write.mode(SaveMode.Overwrite)
      .bucketBy(numBuckets, keyCol)
      .sortBy(keyCol)
      .saveAsTable(table)

}
