package graft.engine

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.{Path => HPath}
import org.apache.parquet.hadoop.ParquetFileReader
import org.apache.parquet.hadoop.util.HadoopInputFile
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.catalyst.plans.logical.{LeafNode, LocalRelation}
import org.apache.spark.sql.execution.datasources.{HadoopFsRelation, LogicalRelation}

/** Driver-side row-count estimation WITHOUT running a Spark job — the
  * "parameter sizing" primitive. Operators that pick a structural
  * parameter from corpus size (LSH bucket bits, sample rates, salt
  * fan-out) must not pay a full corpus scan just to choose it: at 100 TB
  * a `count()` for a parameter is a multi-minute job that reads every
  * byte the real query is about to read again.
  *
  * Resolution order, per leaf of the optimized plan (results summed —
  * for multi-leaf plans this is an upper bound, which is the safe
  * direction for bucket sizing):
  *
  *   1. Catalyst statistics `rowCount` — exact for materialized caches
  *      (InMemoryRelation row-count accumulators), CBO-analyzed tables,
  *      and `Range`.
  *   2. `LocalRelation` — driver-resident rows, length is free.
  *   3. Parquet file sources — footer record counts (metadata pages
  *      only, a few KB per file; the same source of truth
  *      [[Manifests.collectStats]] reads distributed at snapshot time).
  *      Driver-side here because parameter sizing happens at plan-build
  *      time; tables with 10⁵+ files should carry the count in their
  *      manifest ([[Manifests.FileEntry.records]]) and pass it
  *      explicitly.
  *   4. Size-based estimate (`sizeInBytes` / schema default row width)
  *      — order-of-magnitude only, which is all a log2 parameter needs.
  *
  * Never exact in general and never needs to be: callers use it inside
  * a log, where a 2× miss moves the answer by one bit.
  */
object TableStats {

  /** Approximate row count of `df`, resolved without launching a job. */
  def rowCountNoJob(df: DataFrame): Long = {
    val leaves = df.queryExecution.optimizedPlan.collect { case l: LeafNode => l }
    math.max(1L, leaves.map(leafCount).sum)
  }

  private def leafCount(leaf: LeafNode): Long = leaf match {
    case l if l.stats.rowCount.isDefined => l.stats.rowCount.get.toLong
    case LocalRelation(_, data, _, _) => data.length.toLong
    case lr @ LogicalRelation(fs: HadoopFsRelation, _, _, _, _)
        if fs.fileFormat.toString.toLowerCase.contains("parquet") =>
      parquetFooterCount(lr.relation.asInstanceOf[HadoopFsRelation])
        .getOrElse(sizeEstimate(leaf))
    case other => sizeEstimate(other)
  }

  /** Sum of footer record counts across the relation's files; None on any
    * read failure (fail-open to the size estimate — a sizing primitive
    * must never turn an unreadable footer into a query error). */
  private def parquetFooterCount(fs: HadoopFsRelation): Option[Long] =
    try {
      val conf = new Configuration()
      val files = fs.location.inputFiles
      Some(files.iterator.map { f =>
        val reader = ParquetFileReader.open(
          HadoopInputFile.fromPath(new HPath(f), conf))
        try reader.getRecordCount finally reader.close()
      }.sum)
    } catch { case scala.util.control.NonFatal(_) => None }

  private def sizeEstimate(leaf: LeafNode): Long = {
    val rowWidth = math.max(1L,
      leaf.output.map(_.dataType.defaultSize.toLong).sum + 8L)
    math.max(1L, leaf.stats.sizeInBytes.toLong / rowWidth)
  }
}
