package graft

import org.apache.spark.sql.SparkSession

/** SparkSession factory for the graft engine.
  *
  * Spark-native stand-in for the reference stack's runtime wiring
  * (Trino coordinator + Nessie catalog + MinIO warehouse,
  * /root/reference/compose/compose.yaml:59-135): the session catalog plays
  * Nessie, `spark.sql.warehouse.dir` plays the MinIO bucket, and Catalyst
  * plays the Trino planner.
  *
  * Scale posture: AQE on (runtime re-plan, skew-join splitting, partition
  * coalescing), shuffle partitions sized for the local harness but read from
  * the env so a cluster deploy can raise it without code change.
  */
object GraftSession {

  def local(appName: String = "graft"): SparkSession = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    builder(appName, s"local[$cpus]", cpus).getOrCreate()
  }

  /** Shared config; master-agnostic so the same builder works on a cluster. */
  def builder(appName: String, master: String, shufflePartitions: String): SparkSession.Builder =
    SparkSession.builder()
      .master(master)
      .appName(appName)
      .config("spark.sql.shuffle.partitions", shufflePartitions)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
      .config("spark.sql.adaptive.skewJoin.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      // INT64-micros timestamps (not legacy INT96, which parquet writes
      // WITHOUT column statistics): manifest bounds and row-group skipping
      // on time columns only exist with spec-compliant INT64 timestamps
      .config("spark.sql.parquet.outputTimestampType", "TIMESTAMP_MICROS")
      .config("spark.ui.enabled", "false")
      // engine extensions (all flag-gated, default off — see each rule)
      .withExtensions(_.injectOptimizerRule(_ => graft.plans.ApproxDistinctRule))
}
