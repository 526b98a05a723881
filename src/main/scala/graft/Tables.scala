package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions.expr

/** Loaders for the driver-generated analytical tables (TESTDATA.md).
  *
  * One Parquet file per table under a scale-factor directory. All reads go
  * through `spark.read.parquet` so Catalyst's vectorized reader, predicate
  * pushdown, and column pruning apply — check `.explain` for `PushedFilters`
  * / `ReadSchema` on every query built over these.
  */
object Tables {
  val names: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  def load(spark: SparkSession, sfDir: String, name: String): DataFrame = {
    if (name == "events") {
      // events.ts has shipped as INT64 TIMESTAMP(NANOS) in some data
      // drops and TIMESTAMP(MICROS) (read as NTZ) in others; normalize
      // both to Spark's native session-UTC microsecond TimestampType so
      // every downstream query (and the DuckDB oracle, which reads the
      // same file as a naive timestamp) sees identical instants.
      spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
      val raw = spark.read.parquet(s"$sfDir/$name.parquet")
      raw.schema("ts").dataType match {
        case org.apache.spark.sql.types.LongType =>
          raw.withColumn("ts", expr("timestamp_micros(ts div 1000)"))
        case org.apache.spark.sql.types.TimestampType => raw
        case _ => // TIMESTAMP_NTZ: same wall-clock field values, UTC session
          raw.withColumn("ts", expr("cast(ts as timestamp)"))
      }
    } else {
      spark.read.parquet(s"$sfDir/$name.parquet")
    }
  }

  def region(s: SparkSession, d: String): DataFrame     = load(s, d, "region")
  def nation(s: SparkSession, d: String): DataFrame     = load(s, d, "nation")
  def customer(s: SparkSession, d: String): DataFrame   = load(s, d, "customer")
  def supplier(s: SparkSession, d: String): DataFrame   = load(s, d, "supplier")
  def part(s: SparkSession, d: String): DataFrame       = load(s, d, "part")
  def orders(s: SparkSession, d: String): DataFrame     = load(s, d, "orders")
  def lineitem(s: SparkSession, d: String): DataFrame   = load(s, d, "lineitem")
  def events(s: SparkSession, d: String): DataFrame     = load(s, d, "events")
  def documents(s: SparkSession, d: String): DataFrame  = load(s, d, "documents")
  def embeddings(s: SparkSession, d: String): DataFrame = load(s, d, "embeddings")
}
