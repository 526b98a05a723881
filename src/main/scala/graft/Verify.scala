package graft
import org.apache.spark.sql.SparkSession
import java.nio.file.{Files, Paths}
/** Driver-run correctness dump: each SparkEntry.queries result → parquet,
  * plus oracle_sql.json, for the driver's DuckDB compare. */
object Verify {
  def main(args: Array[String]): Unit = {
    val (sfDir, outDir) = (args(0), args(1))
    // Optional third arg: comma-separated query-name prefixes — local
    // iteration aid; the driver always runs the full two-arg form.
    val only: String => Boolean = args.lift(2) match {
      case Some(pfx) => { val ps = pfx.split(','); n => ps.exists(n.startsWith) }
      case None      => _ => true
    }
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      // INT64-micros timestamps (not legacy INT96, which parquet writes
      // WITHOUT column statistics): manifest bounds and row-group skipping
      // on time columns only exist with spec-compliant INT64 timestamps
      .config("spark.sql.parquet.outputTimestampType", "TIMESTAMP_MICROS")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // Bounded-table windows legitimately run partitionless; their per-task
    // WindowExec warning drowned the round-7 bench's diagnostics.
    org.apache.logging.log4j.core.config.Configurator.setLevel(
      "org.apache.spark.sql.execution.window.WindowExec",
      org.apache.logging.log4j.Level.ERROR)
    new java.io.File(outDir).mkdirs()
    SparkEntry.queries.filter(kv => only(kv._1)).foreach { case (name, fn) =>
      try {
        val df = fn(spark, sfDir)
        // Dump timestamps as NTZ: the session writes UTC-adjusted
        // INT64-micros (manifest-stats discipline), but the driver's
        // pandas compare reads those as tz-AWARE while the DuckDB oracle
        // yields naive values — a type mismatch on every ts column. The
        // session timezone is pinned UTC, so the NTZ cast is a pure
        // representation change (identical instants), restoring the
        // naive-vs-naive compare every round has used.
        import org.apache.spark.sql.functions.col
        import org.apache.spark.sql.types.{TimestampNTZType, TimestampType}
        val dumped = df.select(df.schema.fields.map { f =>
          if (f.dataType == TimestampType) col(f.name).cast(TimestampNTZType).as(f.name)
          else col(f.name)
        }.toIndexedSeq: _*)
        dumped.coalesce(1).write.mode("overwrite").parquet(s"$outDir/$name")
      } catch { case e: Throwable =>
        System.err.println(s"[verify] $name failed: ${e.getMessage}")
      }
    }
    // JSON string escape: backslash, quote, and ALL control chars (<0x20)
    // — a tab or CR in builder-authored SQL would otherwise make the
    // driver's json.load fail and silently zero the round's correctness.
    def q(s: String): String = "\"" + s.flatMap {
      case '"'  => "\\\""
      case '\\' => "\\\\"
      case '\n' => "\\n"
      case '\r' => "\\r"
      case '\t' => "\\t"
      case c if c < ' ' => f"\\u${c.toInt}%04x"
      case c => c.toString
    } + "\""
    val json = SparkEntry.oracleSql.filter(kv => only(kv._1))
      .map { case (k, v) => s"${q(k)}: ${q(v)}" }.mkString("{", ",", "}")
    Files.writeString(Paths.get(s"$outDir/oracle_sql.json"), json)
    spark.stop()
  }
}
