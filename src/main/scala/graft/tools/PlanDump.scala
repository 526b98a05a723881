package graft.tools

import org.apache.spark.sql.SparkSession
import graft.queries.Registry

/** Dump each named query's `.explain("formatted")` to
  * `<outDir>/<query>_<suffix>.txt` (the r18 plans/ deliverable).
  * `runMain graft.tools.PlanDump <sfDir> <outDir> <suffix> <q> [q...]`.
  * Fixture setups run first; queries whose work happens inside eager
  * localCheckpoints during construction still show only the terminal
  * checkpoint scan here — for those the probe decompositions in
  * OPTIMIZATION_r18.md carry the plan evidence. */
object PlanDump {
  def main(args: Array[String]): Unit = {
    val Array(sfDir, outDir, suffix, names @ _*) = args.toSeq.toArray
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    java.nio.file.Files.createDirectories(java.nio.file.Paths.get(outDir))
    names.foreach { n =>
      try {
        val q = Registry.byName(n)
        q.setup.foreach(st => st(spark, sfDir))
        val df = q.run(spark, sfDir)
        val plan = df.queryExecution.explainString(
          org.apache.spark.sql.execution.FormattedMode)
        java.nio.file.Files.writeString(
          java.nio.file.Paths.get(outDir, s"${n}_$suffix.txt"), plan)
        println(s"[plandump] wrote $n")
      } catch { case e: Throwable =>
        System.err.println(s"[plandump] $n FAILED: $e")
      }
    }
    spark.stop()
  }
}
