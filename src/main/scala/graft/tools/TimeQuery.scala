package graft.tools

import org.apache.spark.sql.SparkSession

import graft.queries.Registry

/** Single-query timing loop: `TimeQuery <sfDir> <name> [passes]` — the
  * per-query iteration twin of graft.Bench (same noop-sink protocol). */
object TimeQuery {
  def main(args: Array[String]): Unit = {
    val (sfDir, name) = (args(0), args(1))
    val passes = args.lift(2).map(_.toInt).getOrElse(3)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val q = Registry.byName(name)
    (1 to passes).foreach { i =>
      val t0 = System.nanoTime()
      q.run(spark, sfDir).write.format("noop").mode("overwrite").save()
      println(f"[time] $name pass $i: ${(System.nanoTime() - t0) / 1e9}%.2f s")
    }
    spark.stop()
  }
}
