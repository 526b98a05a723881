package graft.tools

import org.apache.spark.sql.SparkSession
import graft.queries.Registry

/** Plan/timing inspector: `runMain graft.tools.Explain <sfDir> <q> [q...]`
  * prints the formatted physical plan and timed noop-sink execution for
  * each named query — the iterate-on-the-plan loop the engine is tuned
  * with. */
object Explain {
  def main(args: Array[String]): Unit = {
    val sfDir = args.head
    val names = args.tail.toSeq
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    names.foreach { n =>
      val q = Registry.byName(n)
      q.setup.foreach(st => st(spark, sfDir)) // fixture phase, untimed
      val df = q.run(spark, sfDir)
      println(s"==================== $n ====================")
      df.explain("formatted")
      // Time construction + execution together, exactly as Bench does:
      // iterative queries do their work in eager localCheckpoints and
      // bounded collects DURING run(), so timing only the final noop
      // save of a pre-built frame under-reports them by 10x+.
      (1 to 3).foreach { i =>
        val t0 = System.nanoTime()
        q.run(spark, sfDir).write.format("noop").mode("overwrite").save()
        println(f"[$n] run$i: ${(System.nanoTime() - t0) / 1e9}%.2f s")
      }
    }
    spark.stop()
  }
}
