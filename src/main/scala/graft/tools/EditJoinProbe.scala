package graft.tools

import org.apache.spark.sql.functions._

import graft.ext.EditJoin

/** One-off calibration probe for the q220 edit-join leg (not a gate):
  * runs [[EditJoin.join]] over the customer table with a configurable
  * `prefixBlocks` B, reporting wall time, PEAK JVM heap (sampled by a
  * daemon thread — the working-set measure the gsf10 finding is about:
  * BASELINE §Round 10 measured runtime e₂ 1.34 above the candidate
  * exponent 1.17 with the working set near a 64 GiB heap), and summed
  * GC time. ER2′ shipped exactness-only in round 11; this probe is the
  * missing measurement (VERDICT r11, Next-round #3).
  * `EditJoinProbe <sfDir> <B> [passes]`. */
object EditJoinProbe {
  def main(args: Array[String]): Unit = {
    val d = args(0)
    val blocks = args(1).toInt
    val passes = args.lift(2).map(_.toInt).getOrElse(2)
    val spark = graft.GraftSession.local("editjoin-probe")
    spark.sparkContext.setLogLevel("ERROR")
    val customer = graft.Tables.load(spark, d, "customer")
    @volatile var peak = 0L
    @volatile var run = true
    val sampler = new Thread(() => {
      val rt = Runtime.getRuntime
      while (run) {
        val used = rt.totalMemory() - rt.freeMemory()
        if (used > peak) peak = used
        Thread.sleep(50)
      }
    })
    sampler.setDaemon(true)
    sampler.start()
    def gcMillis: Long = {
      import scala.jdk.CollectionConverters._
      java.lang.management.ManagementFactory.getGarbageCollectorMXBeans
        .asScala.map(_.getCollectionTime).sum
    }
    (1 to passes).foreach { i =>
      peak = 0L
      val gc0 = gcMillis
      val t0 = System.nanoTime()
      val n = EditJoin.join(customer, "c_custkey", "c_name",
        maxDist = 1, prefixBlocks = blocks).count()
      val secs = (System.nanoTime() - t0) / 1e9
      println(f"[editjoin-probe] B=$blocks pass $i: $secs%.1f s, " +
        f"pairs=$n, peak_heap=${peak / (1L << 30)}%d GiB " +
        f"(${peak / 1048576L} MiB), gc=${(gcMillis - gc0) / 1000.0}%.1f s")
    }
    run = false
    spark.stop()
  }
}
