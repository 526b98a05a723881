package graft.tools

import java.util.concurrent.atomic.{AtomicInteger, AtomicLong}

import org.apache.spark.scheduler.{SparkListener, SparkListenerJobStart, SparkListenerStageCompleted, SparkListenerTaskEnd}
import org.apache.spark.sql.SparkSession

import graft.queries.Registry

/** Structural per-query metrics (r18 optimization round): run each named
  * query through the bench's noop-sink protocol under a SparkListener and
  * report #jobs, #stages, #tasks, summed task time, and shuffle bytes.
  * Job/stage counts are DETERMINISTIC — they measure plan structure, not
  * the host — so before/after comparisons survive the sandbox's ambient
  * CPU contention that makes wall-clock readings drift 2x between runs.
  * `runMain graft.tools.MetricsProbe <sfDir> <q> [q...]` */
object MetricsProbe {
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

    val jobs = new AtomicInteger(0)
    val stages = new AtomicInteger(0)
    val tasks = new AtomicInteger(0)
    val taskTimeMs = new AtomicLong(0L)
    val shufWrite = new AtomicLong(0L)
    val shufRead = new AtomicLong(0L)
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onJobStart(e: SparkListenerJobStart): Unit = {
        jobs.incrementAndGet()
        if (sys.env.contains("GRAFT_PROBE_JOBS")) {
          val names = e.stageInfos.map(_.name.takeWhile(_ != '\n')).distinct
          println(s"[job] ${e.jobId} stages=${e.stageInfos.size} " +
            names.mkString(" | ").take(160))
        }
        ()
      }
      override def onStageCompleted(e: SparkListenerStageCompleted): Unit = {
        stages.incrementAndGet()
        tasks.addAndGet(e.stageInfo.numTasks)
        if (sys.env.contains("GRAFT_PROBE_STAGES")) {
          val si = e.stageInfo
          val tm = si.taskMetrics
          val sw = if (tm != null) tm.shuffleWriteMetrics.bytesWritten else 0L
          val sr = if (tm != null) tm.shuffleReadMetrics.totalBytesRead else 0L
          if (sw > 5000000 || sr > 5000000 ||
              (tm != null && tm.executorRunTime > 2000))
            println(f"[stage] ${si.stageId}%4d tasks=${si.numTasks}%4d " +
              f"time=${if (tm != null) tm.executorRunTime else 0L}%6dms " +
              f"sw=${sw / 1e6}%8.1fMB sr=${sr / 1e6}%8.1fMB  ${si.name.take(90)}")
        }
        ()
      }
      override def onTaskEnd(e: SparkListenerTaskEnd): Unit = {
        val m = e.taskMetrics
        if (m != null) {
          taskTimeMs.addAndGet(m.executorRunTime)
          shufWrite.addAndGet(m.shuffleWriteMetrics.bytesWritten)
          shufRead.addAndGet(m.shuffleReadMetrics.totalBytesRead)
        }
        ()
      }
    })

    def snap(): (Int, Int, Int, Long, Long, Long) =
      (jobs.get, stages.get, tasks.get, taskTimeMs.get, shufWrite.get, shufRead.get)

    names.foreach { n =>
      val q = Registry.byName(n)
      q.setup.foreach(st => st(spark, sfDir)) // fixture phase, unmeasured
      // one unmeasured warm rep (page cache, codegen), then the measured rep
      try q.run(spark, sfDir).write.format("noop").mode("overwrite").save()
      catch { case e: Throwable => System.err.println(s"[metrics] warm $n: $e") }
      Thread.sleep(300) // let listener events drain (private listenerBus)
      val before = snap()
      val t0 = System.nanoTime()
      try q.run(spark, sfDir).write.format("noop").mode("overwrite").save()
      catch { case e: Throwable => System.err.println(s"[metrics] $n FAILED: $e") }
      val wall = (System.nanoTime() - t0) / 1e9
      Thread.sleep(300) // let listener events drain (private listenerBus)
      val after = snap()
      println(f"[metrics] $n: jobs=${after._1 - before._1} " +
        f"stages=${after._2 - before._2} tasks=${after._3 - before._3} " +
        f"taskTime=${(after._4 - before._4) / 1e3}%.2fs " +
        f"shufWrite=${(after._5 - before._5) / 1e6}%.1fMB " +
        f"shufRead=${(after._6 - before._6) / 1e6}%.1fMB wall=$wall%.2fs")
    }
    spark.stop()
  }
}
