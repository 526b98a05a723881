package graft.tools

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.functions._

import graft.Tables
import graft.ext.{IndexStore, InvertedIndex}

/** One-off measurement for [[graft.ext.IndexStore.compact]] (not a
  * gate): what an inc-chain actually costs a serving path, and what the
  * fold buys back. Builds a BM25 bundle on the first half of the
  * documents table, appends the second half as `appends` separate
  * increments (the nightly-append shape), then times the q191-style
  * serve (reload + scores, min of `passes`) and counts bundle files
  * BEFORE and AFTER `compact`. The serve is re-loaded per pass — the
  * listing + footer cost of many small increment files is exactly what
  * the chain inflates, so the load must be inside the timed window.
  * `CompactProbe [sfDir] [appends] [passes]`. */
object CompactProbe {

  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val appends = args.lift(1).map(_.toInt).getOrElse(8)
    val passes = args.lift(2).map(_.toInt).getOrElse(3)
    val spark = graft.GraftSession.local("graft-compactprobe")
    spark.sparkContext.setLogLevel("ERROR")

    val docs = Tables.load(spark, sfDir, "documents")
      .select(col("doc_id"), col("text")).cache()
    val maxId = docs.agg(max(col("doc_id"))).head().getLong(0)
    val cut = maxId / 2
    val dir = Files.createTempDirectory("compact-probe").toString
    val built = InvertedIndex.build(docs.where(col("doc_id") < cut),
      "doc_id", "text")
    IndexStore.writeInverted(built, dir)
    InvertedIndex.drop(built)
    val per = math.max(1L, (maxId - cut) / appends)
    (0 until appends).foreach { i =>
      val lo = cut + i * per
      val hi = if (i == appends - 1) maxId + 1 else cut + (i + 1) * per
      IndexStore.appendInverted(
        docs.where(col("doc_id") >= lo && col("doc_id") < hi),
        "doc_id", "text", dir)
    }
    def fileCount: Long = {
      val s = Files.walk(Paths.get(dir))
      try s.filter(p => Files.isRegularFile(p)).count() finally s.close()
    }
    def serveMin(): Double = (1 to passes).map { _ =>
      val t0 = System.nanoTime()
      InvertedIndex.bm25(IndexStore.loadInverted(spark, dir),
          Seq("spark", "window", "hash"), topK = 20)
        .write.format("noop").mode("overwrite").save()
      (System.nanoTime() - t0) / 1e9
    }.min
    val filesBefore = fileCount
    val serveBefore = serveMin()
    val tC = System.nanoTime()
    IndexStore.compact(spark, dir)
    val compactS = (System.nanoTime() - tC) / 1e9
    val filesAfter = fileCount
    val serveAfter = serveMin()
    println(f"""{"metric":"compact_probe","sf":"$sfDir","appends":$appends,"files_before":$filesBefore,"files_after":$filesAfter,"serve_before_s":$serveBefore%.3f,"serve_after_s":$serveAfter%.3f,"compact_s":$compactS%.2f}""")
    spark.stop()
  }
}
