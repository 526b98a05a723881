package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Decomposition probe for the iterative graph tier (r18 optimization):
  * times each phase of the PageRank/BFS/triangle pipelines separately so
  * the per-iteration vs prefix cost split is measurable, not guessed. */
object GraphProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def timed[T](label: String)(f: => T): T = {
      val t0 = System.nanoTime()
      val r = f
      println(f"[probe] $label: ${(System.nanoTime() - t0) / 1e9}%.2f s")
      r
    }

    def t(name: String) = graft.Tables.load(spark, sfDir, name)

    // warm-up
    t("orders").join(t("lineitem"), col("o_orderkey") === col("l_orderkey"))
      .groupBy("o_custkey").count().write.format("noop").mode("overwrite").save()

    (1 to 2).foreach { rep =>
      println(s"--- rep $rep ---")
      val g = timed("purchaseGraph build (lazy)") {
        graft.ext.PageRank.purchaseGraph(t("orders"), t("lineitem"))
      }
      val cp = t("orders").join(t("lineitem"),
          col("o_orderkey") === col("l_orderkey"))
        .select((col("o_custkey") * 2).as("src"),
          (col("l_partkey") * 2 + 1).as("dst"))
        .distinct()
      if (rep == 1) cp.explain("formatted")
      timed("cp join+distinct only (noop)") {
        cp.write.format("noop").mode("overwrite").save()
      }
      timed("purchaseGraph materialize (noop)") {
        g.write.format("noop").mode("overwrite").save()
      }
      // prefix decomposition of PageRank.run
      val e0 = timed("pr: e checkpoint") {
        g.select(col("src"), col("dst")).localCheckpoint()
      }
      val nodes0 = timed("pr: nodes distinct ckpt") {
        e0.select(col("src").as("id")).union(e0.select(col("dst").as("id")))
          .distinct().localCheckpoint()
      }
      timed("pr: nodes count")(nodes0.count())
      val outdeg0 = e0.groupBy("src").agg(count(lit(1)).as("outdeg"))
      val edgesW0 = timed("pr: edgesW join ckpt") {
        e0.join(outdeg0, "src").localCheckpoint()
      }
      val dang0 = timed("pr: dangling anti ckpt") {
        nodes0.join(outdeg0.select(col("src").as("id")), Seq("id"), "left_anti")
          .localCheckpoint()
      }
      timed("pr: dangling limit count")(dang0.limit(1).count())
      timed("pr: one iteration (noop)") {
        val ranks = nodes0.withColumn("ri", lit(1000000L)).localCheckpoint()
        val contribs = edgesW0
          .join(ranks.withColumnRenamed("id", "src"), "src")
          .select(col("dst"),
            expr("(2 * ri + outdeg) div (2 * outdeg)").as("c"))
          .groupBy("dst").agg(sum(col("c")).as("m"))
          .withColumnRenamed("dst", "id")
        nodes0.join(contribs, Seq("id"), "left")
          .select(col("id"), (lit(150000L) +
            expr("(85 * (coalesce(m, 0) + 0L) + 50) div 100")).as("ri"))
          .write.format("noop").mode("overwrite").save()
      }
      timed("pagerank iters=1") {
        graft.ext.PageRank.run(g, "src", "dst", iters = 1)
          .write.format("noop").mode("overwrite").save()
      }
      timed("pagerank iters=5") {
        graft.ext.PageRank.run(g, "src", "dst", iters = 5)
          .write.format("noop").mode("overwrite").save()
      }
      timed("bfs depth=4") {
        graft.ext.GraphAlgos.bfsDistances(g, "src", "dst", 2L, 4)
          .write.format("noop").mode("overwrite").save()
      }
      // triangle decomposition
      val m = t("orders").join(t("lineitem"),
          col("o_orderkey") === col("l_orderkey"))
        .select(col("o_custkey").as("basket"), col("l_partkey").as("item"))
      val edges = timed("cooccurrence pairCounts >=3 (lazy)") {
        graft.ext.CoOccurrence.pairCounts(m, "basket", "item", maxBasketSize = 60)
          .where(col("support") >= 3).select("item_a", "item_b")
      }
      timed("pairCounts materialize (noop)") {
        edges.write.format("noop").mode("overwrite").save()
      }
      timed("triangleCount total") {
        graft.ext.GraphAlgos.triangleCount(edges, "item_a", "item_b")
          .write.format("noop").mode("overwrite").save()
      }
    }
    spark.stop()
  }
}
