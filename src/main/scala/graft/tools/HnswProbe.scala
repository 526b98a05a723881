package graft.tools

import org.apache.spark.sql.functions._

import graft.ext.{Hnsw, Similarity}

/** One-off calibration probe for the q219 recall floor (not a gate). */
object HnswProbe {
  def main(args: Array[String]): Unit = {
    val spark = graft.GraftSession.local("hnsw-probe")
    spark.sparkContext.setLogLevel("ERROR")
    for (d <- args.toSeq) {
      val e = graft.Tables.load(spark, d, "embeddings")
      val n = e.count()
      val shards = math.max(1L, n / 2048L).toInt
      val params = Hnsw.Params(m = 8, efConstruction = 64, efSearch = 48)
      val t0 = System.nanoTime()
      val g = Hnsw.build(e, "vec_id", "embedding", shards, params).cache()
      g.count()
      val t1 = System.nanoTime()
      val probes = e.where(col("vec_id") < 5)
        .select(col("vec_id").as("probe_id"), col("embedding").as("pv"))
      val ann = Hnsw.search(g, probes, "probe_id", "pv", 10, params)
      val exact = Similarity.bruteForceTopK(e, probes, "vec_id", "embedding",
        "probe_id", "pv", 10)
      val hits = ann.join(exact.select(col("probe_id"), col("vec_id")),
          Seq("probe_id", "vec_id"), "left_semi")
        .groupBy("probe_id").count().collect()
        .map(r => (r.getLong(0), r.getLong(1))).sortBy(_._1)
      val t2 = System.nanoTime()
      println(f"[probe] $d n=$n shards=$shards build=${(t1 - t0) / 1e9}%.1fs " +
        f"search+exact=${(t2 - t1) / 1e9}%.1fs hits=${hits.mkString(",")}")
      g.unpersist()
    }
    spark.stop()
  }
}
