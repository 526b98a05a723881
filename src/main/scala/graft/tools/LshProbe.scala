package graft.tools

import org.apache.spark.sql.functions._

import graft.ext.{IndexStore, LshIndex}

/** One-off calibration probe for the stored-LSH serving paths (not a
  * gate): isolates the SEARCH cost of searchPruned / searchStored /
  * searchBucketed at a scaled dir — the q177/q187 gate entries cannot
  * show this split because both include the brute-force exact oracle
  * (corpus-linear by definition), which converges their totals at sf10.
  * `LshProbe <sfDir> [passes]`. */
object LshProbe {
  def main(args: Array[String]): Unit = {
    val d = args(0)
    val passes = args.lift(1).map(_.toInt).getOrElse(4)
    val spark = graft.GraftSession.local("lsh-probe")
    spark.sparkContext.setLogLevel("ERROR")
    val e = graft.Tables.load(spark, d, "embeddings")
    val probes = e.where(col("vec_id") < 5)
      .select(col("vec_id").as("probe_id"), col("embedding").as("pv"))
    val built = LshIndex.build(e, "vec_id", "embedding", tables = 8, dim = 64)
    val dir = java.nio.file.Files.createTempDirectory("lsh-probe").toString
    IndexStore.writeLsh(built, dir)
    IndexStore.writeLshVectors(e, "vec_id", "embedding", dir)
    IndexStore.writeLshBucketed(built, e, "vec_id", "embedding", dir + "b")
    IndexStore.writeLshBucketedQ8(built, e, "vec_id", "embedding", dir + "q")
    LshIndex.drop(built)
    val loaded = IndexStore.loadLsh(spark, dir)
    val vectors = IndexStore.loadLshVectors(spark, dir)
    val bucketed = IndexStore.loadLshBucketed(spark, dir + "b")
    val bucketedQ8 = IndexStore.loadLshBucketedQ8(spark, dir + "q")
    def time(name: String)(mk: => org.apache.spark.sql.DataFrame): Unit =
      (1 to passes).foreach { i =>
        val t0 = System.nanoTime()
        mk.write.format("noop").mode("overwrite").save()
        println(f"[lsh-probe] $name pass $i: ${(System.nanoTime() - t0) / 1e9}%.2f s")
      }
    time("searchPruned")(LshIndex.searchPruned(loaded, e, probes,
      "vec_id", "embedding", "probe_id", "pv", k = 10))
    time("searchStored")(LshIndex.searchStored(loaded, vectors, probes,
      "vec_id", "embedding", "probe_id", "pv", k = 10))
    time("searchBucketed")(LshIndex.searchBucketed(bucketed, probes,
      "vec_id", "embedding", "probe_id", "pv", k = 10))
    time("searchBucketedQ8")(LshIndex.searchBucketedQ8(bucketedQ8, probes,
      "vec_id", "embedding", "probe_id", "pv", k = 10))
    spark.stop()
  }
}
