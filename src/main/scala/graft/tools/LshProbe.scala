package graft.tools

import org.apache.spark.sql.functions._

import graft.ext.{IndexStore, LshIndex}

/** One-off calibration probe for the stored-LSH serving paths (not a
  * gate): isolates the SEARCH cost of searchPruned / searchStored /
  * searchBucketed / searchBucketedQ8 at a scaled dir — the q177/q187
  * gate entries cannot show this split because both include the
  * brute-force exact oracle (corpus-linear by definition), which
  * converges their totals at sf10.
  *
  * `LshProbe <sfDir> [passes] [legs] [bundleRoot]`
  *   - `legs`: comma list from {pruned, stored, bucketed, bucketedq8,
  *     bq, ivfbq}; default = the four LSH legs (`bq`/`ivfbq` — the N15
  *     binary-quantized bundle and its N16 IVF-routed composition,
  *     [[graft.ext.BqIndex]] — are opt-in: no shared LSH state; ivfbq
  *     sizes its list count ~√N/4 capped at 256 and probes a CONSTANT
  *     nprobe = min(8, lists) — per-probe candidates ~ nprobe·√N,
  *     sub-linear; a fixed probed FRACTION would re-linearize them,
  *     the protocol mistake BASELINE §Round 14 records). One leg per
  *     invocation + a page-cache drop between
  *     invocations is how the COLD points of the two-decade table are
  *     measured (a single multi-leg run warms the FS cache for every
  *     later leg).
  *   - `bundleRoot`: persistent dir — bundles are built only when their
  *     meta is absent, so repeated single-leg invocations don't re-pay
  *     the 2M-vector build.
  */
object LshProbe {
  def main(args: Array[String]): Unit = {
    val d = args(0)
    val passes = args.lift(1).map(_.toInt).getOrElse(4)
    val legs = args.lift(2).filterNot(_ == "all")
      .map(_.split(",").map(_.trim.toLowerCase).toSet)
      .getOrElse(Set("pruned", "stored", "bucketed", "bucketedq8"))
    val root = args.lift(3).getOrElse(
      java.nio.file.Files.createTempDirectory("lsh-probe").toString)
    val spark = graft.GraftSession.local("lsh-probe")
    spark.sparkContext.setLogLevel("ERROR")
    val e = graft.Tables.load(spark, d, "embeddings")
    val probes = e.where(col("vec_id") < 5)
      .select(col("vec_id").as("probe_id"), col("embedding").as("pv"))
    val dir = s"$root/plain"
    def missing(p: String): Boolean =
      !java.nio.file.Files.exists(java.nio.file.Paths.get(p, "meta.json"))
    // the BQ bundle needs no LSH build at all (data-independent
    // signatures) — its write is one map-only pass
    if (legs("bq") && missing(s"$root/bq")) {
      IndexStore.writeBq(e, "vec_id", "embedding", dim = 64, s"$root/bq")
      println(s"[lsh-probe] bq bundle ready under $root/bq")
    }
    if (legs("ivfbq") && missing(s"$root/ivfbq")) {
      // centroid count scales with the corpus (√N capped) so the probed
      // fraction stays comparable across decade dirs
      val n = graft.engine.TableStats.rowCountNoJob(e)
      val k = math.max(8, math.min(256, math.sqrt(n.toDouble).toInt / 4))
      IndexStore.writeIvfBq(e, "vec_id", "embedding", dim = 64,
        nCentroids = k, lloydIters = 2, s"$root/ivfbq")
      println(s"[lsh-probe] ivfbq bundle ready under $root/ivfbq ($k lists)")
    }
    if ((legs -- Set("bq", "ivfbq")).nonEmpty &&
        (missing(dir) || missing(dir + "b") || missing(dir + "q"))) {
      val built = LshIndex.build(e, "vec_id", "embedding", tables = 8, dim = 64)
      if (missing(dir)) {
        IndexStore.writeLsh(built, dir)
        IndexStore.writeLshVectors(e, "vec_id", "embedding", dir)
      }
      if (missing(dir + "b"))
        IndexStore.writeLshBucketed(built, e, "vec_id", "embedding", dir + "b")
      if (missing(dir + "q"))
        IndexStore.writeLshBucketedQ8(built, e, "vec_id", "embedding", dir + "q")
      LshIndex.drop(built)
      println(s"[lsh-probe] bundles ready under $root")
    }
    def time(name: String)(mk: => org.apache.spark.sql.DataFrame): Unit =
      (1 to passes).foreach { i =>
        val t0 = System.nanoTime()
        mk.write.format("noop").mode("overwrite").save()
        println(f"[lsh-probe] $name pass $i: ${(System.nanoTime() - t0) / 1e9}%.2f s")
      }
    if (legs("pruned")) {
      val loaded = IndexStore.loadLsh(spark, dir)
      time("searchPruned")(LshIndex.searchPruned(loaded, e, probes,
        "vec_id", "embedding", "probe_id", "pv", k = 10))
    }
    if (legs("stored")) {
      val loaded = IndexStore.loadLsh(spark, dir)
      val vectors = IndexStore.loadLshVectors(spark, dir)
      time("searchStored")(LshIndex.searchStored(loaded, vectors, probes,
        "vec_id", "embedding", "probe_id", "pv", k = 10))
    }
    if (legs("bucketed")) {
      val bucketed = IndexStore.loadLshBucketed(spark, dir + "b")
      time("searchBucketed")(LshIndex.searchBucketed(bucketed, probes,
        "vec_id", "embedding", "probe_id", "pv", k = 10))
    }
    if (legs("bucketedq8")) {
      val bucketedQ8 = IndexStore.loadLshBucketedQ8(spark, dir + "q")
      time("searchBucketedQ8")(LshIndex.searchBucketedQ8(bucketedQ8, probes,
        "vec_id", "embedding", "probe_id", "pv", k = 10))
    }
    if (legs("bq")) {
      val bq = IndexStore.loadBq(spark, s"$root/bq")
      time("searchBq")(graft.ext.BqIndex.searchStored(bq, probes,
        "vec_id", "embedding", "probe_id", "pv", k = 10, rerankFactor = 4))
    }
    if (legs("ivfbq")) {
      val rb = IndexStore.loadIvfBq(spark, s"$root/ivfbq")
      val lists = rb.centroids.count().toInt
      // CONSTANT nprobe over √N-scaled lists = per-probe candidates
      // ~ nprobe·√N — the sub-linear shortlist the composition exists
      // for (a fixed probed FRACTION would re-linearize candidates)
      val nprobe = math.min(8, lists)
      time(s"searchIvfBq(nprobe=$nprobe/$lists)")(
        graft.ext.BqIndex.searchRouted(rb, probes, "vec_id", "embedding",
          "probe_id", "pv", k = 10, nprobe = nprobe, rerankFactor = 4))
    }
    spark.stop()
  }
}
