package graft.ext

import org.apache.spark.sql.functions._

import graft.SparkSpec

class KMeansSpec extends SparkSpec {
  import spark.implicits._

  /** 3 well-separated direction blobs on the unit sphere (deterministic). */
  private def blobs = {
    val rnd = new scala.util.Random(7)
    val centers = Seq(Seq(1.0, 0.0, 0.0), Seq(0.0, 1.0, 0.0), Seq(0.0, 0.0, 1.0))
    (0 until 90).map { i =>
      val c = centers(i % 3)
      (i.toLong, c.map(_ + rnd.nextGaussian() * 0.05))
    }.toDF("id", "vec")
  }

  test("fit recovers the blob structure and improves the objective over the sampled init") {
    val init = KMeans.fit(blobs, "id", "vec", k = 3, maxIter = 0)
    val trained = KMeans.fit(blobs, "id", "vec", k = 3, maxIter = 4)
    val objInit = KMeans.objective(blobs, "id", "vec", init)
    val objTrained = KMeans.objective(blobs, "id", "vec", trained)
    assert(trained.count() === 3)
    assert(objTrained >= objInit - 1e-9,
      s"Lloyd rounds worsened the objective: $objInit -> $objTrained")
    // separated blobs: trained centroids give near-perfect cohesion
    assert(objTrained > 0.95, s"objective $objTrained")
    // each blob maps to exactly one centroid
    val purity = KMeans.assign(blobs, "id", "vec", trained)
      .withColumn("blob", col("id") % 3)
      .groupBy("blob").agg(countDistinct(col("cid")).as("k"))
      .collect().map(_.getLong(1))
    assert(purity.forall(_ === 1L), purity.toSeq.toString)
  }

  test("centroids stay unit length and empty clusters survive a round") {
    // k = 5 over 3 tight blobs forces >= 2 empty/starved clusters
    val trained = KMeans.fit(blobs, "id", "vec", k = 5, maxIter = 3)
    assert(trained.count() === 5)
    val norms = trained.select(
      sqrt(aggregate(col("cv"), lit(0.0), (a, x) => a + x * x))).as[Double].collect()
    assert(norms.forall(n => math.abs(n - 1.0) < 1e-9), norms.toSeq.toString)
  }

  test("ivfTopKTrained searches Lloyd-trained lists and returns k exact-rescored results per probe") {
    val emb = graft.Tables.load(spark, sf0001, "embeddings")
    val probes = emb.limit(3)
      .select(col("vec_id").as("probe_id"), col("embedding").as("probe_vec"))
    val got = Similarity.ivfTopKTrained(emb, probes, "vec_id", "embedding",
      "probe_id", "probe_vec", k = 5, nCentroids = 8, nprobe = 3, lloydIters = 2)
    val perProbe = got.groupBy("probe_id").count()
      .collect().map(_.getLong(1))
    assert(perProbe.length === 3 && perProbe.forall(_ === 5L))
    val sims = got.select("cos_sim").as[Double].collect()
    assert(sims.forall(s => s >= -1.0 - 1e-9 && s <= 1.0 + 1e-9))
  }

  test("assign picks the cosine-nearest centroid") {
    val cs = Seq((0L, Seq(1.0, 0.0)), (1L, Seq(0.0, 1.0))).toDF("cid", "cv")
    val vs = Seq((10L, Seq(0.9, 0.1)), (11L, Seq(-0.1, 2.0))).toDF("id", "vec")
    val got = KMeans.assign(vs, "id", "vec", cs)
      .as[(Long, Long)].collect().toMap
    assert(got === Map(10L -> 0L, 11L -> 1L))
  }

  test("assignAgg ≡ assign on real vectors, including the smaller-cid tie-break") {
    val emb = graft.Tables.load(spark, sf0001, "embeddings")
    val centroids = KMeans.fit(emb, "vec_id", "embedding", k = 8, maxIter = 1)
    val viaWindow = KMeans.assign(emb, "vec_id", "embedding", centroids)
    val viaAgg = KMeans.assignAgg(emb, "vec_id", "embedding", centroids)
    assert(viaAgg.exceptAll(viaWindow).isEmpty &&
      viaWindow.exceptAll(viaAgg).isEmpty,
      "map-side-combined assignment must be the same operator")
    // explicit tie: two centroids equidistant from a vector → both forms
    // must deterministically pick the smaller cid
    val cs = Seq((5L, Seq(1.0, 0.0)), (2L, Seq(0.0, 1.0))).toDF("cid", "cv")
    val vs = Seq((10L, Seq(1.0, 1.0))).toDF("id", "vec")
    assert(KMeans.assignAgg(vs, "id", "vec", cs).head().getLong(1) === 2L)
    assert(KMeans.assign(vs, "id", "vec", cs).head().getLong(1) === 2L)
  }

  /** 100 well-separated blobs in 64 dims — k ≥ 64 exercises the
    * two-level (coarse-quantized) assignment path. */
  private def manyBlobs = {
    val rnd = new scala.util.Random(11)
    val centers = (0 until 100).map { c =>
      val v = Array.fill(64)(rnd.nextGaussian())
      val n = math.sqrt(v.map(x => x * x).sum)
      v.map(_ / n).toSeq
    }
    (0 until 1000).map { i =>
      val c = centers(i % 100)
      (i.toLong, c.map(_ + rnd.nextGaussian() * 0.01))
    }.toDF("id", "vec")
  }

  test("two-level assignment: total, deterministic, near-exact objective at large k") {
    val data = manyBlobs
    val centroids = KMeans.fitHashSeeded(data, "id", "vec", k = 100, maxIter = 1)
      .select(col("cid"), col("cv"))
    val exact = KMeans.assignAgg(data, "id", "vec", centroids)
    val two = KMeans.assignAggTwoLevel(data, "id", "vec", centroids, k = 100)
    // total: every point assigned exactly once, to a real centroid
    assert(two.count() === 1000L)
    assert(two.groupBy("id").count().where(col("count") > 1).isEmpty)
    assert(two.join(centroids, Seq("cid"), "left_anti").isEmpty)
    // deterministic
    val again = KMeans.assignAggTwoLevel(data, "id", "vec", centroids, k = 100)
    assert(two.exceptAll(again).isEmpty && again.exceptAll(two).isEmpty)
    // quality: mean cosine to the assigned centroid within 2% of exact
    def obj(a: org.apache.spark.sql.DataFrame): Double = a
      .join(data.select(col("id"), col("vec").cast("array<double>").as("__v")), Seq("id"))
      .join(broadcast(centroids), Seq("cid"))
      .agg(avg(graft.functions.VectorFunctions.cosine(col("__v"), col("cv"))))
      .head().getDouble(0)
    val (oe, ot) = (obj(exact), obj(two))
    assert(ot >= oe - 0.02, s"two-level objective $ot vs exact $oe")
    // and the auto switch routes large k to the two-level path, small k to exact
    val viaAuto = KMeans.assignAggAuto(data, "id", "vec", centroids, k = 100)
    assert(viaAuto.exceptAll(two).isEmpty && two.exceptAll(viaAuto).isEmpty)
  }

  test("fitHashSeeded: k centroids, deterministic, Lloyd improves the objective") {
    val k = 9
    val init = KMeans.fitHashSeeded(blobs, "id", "vec", k, maxIter = 0)
    val trained = KMeans.fitHashSeeded(blobs, "id", "vec", k, maxIter = 3)
    assert(init.count() === k && trained.count() === k)
    val objInit = KMeans.objective(blobs, "id", "vec", init)
    val objTrained = KMeans.objective(blobs, "id", "vec", trained)
    assert(objTrained >= objInit - 1e-9,
      s"Lloyd rounds worsened the objective: $objInit -> $objTrained")
    val again = KMeans.fitHashSeeded(blobs, "id", "vec", k, maxIter = 3)
    assert(trained.exceptAll(again).isEmpty && again.exceptAll(trained).isEmpty)
  }
}
