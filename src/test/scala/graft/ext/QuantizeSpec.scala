package graft.ext

import org.apache.spark.sql.functions._

import graft.{SparkSpec, Tables}

/** int8 embedding quantization: range/zero contracts, reconstruction
  * error bounded by half a step, and cosine-ranking survival (the reason
  * the compression is usable for ANN). */
class QuantizeSpec extends SparkSpec {

  test("quantized values stay in [-127,127]; zero vectors quantize to zero") {
    import spark.implicits._
    val df = Seq(
      (1L, Array(0.5f, -1.0f, 0.25f)),
      (2L, Array(0.0f, 0.0f, 0.0f)),
      (3L, Array(127.0f, -127.0f, 1.0f))).toDF("id", "vec")
    val q = Quantize.int8(df, "vec").collect()
    q.foreach { r =>
      val arr = r.getSeq[Int](r.fieldIndex("q8"))
      assert(arr.forall(v => v >= -127 && v <= 127), arr.toString)
    }
    val zero = q.find(_.getLong(0) == 2L).get
    assert(zero.getSeq[Int](zero.fieldIndex("q8")) === Seq(0, 0, 0))
    assert(zero.getDouble(zero.fieldIndex("scale")) === 0d)
    // max-magnitude element maps to ±127 exactly
    val three = q.find(_.getLong(0) == 3L).get
    val a3 = three.getSeq[Int](three.fieldIndex("q8"))
    assert(a3(0) === 127 && a3(1) === -127)
  }

  test("reconstruction error is bounded by half a quantization step") {
    val emb = Tables.embeddings(spark, sf0001).limit(200)
    val q = Quantize.int8(emb, "embedding")
    val maxErr = q.select(max(array_max(zip_with(
      col("embedding"),
      Quantize.dequantize(col("q8"), col("scale")),
      (x, y) => abs(x - y))))).collect()(0).getDouble(0)
    val maxStep = q.select(max(col("scale"))).collect()(0).getDouble(0)
    assert(maxErr <= maxStep / 2 + 1e-9,
      s"max reconstruction error $maxErr exceeds half-step ${maxStep / 2}")
  }

  test("int8 cosine top-10 keeps >=0.9 recall vs exact float cosine") {
    import org.apache.spark.sql.expressions.Window
    val emb = Tables.embeddings(spark, sf0001)
    val probes = emb.limit(5)
      .select(col("vec_id").as("probe_id"), col("embedding").as("probe_vec"))
    // exact float ground truth
    def dotF(a: org.apache.spark.sql.Column, b: org.apache.spark.sql.Column) =
      aggregate(zip_with(a, b, (x, y) => (x * y).cast("double")),
        lit(0d), (acc, v) => acc + v)
    val exact = emb.crossJoin(broadcast(probes))
      .withColumn("score", dotF(col("embedding"), col("probe_vec")) /
        (sqrt(dotF(col("embedding"), col("embedding"))) *
         sqrt(dotF(col("probe_vec"), col("probe_vec")))))
      .withColumn("rk", row_number().over(
        Window.partitionBy(col("probe_id"))
          .orderBy(col("score").desc, col("vec_id"))))
      .filter(col("rk") <= 10)
      .select("probe_id", "vec_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet

    val qCorpus = Quantize.int8(emb, "embedding").select("vec_id", "q8")
    val qProbes = Quantize.int8(probes, "probe_vec")
      .select(col("probe_id"), col("q8").as("probe_q8"))
    val got = Quantize.bruteForceTopKQ8(
      qCorpus, "vec_id", "q8", qProbes, "probe_id", "probe_q8", 10)
      .select("probe_id", "vec_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet

    val recall = got.intersect(exact).size.toDouble / exact.size
    assert(recall >= 0.9, s"int8 recall $recall below 0.9")
  }
}
