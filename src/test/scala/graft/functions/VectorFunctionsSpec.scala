package graft.functions

import org.apache.spark.sql.functions._
import graft.{SparkSpec, Tables}

/** The native codegen'd vector expressions must be bit-identical to the
  * pure higher-order-function reference implementations — same left-fold
  * order, same formula shape — on real embedding data. */
class VectorFunctionsSpec extends SparkSpec {

  private lazy val pairs = {
    val e = Tables.embeddings(spark, sf0001)
      .select(col("vec_id"), col("embedding").cast("array<double>").as("v"))
    e.select(col("vec_id").as("ia"), col("v").as("va")).where(col("ia") < 40)
      .crossJoin(e.select(col("vec_id").as("ib"), col("v").as("vb")).where(col("ib").between(40, 80)))
  }

  test("dot / cosine / l2sq match the HOF reference bit-for-bit") {
    val diff = pairs.select(
        (VectorFunctions.dot(col("va"), col("vb")) =!= VectorFunctions.dotHof(col("va"), col("vb"))).as("d1"),
        (VectorFunctions.cosine(col("va"), col("vb")) =!= VectorFunctions.cosineHof(col("va"), col("vb"))).as("d2"),
        (VectorFunctions.l2Sq(col("va"), col("vb")) =!= VectorFunctions.l2SqHof(col("va"), col("vb"))).as("d3"))
      .where(col("d1") || col("d2") || col("d3"))
    assert(diff.count() === 0)
  }

  test("interpreted eval agrees with codegen (null-safe, unequal lengths)") {
    import spark.implicits._
    val df = Seq(
      (Seq(1.0, 2.0, 3.0), Seq(4.0, 5.0, 6.0)),
      (Seq(1.0), Seq(2.0, 3.0)),
      (Seq.empty[Double], Seq.empty[Double])).toDF("a", "b")
    val rows = df.select(
      VectorFunctions.dot(col("a"), col("b")).as("dot"),
      VectorFunctions.l2Sq(col("a"), col("b")).as("l2")).collect()
    assert(rows(0).getDouble(0) === 32.0)
    assert(rows(1).getDouble(0) === 2.0)   // min-length fold
    assert(rows(2).getDouble(0) === 0.0)
    assert(rows(0).getDouble(1) === 27.0)
    // top-level null propagates
    val n = df.select(VectorFunctions.dot(lit(null).cast("array<double>"), col("b"))).collect()
    assert(n.forall(_.isNullAt(0)))
  }
}
