package graft.ext

import graft.SparkSpec
import org.apache.spark.sql.functions._

class KmvSpec extends SparkSpec {
  import spark.implicits._

  private def phrase(words: Seq[String]) = words.mkString(" ")
  // Two groups over a controlled shingle universe: identical halves,
  // disjoint halves, and a known-overlap mix.
  private def docsOf(pairs: (String, String)*) = pairs.toSeq.toDF("grp", "text")

  test("identical sets estimate Jaccard 1, disjoint sets 0") {
    val same = docsOf(
      "a" -> phrase((1 to 40).map(i => s"tok$i")),
      "b" -> phrase((1 to 40).map(i => s"tok$i")))
    val r1 = Kmv.jaccardContract(same, "grp", "text", "a",
      shingleK = 3, k = 16, tol = 0.01).head()
    assert(r1.getAs[Double]("exact_jaccard") === 1.0)
    assert(r1.getAs[Boolean]("est_ok"))

    val disjoint = docsOf(
      "a" -> phrase((1 to 40).map(i => s"left$i")),
      "b" -> phrase((1 to 40).map(i => s"right$i")))
    val r2 = Kmv.jaccardContract(disjoint, "grp", "text", "a",
      shingleK = 3, k = 16, tol = 0.01).head()
    assert(r2.getAs[Double]("exact_jaccard") === 0.0)
    assert(r2.getAs[Boolean]("est_ok"))
  }

  test("estimate lands within tolerance of a known half-overlap") {
    // a: tokens 1..60, b: tokens 31..90 — shingle overlap ≈ (30-2)/(90-2+30-2... )
    val mix = docsOf(
      "a" -> phrase((1 to 60).map(i => s"tok$i")),
      "b" -> phrase((31 to 90).map(i => s"tok$i")))
    val r = Kmv.jaccardContract(mix, "grp", "text", "a",
      shingleK = 3, k = 32, tol = 0.25).head()
    val exact = r.getAs[Double]("exact_jaccard")
    assert(exact > 0.15 && exact < 0.45)
    assert(r.getAs[Boolean]("est_ok"))
  }

  test("k_actual short of k fails the contract rather than silently passing") {
    // union has far fewer than k distinct shingles -> k_actual < k -> est_ok false
    val tiny = docsOf("a" -> "x y z w", "b" -> "x y z w")
    val r = Kmv.jaccardContract(tiny, "grp", "text", "a",
      shingleK = 3, k = 64, tol = 1.0).head()
    assert(!r.getAs[Boolean]("est_ok"))
  }

  test("documents-table contract holds at the gate SF") {
    val docs = graft.Tables.documents(spark, sf0001)
      .withColumn("grp", when(length(col("source")) === 4, "a").otherwise("b"))
    val r = Kmv.jaccardContract(docs, "grp", "text", "a",
      shingleK = 3, k = 256, tol = 0.12).head()
    assert(r.getAs[Boolean]("est_ok"))
    assert(r.getAs[Long]("k") === 256L)
  }
}
