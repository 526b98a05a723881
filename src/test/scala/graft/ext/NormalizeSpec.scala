package graft.ext

import org.apache.spark.sql.functions._
import graft.SparkSpec

class NormalizeSpec extends SparkSpec {

  test("normalizeText: NFC composition, control strip, whitespace collapse, trim") {
    val spark0 = spark
    import spark0.implicits._
    val df = Seq(
      "café time",                          // e + combining acute → é
      "abc",                          // C0 controls → spaces → collapse
      "  many   spaces\t\tand\nnewlines  ",
      "already clean").toDF("text")
    val out = df.select(TextAnalysis.normalizeText(col("text")).as("n"))
      .collect().map(_.getString(0))
    assert(out(0) === "caf\u00e9 time")
    assert(out(1) === "a b c")
    assert(out(2) === "many spaces and newlines")
    assert(out(3) === "already clean")
  }

  test("interpreted and codegen paths agree; null propagates") {
    val spark0 = spark
    import spark0.implicits._
    val df = Seq(Some("nó"), None).toDF("text")
    val rows = df.select(TextAnalysis.normalizeText(col("text"))).collect()
    assert(rows(0).getString(0) === "n\u00f3")
    assert(rows(1).isNullAt(0))
  }
}
