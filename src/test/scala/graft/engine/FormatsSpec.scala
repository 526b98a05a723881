package graft.engine

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.{SparkSpec, Tables}

/** Formats: every supported format round-trips the same rows under a
  * declared schema; compression codecs actually apply. */
class FormatsSpec extends SparkSpec {

  test("parquet/orc/csv/json round-trip identical typed rows") {
    // long + double + string + timestamp exercises the typing every format
    // must survive without inference
    val src = Tables.lineitem(spark, sf0001)
      .select("l_orderkey", "l_quantity", "l_returnflag", "l_shipdate")
      .limit(500)
    val schema = src.schema
    def canon(df: org.apache.spark.sql.DataFrame) =
      df.select(col("l_orderkey"), col("l_quantity"), col("l_returnflag"),
          col("l_shipdate").cast("string").as("ship_s"))
        .collect().map(_.toSeq).sortBy(_.toString).toSeq

    val expected = canon(src)
    Formats.supported.foreach { fmt =>
      val dir = Files.createTempDirectory(s"fmt_$fmt").toString
      Formats.write(src, dir, fmt)
      val back = Formats.read(spark, dir, fmt, schema)
      assert(back.schema === schema, s"$fmt schema drift")
      assert(canon(back) === expected, s"$fmt rows drift")
    }
  }

  test("compression codecs apply on disk and stay reader-invisible") {
    val src = Tables.nation(spark, sf0001)
    val schema = src.schema
    Seq("parquet" -> "zstd", "parquet" -> "snappy", "orc" -> "zstd",
        "csv" -> "gzip", "json" -> "gzip").foreach { case (fmt, codec) =>
      val dir = Files.createTempDirectory(s"fmt_${fmt}_$codec")
      Formats.write(src, dir.toString, fmt, Some(codec))
      val files = Files.list(dir).iterator()
      val names = scala.jdk.CollectionConverters.IteratorHasAsScala(files)
        .asScala.map(_.getFileName.toString).filterNot(_.startsWith("_")).toSeq
      val marker = if (codec == "gzip") ".gz" else s".$codec"
      assert(names.exists(_.contains(marker)),
        s"$fmt+$codec produced no $marker files: $names")
      assert(Formats.read(spark, dir.toString, fmt, schema).count() === src.count())
    }
  }

  test("malformed rows: permissive quarantines, dropmalformed drops, failfast aborts") {
    import org.apache.spark.sql.types._
    val dir = Files.createTempDirectory("fmt_bad").toString
    // 2 good JSON lines + 1 structurally broken one
    java.nio.file.Files.write(java.nio.file.Paths.get(dir, "data.json"),
      java.util.Arrays.asList(
        """{"id": 1, "v": 10.5}""",
        """{"id": 2, "v": """,
        """{"id": 3, "v": 7.0}"""))
    val schema = StructType(Seq(
      StructField("id", LongType), StructField("v", DoubleType)))

    // cache first: Spark refuses corrupt-column-only queries on raw files
    val quarantined = Formats.readWithPolicy(spark, dir, "json", schema, "permissive").cache()
    try {
      assert(quarantined.count() === 3)
      val bad = quarantined.filter(col("_corrupt_record").isNotNull)
      assert(bad.count() === 1 && bad.collect()(0).getAs[Any]("id") == null)
    } finally quarantined.unpersist()

    val dropped = Formats.readWithPolicy(spark, dir, "json", schema, "dropmalformed")
    assert(dropped.select("id").collect().map(_.getLong(0)).sorted.toSeq === Seq(1L, 3L))

    val failing = Formats.readWithPolicy(spark, dir, "json", schema, "failfast")
    intercept[org.apache.spark.SparkException](failing.collect())

    intercept[IllegalArgumentException](
      Formats.readWithPolicy(spark, dir, "parquet", schema, "permissive"))
    intercept[IllegalArgumentException](
      Formats.readWithPolicy(spark, dir, "json", schema, "whatever"))
  }

  test("declared-schema reads refuse nothing silently: unsupported format throws") {
    intercept[IllegalArgumentException](
      Formats.read(spark, "/tmp/nope", "avro", Tables.nation(spark, sf0001).schema))
  }
}
