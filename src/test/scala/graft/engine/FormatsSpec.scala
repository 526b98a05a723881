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

  test("declared-schema reads refuse nothing silently: unsupported format throws") {
    intercept[IllegalArgumentException](
      Formats.read(spark, "/tmp/nope", "avro", Tables.nation(spark, sf0001).schema))
  }
}
