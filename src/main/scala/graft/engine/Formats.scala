package graft.engine

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.types.StructType

/** Source/sink format matrix. The reference stack stores Parquet
  * (`/root/reference/compose/trino/catalog/iceberg.properties:18`) and
  * delivers CSV (`compose/seed.sh:9`); a working lakehouse additionally
  * ingests whatever lands — ORC from legacy Hive pipelines, JSON/CSV from
  * services. All reads take a DECLARED schema: at 100 TB schema inference
  * is a full extra pass over the data (and CSV/JSON inference is
  * type-lossy), so it is simply not offered here — mirroring the
  * reference's "no inference anywhere" discipline (SURVEY.md §1.3).
  *
  * Codec is a storage-level choice (zstd ≈ gzip-class ratio at snappy-class
  * read cost — usually the right default for cold data at scale); it's a
  * write option, invisible to readers.
  */
object Formats {

  val supported: Seq[String] = Seq("parquet", "orc", "csv", "json")

  /** Write `df` at `path` in `format`, optionally compressed with `codec`
    * (e.g. zstd/snappy/gzip for parquet+orc; gzip/bzip2 for text forms). */
  def write(df: DataFrame, path: String, format: String,
            codec: Option[String] = None): Unit = {
    require(supported.contains(format), s"unsupported format $format")
    val w = df.write.mode(SaveMode.Overwrite).format(format)
    val withCodec = codec.fold(w)(c => w.option("compression", c))
    // CSV needs a header to survive a schema-only round-trip of column order
    (if (format == "csv") withCodec.option("header", "true") else withCodec)
      .save(path)
  }

  /** Read `path` as `format` with the declared `schema` — never inferred. */
  def read(spark: SparkSession, path: String, format: String,
           schema: StructType): DataFrame = {
    require(supported.contains(format), s"unsupported format $format")
    val r = spark.read.format(format).schema(schema)
    (if (format == "csv") r.option("header", "true") else r).load(path)
  }

  /** Read semi-structured text (csv/json) with an explicit MALFORMED-ROW
    * policy — at ingest scale bad records are a fact, and the policy must
    * be a stated choice, never a default:
    *   - "permissive": bad rows survive with null fields and the raw text
    *     captured in `_corrupt_record` (quarantine-and-continue);
    *   - "dropmalformed": bad rows are silently dropped (count the gap!);
    *   - "failfast": the batch aborts on the first bad row.
    * The corrupt-record column is appended here so callers always have
    * the quarantine channel under "permissive". */
  def readWithPolicy(spark: SparkSession, path: String, format: String,
      schema: StructType, mode: String): DataFrame = {
    require(Seq("csv", "json").contains(format),
      s"malformed-row policies apply to text formats, not $format")
    require(Seq("permissive", "dropmalformed", "failfast").contains(mode.toLowerCase),
      s"unknown malformed-row policy $mode")
    val withCorrupt = schema.add("_corrupt_record", "string")
    val r = spark.read.format(format)
      .schema(if (mode.equalsIgnoreCase("permissive")) withCorrupt else schema)
      .option("mode", mode.toUpperCase)
      .option("columnNameOfCorruptRecord", "_corrupt_record")
    (if (format == "csv") r.option("header", "true") else r).load(path)
  }
}
