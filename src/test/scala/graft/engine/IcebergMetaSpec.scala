package graft.engine

import java.nio.file.{Files, Paths}

import scala.jdk.CollectionConverters._

import org.apache.avro.generic.{GenericData, GenericRecord}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import com.fasterxml.jackson.databind.ObjectMapper

import graft.{SparkSpec, Tables}

/** Walks the emitted Iceberg v2 metadata with INDEPENDENT parsers —
  * jackson for `vN.metadata.json`, the stock Avro generic reader for
  * manifest lists and manifests — and pins one serialized-record byte
  * vector per Avro schema, so the on-wire layout can't drift silently. */
class IcebergMetaSpec extends SparkSpec {

  private val mapper = new ObjectMapper()

  private def freshTable(prefix: String): String = {
    val t = s"${prefix}_${java.util.UUID.randomUUID().toString.take(8)}"
    Tables.events(spark, sf0001)
      .select("event_id", "event_type", "value").repartition(4)
      .write.saveAsTable(t)
    t
  }

  test("emitted metadata walks: schemas, snapshots, refs, per-file stats") {
    val t = freshTable("iceberg_emit")
    Layout.snapshot(spark, t, "t0")                       // commit 0 (tag)
    Layout.deleteWhereMor(spark, t, col("event_id") < 50L) // commit 1 (+delete files)
    val metaPath = IcebergMeta.emit(spark, t)
    assert(Files.exists(metaPath))

    // ---- vN.metadata.json through jackson
    val root = mapper.readTree(Files.readAllBytes(metaPath))
    assert(root.get("format-version").asInt() === 2)
    assert(root.get("table-uuid").asText().length === 36)
    val schemas = root.get("schemas")
    assert(schemas.size() >= 1)
    val schema0 = schemas.get(0)
    assert(schema0.get("schema-id").asInt() === 0)
    val fieldNames = (0 until schema0.get("fields").size())
      .map(i => schema0.get("fields").get(i))
    assert(fieldNames.map(_.get("name").asText()) ===
      Seq("event_id", "event_type", "value"))
    // ids are 1-based, unique, and last-column-id covers them
    val ids = fieldNames.map(_.get("id").asInt())
    assert(ids === Seq(1, 2, 3))
    assert(root.get("last-column-id").asInt() >= ids.max)
    assert(root.get("current-schema-id").asInt() ===
      root.get("snapshots").get(root.get("snapshots").size() - 1)
        .get("schema-id").asInt())

    val snapshots = (0 until root.get("snapshots").size())
      .map(root.get("snapshots").get(_))
    assert(snapshots.size === 2)
    assert(snapshots.map(_.get("sequence-number").asLong()) === Seq(0L, 1L))
    assert(snapshots(1).get("parent-snapshot-id").asLong() === 0L)
    assert(snapshots(1).get("summary").get("operation").asText() === "delete")
    assert(root.get("current-snapshot-id").asLong() ===
      snapshots.last.get("snapshot-id").asLong())
    val refs = root.get("refs")
    assert(refs.get("main").get("type").asText() === "branch")
    assert(refs.get("t0").get("type").asText() === "tag")
    assert(refs.get("t0").get("snapshot-id").asLong() === 0L)

    // ---- every snapshot's manifest list through the stock Avro reader
    snapshots.foreach { sn =>
      val listPath = Paths.get(sn.get("manifest-list").asText())
      assert(Files.exists(listPath), s"missing manifest list $listPath")
      val (schema, meta, records) = IcebergMeta.readAvro(listPath)
      assert(meta("format-version") === "2")
      assert(meta("snapshot-id") === sn.get("snapshot-id").asLong().toString)
      // spec field ids survive the avro round trip
      assert(schema.getField("manifest_path").getObjectProp("field-id") === 500)
      assert(schema.getField("sequence_number").getObjectProp("field-id") === 515)
      records.foreach { r =>
        val mPath = Paths.get(r.get("manifest_path").toString)
        assert(Files.exists(mPath))
        assert(r.get("manifest_length").asInstanceOf[Long] === Files.size(mPath))
        assert(Seq(0, 1).contains(r.get("content").asInstanceOf[Int]))
      }
    }

    // ---- head snapshot's manifests: data + deletes, stats present
    val headList = Paths.get(snapshots.last.get("manifest-list").asText())
    val (_, _, manifests) = IcebergMeta.readAvro(headList)
    assert(manifests.map(_.get("content").asInstanceOf[Int]).sorted === Seq(0, 1))
    val dataManifest = manifests.find(_.get("content") == 0).get
    val (eSchema, eMeta, entries) =
      IcebergMeta.readAvro(Paths.get(dataManifest.get("manifest_path").toString))
    assert(eMeta("format-version") === "2" && eMeta("content") === "data")
    // the embedded schema is the Iceberg JSON form with ids
    val embedded = mapper.readTree(eMeta("schema"))
    assert(embedded.get("fields").get(0).get("id").asInt() === 1)
    assert(eSchema.getField("data_file").schema()
      .getField("file_path").getObjectProp("field-id") === 100)
    assert(entries.nonEmpty)
    entries.foreach { e =>
      val df = e.get("data_file").asInstanceOf[GenericRecord]
      assert(Files.exists(Paths.get(df.get("file_path").toString)))
      assert(df.get("record_count").asInstanceOf[Long] > 0L)
      assert(df.get("file_format").toString === "PARQUET")
      // per-file bounds made it through typed encoding (event_id: long)
      val lower = df.get("lower_bounds").asInstanceOf[GenericData.Array[_]]
      assert(lower != null && lower.size() > 0, "lower bounds must be present")
      val keys = lower.asScala.map(_.asInstanceOf[GenericRecord]
        .get("key").asInstanceOf[Int]).toSet
      assert(keys.subsetOf(Set(1, 2, 3)))
    }
    // delete manifest carries the positional-delete file
    val delManifest = manifests.find(_.get("content") == 1).get
    val (_, dMeta, dEntries) =
      IcebergMeta.readAvro(Paths.get(delManifest.get("manifest_path").toString))
    assert(dMeta("content") === "deletes")
    assert(dEntries.nonEmpty)
    dEntries.foreach { e =>
      val df = e.get("data_file").asInstanceOf[GenericRecord]
      assert(df.get("content").asInstanceOf[Int] === 1) // position deletes
    }
  }

  test("open() reconstructs full MOR table state from Iceberg files alone") {
    val t = freshTable("iceberg_open")
    Layout.snapshot(spark, t, "t0")                          // seq 0
    Layout.deleteWhereMor(spark, t, col("event_id") % 3 === 0L) // seq 1 (+pos deletes)
    val updates = Tables.events(spark, sf0001)
      .select("event_id", "event_type", "value")
      .where(col("event_id") < 20L)
      .withColumn("value", col("value") * 10.0)
    Layout.upsertMor(spark, t, updates, "event_id")          // seq 2 (+eq deletes)
    IcebergMeta.emit(spark, t)

    // current state: version-hint → metadata.json → avro manifests →
    // parquet + replayed v2 delete semantics, no graft JSON consulted
    val viaIceberg = IcebergMeta.open(spark, t)
      .orderBy("event_id").collect()
    val viaGraft = Layout.readCurrent(spark, t)
      .orderBy("event_id").collect()
    assert(viaIceberg.length === viaGraft.length)
    assert(viaIceberg === viaGraft,
      "Iceberg-metadata read must equal the native MOR read, row for row")
    // the MOR semantics actually bit: upserted keys carry the ×10 value
    val original = Tables.events(spark, sf0001)
      .select("event_id", "value").where(col("event_id") < 20L)
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    val upserted = viaIceberg.filter(_.getLong(0) < 20L)
    assert(upserted.nonEmpty)
    upserted.foreach(r =>
      assert(r.getDouble(2) === original(r.getLong(0)) * 10.0,
        s"event ${r.getLong(0)} must carry the upserted value"))

    // time travel by snapshot id: seq 0 = the pre-delete tag
    val atZero = IcebergMeta.open(spark, t, snapshotId = 0L)
      .orderBy("event_id").collect()
    val tagged = Layout.readAt(spark, t, "t0")
      .orderBy("event_id").collect()
    assert(atZero === tagged)

    // unknown snapshot refuses loudly
    val err = intercept[IllegalArgumentException] {
      IcebergMeta.open(spark, t, snapshotId = 999L)
    }
    assert(err.getMessage.contains("999"))
  }

  test("sparkSchema inverts icebergSchema on nested types") {
    val st = StructType(Seq(
      StructField("id", LongType, nullable = false),
      StructField("name", StringType),
      StructField("tags", ArrayType(StringType, containsNull = false)),
      StructField("attrs", MapType(StringType, DoubleType)),
      StructField("nested", StructType(Seq(
        StructField("a", IntegerType),
        StructField("b", DecimalType(12, 2), nullable = false))))))
    val (node, fieldIds, _) = IcebergMeta.icebergSchema(st, 0)
    val (back, idToName) = IcebergMeta.sparkSchema(node)
    assert(back === st)
    assert(idToName === fieldIds.map(_.swap))
  }

  test("bound encoding follows the spec's single-value serialization") {
    def hex(b: Array[Byte]) = b.map("%02x".format(_)).mkString
    // little-endian numerics
    assert(hex(IcebergMeta.boundBytes(LongType, "1").get) === "0100000000000000")
    assert(hex(IcebergMeta.boundBytes(IntegerType, "-2").get) === "feffffff")
    assert(hex(IcebergMeta.boundBytes(DoubleType, "1.0").get) === "000000000000f03f")
    // strings are UTF-8
    assert(IcebergMeta.boundBytes(StringType, "ab").get === "ab".getBytes("UTF-8"))
    // date: days from epoch as int4 (1970-01-02 = day 1)
    assert(hex(IcebergMeta.boundBytes(DateType, "1970-01-02").get) === "01000000")
    // decimal: minimal big-endian unscaled (12.30 scale 2 → 1230)
    assert(hex(IcebergMeta.boundBytes(DecimalType(9, 2), "12.30").get) === "04ce")
    // unparseable stats yield no bound, never a wrong one
    assert(IcebergMeta.boundBytes(LongType, "garbage").isEmpty)
  }

  test("pinned byte-layout vectors for both Avro schemas") {
    def hex(b: Array[Byte]) = b.map("%02x".format(_)).mkString
    val list = new GenericData.Record(IcebergMeta.manifestListSchema)
    list.put("manifest_path", "m.avro")
    list.put("manifest_length", 100L)
    list.put("partition_spec_id", 0)
    list.put("content", 0)
    list.put("sequence_number", 1L)
    list.put("min_sequence_number", 1L)
    list.put("added_snapshot_id", 1L)
    list.put("added_files_count", 2)
    list.put("existing_files_count", 0)
    list.put("deleted_files_count", 0)
    list.put("added_rows_count", 10L)
    list.put("existing_rows_count", 0L)
    list.put("deleted_rows_count", 0L)
    // string "m.avro" (len 6) | 100 | 0 | 0 | 1 | 1 | 1 | 2 | 0 | 0 | 10 | 0 | 0
    // — avro zigzag varints throughout
    assert(hex(IcebergMeta.recordBytes(IcebergMeta.manifestListSchema, list)) ===
      "0c" + hex("m.avro".getBytes("UTF-8")) +
        "c801" + "00" + "00" + "02" + "02" + "02" + "04" + "00" + "00" + "14" + "00" + "00")

    val entrySchema = IcebergMeta.manifestEntrySchema
    val dfSchema = entrySchema.getField("data_file").schema()
    val entry = new GenericData.Record(entrySchema)
    entry.put("status", 1)
    entry.put("snapshot_id", 7L)
    entry.put("sequence_number", 3L)
    entry.put("file_sequence_number", 3L)
    val df = new GenericData.Record(dfSchema)
    df.put("content", 0)
    df.put("file_path", "f.parquet")
    df.put("file_format", "PARQUET")
    df.put("partition", new GenericData.Record(dfSchema.getField("partition").schema()))
    df.put("record_count", 5L)
    df.put("file_size_in_bytes", 9L)
    entry.put("data_file", df)
    // status 1 | union(long) 7 | union(long) 3 | union(long) 3 |
    // data_file: content 0 | "f.parquet" | "PARQUET" | (empty partition) |
    // 5 | 9 | null lower | null upper | null equality_ids
    assert(hex(IcebergMeta.recordBytes(entrySchema, entry)) ===
      "02" + "02" + "0e" + "02" + "06" + "02" + "06" +
        "00" + "12" + hex("f.parquet".getBytes("UTF-8")) +
        "0e" + hex("PARQUET".getBytes("UTF-8")) +
        "0a" + "12" + "00" + "00" + "00")
  }
}
