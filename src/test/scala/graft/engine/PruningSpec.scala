package graft.engine

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.{SparkSpec, Tables}

/** Manifest-level file skipping: the typed bound evaluator must be
  * fail-open everywhere, and scanAt must (a) return byte-identical rows
  * to the unpruned filter and (b) actually skip files when bounds prove
  * it can. */
class PruningSpec extends SparkSpec {

  import Pruning._

  private def fe(lower: Map[String, String], upper: Map[String, String]) =
    Manifests.FileEntry("f", 10L, 100L, lower, upper)

  private val schema = StructType(Seq(
    StructField("k", LongType), StructField("s", StringType),
    StructField("d", DateType), StructField("t", TimestampType),
    StructField("x", DoubleType), StructField("b", BinaryType)))

  test("bounds decide Eq/range/In over longs, strings, doubles") {
    val f = fe(Map("k" -> "100", "s" -> "mmm", "x" -> "1.5"),
               Map("k" -> "200", "s" -> "qqq", "x" -> "2.5"))
    assert(mayContain(f, schema, Eq("k", 150L)))
    assert(!mayContain(f, schema, Eq("k", 99)))   // Int literal vs long col
    assert(!mayContain(f, schema, Eq("k", 201L)))
    assert(mayContain(f, schema, Ge("k", 200L)) && !mayContain(f, schema, Gt("k", 200L)))
    assert(mayContain(f, schema, Le("k", 100L)) && !mayContain(f, schema, Lt("k", 100L)))
    assert(mayContain(f, schema, In("k", Seq(1L, 150L))))
    assert(!mayContain(f, schema, In("k", Seq(1L, 99L, 201L))))
    assert(mayContain(f, schema, Eq("s", "nnn")) && !mayContain(f, schema, Eq("s", "zzz")))
    assert(mayContain(f, schema, Gt("x", 2.0)) && !mayContain(f, schema, Gt("x", 2.5)))
  }

  test("dates and both timestamp stringifications parse and prune") {
    val f = fe(
      Map("d" -> "2024-03-01", "t" -> "2024-01-01T00:09:58.778549829"),
      Map("d" -> "2024-03-31", "t" -> "2024-01-30T23:26:16.220708106"))
    assert(mayContain(f, schema, Eq("d", java.sql.Date.valueOf("2024-03-15"))))
    assert(!mayContain(f, schema, Eq("d", java.sql.Date.valueOf("2024-04-01"))))
    assert(!mayContain(f, schema, Ge("d", "2024-04-01")))
    assert(mayContain(f, schema, Ge("t", java.sql.Timestamp.valueOf("2024-01-30 00:00:00"))))
    assert(!mayContain(f, schema, Ge("t", java.sql.Timestamp.valueOf("2024-01-31 00:00:00"))))
    assert(!mayContain(f, schema, Lt("t", "2024-01-01 00:00:00")))
    // Spark-written shape: RFC822 offset suffix
    val g = fe(Map("t" -> "2024-01-01T00:00:00.000000+0000"),
               Map("t" -> "2024-01-02T00:00:00.000000+0000"))
    assert(!mayContain(g, schema, Gt("t", "2024-01-02 00:00:00")))
    assert(mayContain(g, schema, Gt("t", "2024-01-01 12:00:00")))
  }

  test("fail-open: absent bounds, unknown column, unparsable bound, binary type") {
    val noStats = fe(Map.empty, Map.empty)
    assert(mayContain(noStats, schema, Eq("k", 5L)))
    val f = fe(Map("k" -> "100", "b" -> "0xDEAD"), Map("k" -> "200", "b" -> "0xFEED"))
    assert(mayContain(f, schema, Eq("nope", 1)))       // column not in schema
    assert(mayContain(f, schema, Eq("b", "anything"))) // binary: no domain
    val junk = fe(Map("k" -> "not-a-number"), Map("k" -> "also-not"))
    assert(mayContain(junk, schema, Eq("k", 5L)))
    // unnormalizable literal for a typed column: keep
    assert(mayContain(f, schema, Eq("k", new Object)))
  }

  test("scanAt skips files by range and returns exactly the unpruned rows") {
    val run = java.util.UUID.randomUUID().toString.take(8)
    val table = s"prune_ev_$run"
    // range-partition on event_id so files carry disjoint id ranges
    Tables.events(spark, sf0001)
      .repartitionByRange(4, col("event_id"))
      .write.saveAsTable(table)
    Layout.snapshot(spark, table, "v1")

    val preds = Seq(Ge("event_id", 0L), Le("event_id", 49L))
    val (total, kept) = Layout.scanAtFileCounts(spark, table, "v1", preds)
    assert(total === 4, s"expected 4 data files, saw $total")
    assert(kept < total, "id-range predicate must skip at least one file")

    val got = Layout.scanAt(spark, table, "v1", preds)
      .select("event_id", "event_type", "value").orderBy("event_id")
    val want = Layout.readAt(spark, table, "v1")
      .filter(col("event_id") >= 0L && col("event_id") <= 49L)
      .select("event_id", "event_type", "value").orderBy("event_id")
    assert(got.collect().toSeq === want.collect().toSeq)
    assert(got.count() === 50)
  }

  test("scanAt prunes on Spark-written timestamp bounds") {
    val run = java.util.UUID.randomUUID().toString.take(8)
    val table = s"prune_ts_$run"
    Tables.events(spark, sf0001)
      .repartitionByRange(4, col("ts"))
      .write.saveAsTable(table)
    Layout.snapshot(spark, table, "v1")
    val cut = java.sql.Timestamp.valueOf("2024-01-05 00:00:00")
    val preds = Seq(Le("ts", cut))
    val (total, kept) = Layout.scanAtFileCounts(spark, table, "v1", preds)
    assert(total === 4 && kept < total,
      s"timestamp bounds must prune ($kept/$total kept)")
    val got = Layout.scanAt(spark, table, "v1", preds).count()
    val want = Layout.readAt(spark, table, "v1").filter(col("ts") <= cut).count()
    assert(got === want && want > 0)
  }

  test("scanAt with an unprunable predicate keeps every file and still filters rows") {
    val run = java.util.UUID.randomUUID().toString.take(8)
    val table = s"prune_na_$run"
    Tables.events(spark, sf0001).repartition(3)
      .write.saveAsTable(table)
    Layout.snapshot(spark, table, "v1")
    // round-robin layout: every file spans the full value range → no skips
    val preds = Seq(Eq("event_type", "click"))
    val (total, kept) = Layout.scanAtFileCounts(spark, table, "v1", preds)
    assert(total === 3 && kept === 3)
    val got = Layout.scanAt(spark, table, "v1", preds).count()
    val want = Layout.readAt(spark, table, "v1")
      .filter(col("event_type") === "click").count()
    assert(got === want && want > 0)
  }
}
