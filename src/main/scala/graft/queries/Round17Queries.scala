package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables

/** Round-17 declared queries: the SQL-surfaced CDC feed and MERGE INTO
  * (VERDICT r16 #2/#4 — `TABLE(system.table_changes(...))` →
  * [[graft.engine.Layout.changelog]] and `MERGE INTO` →
  * [[graft.engine.MergeSql]], both reaching the Layout machinery from
  * pure SQL text through [[graft.engine.Lakehouse.sql]]). Fixtures are
  * per-run UUID tables built from the events parquet, so the oracle
  * recomputes every change row / merged row from raw data.
  *
  * Round-18 restructure (VERDICT r17 #4): fixture construction moved
  * to the `setup` phase, which Bench runs UNTIMED — the recorded
  * seconds price the query body (the CDC scan / the merge), not the
  * fixture's create+snapshot+commit lifecycle. Read-only fixtures
  * (q266/q268) build once per dataset; the mutating merge fixture
  * (q267) rebuilds per call because the statement consumes it. */
object Round17Queries {

  private def t(s: SparkSession, d: String, n: String): DataFrame = Tables.load(s, d, n)

  private def fresh(p: String): String =
    p + java.util.UUID.randomUUID().toString.replace("-", "").take(8)

  /** Q266 (L24, SQL CDC feed): the append-matrix fixture the round-16
    * brief asked for — base commit (< 300), append commit (300–599),
    * then a COPY-ON-WRITE delete-rewrite (event_id % 7 = 0 erased) —
    * read back through the Trino spelling `TABLE(system.table_changes(
    * 'default', t, <from>, <to>))`. The commit-grain contract gates
    * exactly: ordinal 0 inserts the appended rows; ordinal 1 is the
    * honest COW degradation (every pre-delete row deletes, every
    * survivor re-inserts — Iceberg's changelog after a rewrite); the
    * trailing tag commit contributes NOTHING (same files → empty step).
    * The oracle recomputes all three generators from the raw parquet.
    * Scale note: each generator reads only the step's CHANGED files,
    * resolved driver-side from manifest set-diffs — O(changed data),
    * never a table scan. */
  private def q266Setup(s: SparkSession, d: String): Unit = {
    import graft.engine.{Layout, Manifests}
    val key = s"q266:$d"
    if (Fixtures.has(key)) {
      val (table, _, _) = Fixtures.get[(String, Long, Long)](key)
      if (s.catalog.tableExists(table)) return
    }
    val table = fresh("cdcsql_")
    val ev = t(s, d, "events").select(col("event_id"), col("event_type"), col("value"))
    ev.where(col("event_id") < 300).write.saveAsTable(table)
    Layout.snapshot(s, table, "c0")
    ev.where(col("event_id") >= 300 && col("event_id") < 600)
      .write.mode("append").saveAsTable(table)
    Layout.snapshot(s, table, "c1")
    Layout.deleteWhere(s, table, col("event_id") % 7 === 0)
    Layout.snapshot(s, table, "c2")
    val refs = Manifests.loadRefs(Manifests.root(s, table))
    Fixtures.put(key, (table, refs.tags("c0"), refs.tags("c2")))
  }

  val q266 = GQuery("q266_table_changes_sql", (s, d) => {
    import graft.engine.Lakehouse
    val (table, from, to) = Fixtures.get[(String, Long, Long)](s"q266:$d")
    Lakehouse.sql(s,
      s"""SELECT _change_type, _change_ordinal, count(*) AS n,
         |  CAST(sum(event_id) AS BIGINT) AS id_sum
         |FROM TABLE(system.table_changes('default', '$table', $from, $to))
         |GROUP BY _change_type, _change_ordinal
         |ORDER BY _change_ordinal, _change_type""".stripMargin)
  },
    Some("""WITH ch AS (
           |  SELECT 'insert' AS _change_type, 0 AS _change_ordinal, event_id
           |  FROM events WHERE event_id >= 300 AND event_id < 600
           |  UNION ALL
           |  SELECT 'delete', 1, event_id FROM events WHERE event_id < 600
           |  UNION ALL
           |  SELECT 'insert', 1, event_id
           |  FROM events WHERE event_id < 600 AND event_id % 7 <> 0)
           |SELECT _change_type, _change_ordinal, count(*)::BIGINT AS n,
           |  CAST(sum(event_id) AS BIGINT) AS id_sum
           |FROM ch GROUP BY _change_type, _change_ordinal
           |ORDER BY _change_ordinal, _change_type""".stripMargin),
    setup = Some(q266Setup))

  /** Q267 (L26, SQL MERGE INTO): the idempotent-upsert fixture —
    * target = events < 400, source = events 200–599, all three clause
    * kinds in ONE statement with the standard's TEXTUAL-order rule
    * live: matched multiples-of-10 DELETE (the earlier clause wins),
    * other matched rows UPDATE (event_type suffixed `_u`), unmatched
    * source rows INSERT (suffixed `_i`). No float arithmetic in the
    * merge law (values copy verbatim), so the oracle recomputes the
    * merged state exactly from set algebra over the raw parquet. The
    * statement goes through [[graft.engine.Lakehouse.sql]] — the same
    * text a wire client POSTs. The fixture rebuilds per call (the
    * merge consumes its target), but UNTIMED in Bench's setup phase. */
  private def q267Setup(s: SparkSession, d: String): Unit = {
    val table = fresh("mgsql_")
    val src = fresh("mgsrc_")
    val ev = t(s, d, "events").select(col("event_id"), col("event_type"), col("value"))
    ev.where(col("event_id") < 400).write.saveAsTable(table)
    ev.where(col("event_id") >= 200 && col("event_id") < 600)
      .write.saveAsTable(src)
    Fixtures.put(s"q267:$d", (table, src))
  }

  val q267 = GQuery("q267_merge_into_sql", (s, d) => {
    import graft.engine.Lakehouse
    val (table, src) = Fixtures.get[(String, String)](s"q267:$d")
    Lakehouse.sql(s,
      s"""MERGE INTO $table AS t USING $src AS s ON t.event_id = s.event_id
         |WHEN MATCHED AND s.event_id % 10 = 0 THEN DELETE
         |WHEN MATCHED THEN UPDATE SET event_type = concat(s.event_type, '_u')
         |WHEN NOT MATCHED THEN INSERT (event_id, event_type, value)
         |  VALUES (s.event_id, concat(s.event_type, '_i'), s.value)"""
        .stripMargin).collect()
    Lakehouse.sql(s,
      s"""SELECT event_type, count(*) AS n,
         |  CAST(sum(event_id) AS BIGINT) AS id_sum,
         |  round(sum(CAST(value AS DECIMAL(18,2))), 2) AS sum_value
         |FROM $table GROUP BY event_type ORDER BY event_type""".stripMargin)
      .withColumn("sum_value", col("sum_value").cast("double"))
  },
    Some("""WITH merged AS (
           |  SELECT event_id, event_type, value
           |  FROM events WHERE event_id < 200
           |  UNION ALL
           |  SELECT event_id, event_type || '_u', value
           |  FROM events
           |  WHERE event_id >= 200 AND event_id < 400 AND event_id % 10 <> 0
           |  UNION ALL
           |  SELECT event_id, event_type || '_i', value
           |  FROM events WHERE event_id >= 400 AND event_id < 600)
           |SELECT event_type, count(*)::BIGINT AS n,
           |  CAST(sum(event_id) AS BIGINT) AS id_sum,
           |  round(CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE), 2) AS sum_value
           |FROM merged GROUP BY event_type ORDER BY event_type""".stripMargin),
    setup = Some(q267Setup))

  /** Q268 (L27, Iceberg metadata tables from SQL): the `$snapshots`
    * inspection relation — `SELECT ... FROM `t$snapshots`` (the wire's
    * Trino `"t$snapshots"` requotes to this) answered from the manifest
    * store. The gate pins the MANIFEST-RECORDED record counts of two
    * commits (base < 300, base+append < 600) against DuckDB counting
    * the raw parquet — the stats the snapshot rows carry must equal
    * the data they claim to describe. snapshot_id/committed_at are
    * engine-internal (non-deterministic across runs) and stay out of
    * the projection; MetaSqlSpec pins the paste-into-FOR-VERSION
    * workflow on them instead. */
  private def q268Setup(s: SparkSession, d: String): Unit = {
    import graft.engine.Layout
    val key = s"q268:$d"
    if (Fixtures.has(key) &&
      s.catalog.tableExists(Fixtures.get[String](key))) return
    val table = fresh("metasql_")
    val ev = t(s, d, "events").select(col("event_id"), col("event_type"), col("value"))
    ev.where(col("event_id") < 300).write.saveAsTable(table)
    Layout.snapshot(s, table, "m1")
    ev.where(col("event_id") >= 300 && col("event_id") < 600)
      .write.mode("append").saveAsTable(table)
    Layout.snapshot(s, table, "m2")
    Fixtures.put(key, table)
  }

  val q268 = GQuery("q268_meta_snapshots_sql", (s, d) => {
    import graft.engine.Lakehouse
    val table = Fixtures.get[String](s"q268:$d")
    Lakehouse.sql(s,
      s"""SELECT operation, record_count
         |FROM `$table$$snapshots`
         |WHERE operation = 'snapshot'
         |ORDER BY record_count""".stripMargin)
  },
    Some("""SELECT 'snapshot' AS operation, count(*)::BIGINT AS record_count
           |FROM events WHERE event_id < 300
           |UNION ALL
           |SELECT 'snapshot', count(*)::BIGINT
           |FROM events WHERE event_id < 600
           |ORDER BY record_count""".stripMargin),
    setup = Some(q268Setup))

  val all: Seq[GQuery] = Seq(q266, q267, q268)
}
