package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables

/** Round-18 declared queries: plain SQL row-level DML and snapshot
  * rollback (VERDICT r17 "What's missing" #1/#2 — `DELETE FROM` /
  * `UPDATE ... SET` → [[graft.engine.DmlSql]] →
  * [[graft.engine.Layout.deleteWhere]]/[[graft.engine.Layout.updateWhere]],
  * and `ALTER TABLE ... EXECUTE rollback_to_snapshot` →
  * [[graft.engine.Layout.assignHead]] + a content-restore commit), each
  * driven through [[graft.engine.Lakehouse.sql]] — the same text a wire
  * client POSTs. All three statements MUTATE their target, so the
  * fixture rebuilds per call in the untimed `setup` phase and the
  * oracle recomputes the post-statement state from the raw events
  * parquet with set algebra. */
object Round18Queries {

  private def t(s: SparkSession, d: String, n: String): DataFrame = Tables.load(s, d, n)

  private def fresh(p: String): String =
    p + java.util.UUID.randomUUID().toString.replace("-", "").take(8)

  private def eventsTable(s: SparkSession, d: String, name: String): Unit =
    t(s, d, "events").select(col("event_id"), col("event_type"), col("value"))
      .where(col("event_id") < 600).write.saveAsTable(name)

  /** Q269 (L28, SQL DELETE): `DELETE FROM t WHERE event_id % 7 = 0`
    * through the SQL plane, then the surviving state aggregated. The
    * oracle recomputes survivors from the raw parquet — the gate pins
    * BOTH that the doomed rows went and that every other row is
    * byte-identical (id sums + exact DECIMAL value sums per group). */
  val q269 = GQuery("q269_delete_sql", (s, d) => {
    import graft.engine.Lakehouse
    val table = Fixtures.get[String](s"q269:$d")
    Lakehouse.sql(s, s"DELETE FROM $table WHERE event_id % 7 = 0").collect()
    Lakehouse.sql(s,
      s"""SELECT event_type, count(*) AS n,
         |  CAST(sum(event_id) AS BIGINT) AS id_sum,
         |  round(sum(CAST(value AS DECIMAL(18,2))), 2) AS sum_value
         |FROM $table GROUP BY event_type ORDER BY event_type""".stripMargin)
      .withColumn("sum_value", col("sum_value").cast("double"))
  },
    Some("""SELECT event_type, count(*)::BIGINT AS n,
           |  CAST(sum(event_id) AS BIGINT) AS id_sum,
           |  round(CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE), 2) AS sum_value
           |FROM events WHERE event_id < 600 AND event_id % 7 <> 0
           |GROUP BY event_type ORDER BY event_type""".stripMargin),
    setup = Some((s, d) => {
      val table = fresh("delsql_")
      eventsTable(s, d, table)
      Fixtures.put(s"q269:$d", table)
    }))

  /** Q270 (L28, SQL UPDATE): `UPDATE t SET ... WHERE event_id % 5 = 0`
    * — a string rewrite plus an arithmetic assignment on the DOUBLE
    * column (`value + 1` is the same IEEE op in Spark and DuckDB, and
    * the aggregate casts per-row to DECIMAL so the sum is
    * order-independent exact). Rows outside the predicate must come
    * back byte-identical; the type-preserving CAST discipline keeps
    * `value` DOUBLE through the copy-on-write rewrite. */
  val q270 = GQuery("q270_update_sql", (s, d) => {
    import graft.engine.Lakehouse
    val table = Fixtures.get[String](s"q270:$d")
    Lakehouse.sql(s,
      s"UPDATE $table SET event_type = concat(event_type, '_x'), " +
        "value = value + 1 WHERE event_id % 5 = 0").collect()
    Lakehouse.sql(s,
      s"""SELECT event_type, count(*) AS n,
         |  CAST(sum(event_id) AS BIGINT) AS id_sum,
         |  round(sum(CAST(value AS DECIMAL(18,2))), 2) AS sum_value
         |FROM $table GROUP BY event_type ORDER BY event_type""".stripMargin)
      .withColumn("sum_value", col("sum_value").cast("double"))
  },
    Some("""WITH updated AS (
           |  SELECT event_id,
           |    CASE WHEN event_id % 5 = 0 THEN event_type || '_x'
           |         ELSE event_type END AS event_type,
           |    CASE WHEN event_id % 5 = 0 THEN value + 1
           |         ELSE value END AS value
           |  FROM events WHERE event_id < 600)
           |SELECT event_type, count(*)::BIGINT AS n,
           |  CAST(sum(event_id) AS BIGINT) AS id_sum,
           |  round(CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE), 2) AS sum_value
           |FROM updated GROUP BY event_type ORDER BY event_type""".stripMargin),
    setup = Some((s, d) => {
      val table = fresh("updsql_")
      eventsTable(s, d, table)
      Fixtures.put(s"q270:$d", table)
    }))

  /** Q271 (L29, SQL snapshot rollback): base commit (< 300), append
    * (300–599), COW delete-rewrite — then
    * `ALTER TABLE t EXECUTE rollback_to_snapshot(<base seq>)` must
    * bring the PLAIN SQL plane back to exactly the base state (the
    * pointer swap governs the manifest plane; the restore commit makes
    * every raw reader correct). The oracle recomputes the base state
    * from the raw parquet, so a rollback that leaked any later commit's
    * rows — or dropped any base row — hash-fails. */
  val q271 = GQuery("q271_rollback_sql", (s, d) => {
    import graft.engine.Lakehouse
    val (table, baseSeq) = Fixtures.get[(String, Long)](s"q271:$d")
    Lakehouse.sql(s,
      s"ALTER TABLE $table EXECUTE rollback_to_snapshot($baseSeq)").collect()
    Lakehouse.sql(s,
      s"""SELECT event_type, count(*) AS n,
         |  CAST(sum(event_id) AS BIGINT) AS id_sum
         |FROM $table GROUP BY event_type ORDER BY event_type""".stripMargin)
  },
    Some("""SELECT event_type, count(*)::BIGINT AS n,
           |  CAST(sum(event_id) AS BIGINT) AS id_sum
           |FROM events WHERE event_id < 300
           |GROUP BY event_type ORDER BY event_type""".stripMargin),
    setup = Some((s, d) => {
      import graft.engine.{Layout, Manifests}
      val table = fresh("rbsql_")
      val ev = t(s, d, "events")
        .select(col("event_id"), col("event_type"), col("value"))
      ev.where(col("event_id") < 300).write.saveAsTable(table)
      Layout.snapshot(s, table, "base")
      ev.where(col("event_id") >= 300 && col("event_id") < 600)
        .write.mode("append").saveAsTable(table)
      Layout.snapshot(s, table, "grown")
      Layout.deleteWhere(s, table, col("event_id") % 7 === 0)
      val baseSeq = Manifests.loadRefs(Manifests.root(s, table)).tags("base")
      Fixtures.put(s"q271:$d", (table, baseSeq))
    }))

  /** Q272 (L31, SQL column DDL): `RENAME COLUMN` then `DROP COLUMN`
    * through the SQL plane — both refused natively by Spark's v1
    * catalog, executed here as COW commits — then the surviving
    * two-column state aggregated under the RENAMED name. The oracle
    * recomputes from the raw parquet, so a rename that dropped rows, a
    * drop that touched the wrong column, or a rewrite that reordered
    * values into the wrong rows all hash-fail. */
  val q272 = GQuery("q272_column_ddl_sql", (s, d) => {
    import graft.engine.Lakehouse
    val table = Fixtures.get[String](s"q272:$d")
    Lakehouse.sql(s,
      s"ALTER TABLE $table RENAME COLUMN event_type TO etype").collect()
    Lakehouse.sql(s, s"ALTER TABLE $table DROP COLUMN value").collect()
    Lakehouse.sql(s,
      s"""SELECT etype, count(*) AS n,
         |  CAST(sum(event_id) AS BIGINT) AS id_sum
         |FROM $table GROUP BY etype ORDER BY etype""".stripMargin)
  },
    Some("""SELECT event_type AS etype, count(*)::BIGINT AS n,
           |  CAST(sum(event_id) AS BIGINT) AS id_sum
           |FROM events WHERE event_id < 600
           |GROUP BY event_type ORDER BY etype""".stripMargin),
    setup = Some((s, d) => {
      val table = fresh("ddlsql_")
      eventsTable(s, d, table)
      Fixtures.put(s"q272:$d", table)
    }))

  /** Q273 (L30, INSERT OVERWRITE interception): the statement Spark
    * would execute as an in-place file delete routes through the COW
    * commit instead — the query's result (survivors under an id bound,
    * values doubled) replaces the table, then the state aggregates.
    * The oracle recomputes the overwritten state from raw parquet, so
    * a position-misresolved column, a dropped cast, or any leaked
    * pre-overwrite row hash-fails. */
  val q273 = GQuery("q273_insert_overwrite_sql", (s, d) => {
    import graft.engine.Lakehouse
    val table = Fixtures.get[String](s"q273:$d")
    Lakehouse.sql(s,
      s"INSERT OVERWRITE TABLE $table " +
        s"SELECT event_id, event_type, value * 2 FROM $table " +
        "WHERE event_id < 300").collect()
    Lakehouse.sql(s,
      s"""SELECT event_type, count(*) AS n,
         |  CAST(sum(event_id) AS BIGINT) AS id_sum,
         |  round(sum(CAST(value AS DECIMAL(18,2))), 2) AS sum_value
         |FROM $table GROUP BY event_type ORDER BY event_type""".stripMargin)
      .withColumn("sum_value", col("sum_value").cast("double"))
  },
    Some("""SELECT event_type, count(*)::BIGINT AS n,
           |  CAST(sum(event_id) AS BIGINT) AS id_sum,
           |  round(CAST(sum(CAST(value * 2 AS DECIMAL(18,2))) AS DOUBLE), 2) AS sum_value
           |FROM events WHERE event_id < 300
           |GROUP BY event_type ORDER BY event_type""".stripMargin),
    setup = Some((s, d) => {
      val table = fresh("iowsql_")
      eventsTable(s, d, table)
      Fixtures.put(s"q273:$d", table)
    }))

  /** Q274 (L26″, full-sync MERGE): all FOUR clause kinds in one
    * statement — matched UPDATE, unmatched-by-target INSERT,
    * unmatched-by-source DELETE — the one-statement table sync.
    * After the merge the target must be exactly the source's key set
    * with matched rows updated; the oracle recomputes that state by
    * set algebra from raw parquet, so a leaked unmatched-by-source
    * row, a dropped matched row, or a misapplied clause hash-fails. */
  val q274 = GQuery("q274_merge_full_sync_sql", (s, d) => {
    import graft.engine.Lakehouse
    val (table, src) = Fixtures.get[(String, String)](s"q274:$d")
    Lakehouse.sql(s,
      s"""MERGE INTO $table AS t USING $src AS s ON t.event_id = s.event_id
         |WHEN MATCHED THEN UPDATE SET event_type = concat(s.event_type, '_m')
         |WHEN NOT MATCHED THEN INSERT (event_id, event_type, value)
         |  VALUES (s.event_id, concat(s.event_type, '_i'), s.value)
         |WHEN NOT MATCHED BY SOURCE THEN DELETE""".stripMargin).collect()
    Lakehouse.sql(s,
      s"""SELECT event_type, count(*) AS n,
         |  CAST(sum(event_id) AS BIGINT) AS id_sum,
         |  round(sum(CAST(value AS DECIMAL(18,2))), 2) AS sum_value
         |FROM $table GROUP BY event_type ORDER BY event_type""".stripMargin)
      .withColumn("sum_value", col("sum_value").cast("double"))
  },
    Some("""WITH merged AS (
           |  SELECT event_id, event_type || '_m' AS event_type, value
           |  FROM events WHERE event_id >= 200 AND event_id < 400
           |  UNION ALL
           |  SELECT event_id, event_type || '_i', value
           |  FROM events WHERE event_id >= 400 AND event_id < 600)
           |SELECT event_type, count(*)::BIGINT AS n,
           |  CAST(sum(event_id) AS BIGINT) AS id_sum,
           |  round(CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE), 2) AS sum_value
           |FROM merged GROUP BY event_type ORDER BY event_type""".stripMargin),
    setup = Some((s, d) => {
      val table = fresh("fsync_")
      val src = fresh("fsrc_")
      val ev = t(s, d, "events")
        .select(col("event_id"), col("event_type"), col("value"))
      ev.where(col("event_id") < 400).write.saveAsTable(table)
      ev.where(col("event_id") >= 200 && col("event_id") < 600)
        .write.saveAsTable(src)
      Fixtures.put(s"q274:$d", (table, src))
    }))

  /** Q275 (L31′, ref DDL + branch read): `CREATE TAG` pins the base
    * commit, the table grows and rewrites, then `CREATE BRANCH ... AS
    * OF VERSION <base>` forks the pinned history and the branch reads
    * back through the `` `t@branch` `` spelling — the
    * reproduce-from-history workflow in pure SQL. The oracle recomputes
    * the base state from raw parquet, so a fork that leaked any later
    * commit's rows (or dropped base rows) hash-fails. */
  val q275 = GQuery("q275_branch_ddl_sql", (s, d) => {
    import graft.engine.Lakehouse
    val (table, baseSeq) = Fixtures.get[(String, Long)](s"q275:$d")
    val branch = fresh("repro_")
    Lakehouse.sql(s,
      s"ALTER TABLE $table CREATE BRANCH $branch AS OF VERSION $baseSeq")
      .collect()
    Lakehouse.sql(s,
      s"""SELECT event_type, count(*) AS n,
         |  CAST(sum(event_id) AS BIGINT) AS id_sum
         |FROM `$table@$branch`
         |GROUP BY event_type ORDER BY event_type""".stripMargin)
  },
    Some("""SELECT event_type, count(*)::BIGINT AS n,
           |  CAST(sum(event_id) AS BIGINT) AS id_sum
           |FROM events WHERE event_id < 300
           |GROUP BY event_type ORDER BY event_type""".stripMargin),
    setup = Some((s, d) => {
      import graft.engine.{Lakehouse, Manifests}
      val table = fresh("brddl_")
      val ev = t(s, d, "events")
        .select(col("event_id"), col("event_type"), col("value"))
      ev.where(col("event_id") < 300).write.saveAsTable(table)
      Lakehouse.sql(s, s"ALTER TABLE $table CREATE TAG base").collect()
      ev.where(col("event_id") >= 300 && col("event_id") < 600)
        .write.mode("append").saveAsTable(table)
      Lakehouse.sql(s, s"DELETE FROM $table WHERE event_id % 7 = 0").collect()
      val baseSeq = Manifests.loadRefs(Manifests.root(s, table)).tags("base")
      Fixtures.put(s"q275:$d", (table, baseSeq))
    }))

  val all: Seq[GQuery] = Seq(q269, q270, q271, q272, q273, q274, q275)
}
