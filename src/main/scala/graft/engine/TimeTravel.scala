package graft.engine

import org.apache.spark.sql.SparkSession

/** SQL-surface time travel (VERDICT r15 #4): the Nessie-versioned
  * catalog the reference configures (`/root/reference/compose/trino/
  * catalog/iceberg.properties:6`, `iceberg.nessie-catalog.ref=main`)
  * implies three ref-addressed read spellings a Trino/SQL-Lab user
  * types:
  *
  *   - `SELECT ... FROM tbl FOR VERSION AS OF 'tag'` — Trino's Iceberg
  *     time-travel clause; resolves through [[Layout.readAt]] (manifest
  *     file list + schema — no live-catalog dependency), registered as
  *     a temp view and substituted into the statement, so the rest of
  *     the query plans over the pinned snapshot like any relation.
  *   - `FROM tbl FOR TIMESTAMP AS OF '2026-01-01 00:00:00'` — the
  *     wall-clock variant; [[Layout.readAsOf]] resolves the LATEST
  *     committed snapshot at or before the instant (UTC — the engine's
  *     fixed session zone; bare dates and raw epoch-millis also parse).
  *   - `FROM "tbl@branch"` — the Nessie ref-qualified identifier;
  *     rewrites to the branch's writable fork table
  *     (`tbl__branch_branch`, [[Layout.createBranch]]'s registration).
  *
  * All rewrites are QUOTE-AWARE (occurrences inside single-quoted
  * string literals are data, not syntax) and strict: an unknown table,
  * tag, or pre-history instant fails loudly in [[Layout.readAt]]/
  * [[Layout.readAsOf]] — never a silent fallback to the live table,
  * which would hand a user CURRENT rows while they asked for pinned
  * ones. Statements without any spelling pass
  * through untouched (three regex probes). Plumbed into
  * [[Lakehouse.sql]], so the API plane AND the wire front
  * ([[StatementHttp]] routes through Lakehouse.sql) share one path. */
object TimeTravel {

  private val VersionRx =
    "(?i)([A-Za-z_][A-Za-z_0-9.]*)\\s+FOR\\s+VERSION\\s+AS\\s+OF\\s+'([^']*)'".r
  private val TimestampRx =
    "(?i)([A-Za-z_][A-Za-z_0-9.]*)\\s+FOR\\s+TIMESTAMP\\s+AS\\s+OF\\s+'([^']*)'".r
  private val BranchRx =
    "\"([A-Za-z_][A-Za-z_0-9.]*)@([A-Za-z_][A-Za-z_0-9]*)\"".r

  /** Parse a `FOR TIMESTAMP AS OF` literal to epoch millis: ISO-ish
    * `yyyy-MM-dd HH:mm:ss[.SSS]` (UTC — the engine's fixed session
    * zone), a bare date (midnight UTC), or raw epoch millis digits. */
  private def parseTs(s: String): Long = {
    val t = s.trim
    if (t.matches("\\d{13,}")) t.toLong
    else if (t.matches("\\d{4}-\\d{2}-\\d{2}"))
      java.time.LocalDate.parse(t).atStartOfDay(java.time.ZoneOffset.UTC)
        .toInstant.toEpochMilli
    else java.time.LocalDateTime.parse(t.replace(' ', 'T'))
      .toInstant(java.time.ZoneOffset.UTC).toEpochMilli
  }

  /** True when `pos` sits inside a single-quoted SQL literal of `s`
    * (Trino/Spark escape a quote by doubling it — `''` stays inside). */
  private def insideQuote(s: String, pos: Int): Boolean = {
    var i = 0
    var in = false
    while (i < pos && i < s.length) {
      if (s.charAt(i) == '\'') {
        if (in && i + 1 < s.length && s.charAt(i + 1) == '\'') i += 1
        else in = !in
      }
      i += 1
    }
    in
  }

  private def replaceOutsideQuotes(s: String, rx: scala.util.matching.Regex)(
      f: scala.util.matching.Regex.Match => String): String = {
    val out = new StringBuilder
    var last = 0
    rx.findAllMatchIn(s).foreach { m =>
      if (m.start >= last && !insideQuote(s, m.start)) {
        out ++= s.substring(last, m.start)
        out ++= f(m)
        last = m.end
      }
    }
    out ++= s.substring(last)
    out.toString
  }

  /** Rewrite both ref-addressed spellings; a no-op (same string) for
    * statements containing neither. Tagged reads materialize as temp
    * views named `__tt_<table>_<tag>` — deterministic, so repeated
    * reads of one tag reuse the registration. */
  def rewrite(spark: SparkSession, sql: String): String = {
    var s = sql
    if (s.indexOf('@') >= 0)
      s = replaceOutsideQuotes(s, BranchRx) { m =>
        s"${m.group(1)}__branch_${m.group(2)}"
      }
    if (VersionRx.findFirstIn(s).isDefined)
      s = replaceOutsideQuotes(s, VersionRx) { m =>
        val (table, tag) = (m.group(1), m.group(2))
        val view = ("__tt_" + table + "_" + tag).replaceAll("[^A-Za-z0-9_]", "_")
        Layout.readAt(spark, table, tag).createOrReplaceTempView(view)
        view
      }
    if (TimestampRx.findFirstIn(s).isDefined)
      s = replaceOutsideQuotes(s, TimestampRx) { m =>
        val (table, lit) = (m.group(1), m.group(2))
        val ms = parseTs(lit)
        val view = ("__ts_" + table + "_" + ms).replaceAll("[^A-Za-z0-9_]", "_")
        Layout.readAsOf(spark, table, ms).createOrReplaceTempView(view)
        view
      }
    s
  }
}
