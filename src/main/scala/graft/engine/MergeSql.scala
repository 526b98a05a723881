package graft.engine

import org.apache.spark.sql.{DataFrame, SparkSession}

/** SQL-surface `MERGE INTO` — the statement a Trino/Iceberg user types
  * (Trino docs `sql/merge`; the upsert idiom the reference's lakehouse
  * tier implies) landed on the [[Layout]] commit machinery. Spark's v1
  * parquet catalog refuses MERGE natively ("MERGE INTO TABLE is not
  * supported temporarily"), so the statement is parsed here and
  * EXECUTED as one declarative plan + one copy-on-write commit —
  * the [[TimeTravel]]/[[TableFunctions]] rewrite discipline, applied to
  * a whole command.
  *
  * Supported shape (the standard's core; each clause optional, at most
  * one of each, evaluated in TEXTUAL order like the standard requires):
  *
  *   MERGE INTO t [AS a] USING s|(subquery) [AS b] ON <cond>
  *     [WHEN MATCHED [AND c1] THEN UPDATE SET x = e1, ...]
  *     [WHEN MATCHED [AND c2] THEN DELETE]
  *     [WHEN NOT MATCHED [AND c3] THEN INSERT [(cols)] VALUES (...)]
  *
  * Plan shape — Spark-first, no row-at-a-time anything:
  *
  *   - kept/updated target rows: ONE left join target⟕source on the ON
  *     condition, per-column `CASE WHEN <clause predicate> THEN expr
  *     ELSE old END`, delete-clause rows filtered in the same pass;
  *   - inserted rows: one LEFT ANTI join source⟂target;
  *   - the union commits through [[Layout.overwrite]], so MERGE
  *     composes with tags/branches/time travel like every other write.
  *
  * The SQL standard's cardinality rule is ENFORCED: a target row
  * matching more than one source row refuses loudly (a silent
  * first-match would make results depend on join order — wrong answers
  * at any scale). The check is one aggregate over the matched pairs —
  * the same key-shuffle grain as the merge join itself.
  *
  * Scale: both joins shuffle on the ON keys once (broadcast when the
  * source is small — AQE decides); the rewrite is copy-on-write like
  * [[Layout.merge]]. Affected-row counts (Trino's MERGE result) cost
  * one extra aggregate over the same join.
  *
  * Why SQL MERGE is COW and not the O(batch) MOR path: the engine owns
  * a merge-on-read upsert ([[Layout.upsertMor]] — equality-delete keys
  * + appended rows, one commit, no table rewrite), but its result is
  * only visible through manifest-aware reads (readCurrent/scanAt/
  * morDeltas); a plain `SELECT * FROM t` at the SQL plane scans raw
  * files and would see BOTH versions of every upserted key. Routing the
  * statement there would silently change what the very next SELECT
  * returns. So the SQL plane keeps copy-on-write semantics (every
  * reader correct, Iceberg's COW mode), and the hot-ingest path uses
  * upsertMor at the API plane where readers are manifest-aware — the
  * same COW-for-BI / MOR-for-ingest split production lakehouses run. */
object MergeSql {

  private final case class Matched(cond: Option[String], isDelete: Boolean,
      assignments: Seq[(String, String)])
  private final case class NotMatched(cond: Option[String],
      cols: Seq[String], values: Seq[String])

  private val HeadRx = "(?is)^\\s*MERGE\\s+INTO\\s+".r

  /** Execute the statement if it IS a MERGE INTO; None otherwise. */
  def maybeExecute(spark: SparkSession, sql: String): Option[DataFrame] =
    if (HeadRx.findFirstIn(sql).isEmpty) None
    else Some(execute(spark, sql))

  // ------------------------------------------------------------ scanning
  // Minimal quote-aware scanning over the statement text: single quotes
  // (data), backticks and double quotes (identifiers/strings depending
  // on dialect) are all opaque; parens tracked for top-level keyword
  // detection. No full SQL grammar — expressions pass through verbatim
  // to Spark's parser, which owns their semantics.

  private def isWordChar(c: Char) = c.isLetterOrDigit || c == '_'

  /** Index of case-insensitive keyword `word` at or after `from`, at
    * paren depth 0, outside quotes, AND outside `CASE ... END`
    * expressions — a merge assignment like `SET x = CASE WHEN c THEN 1
    * ELSE 2 END` must not have its inner WHEN mistaken for a clause
    * boundary (that split mangled the statement); -1 if absent. */
  private def topLevelKeyword(s: String, word: String, from: Int): Int = {
    var i = from
    var depth = 0
    var caseDepth = 0
    var quote: Char = 0
    def kwAt(j: Int, w: String): Boolean =
      s.regionMatches(true, j, w, 0, w.length) &&
        (j == 0 || !isWordChar(s.charAt(j - 1))) &&
        (j + w.length >= s.length || !isWordChar(s.charAt(j + w.length)))
    while (i < s.length) {
      val c = s.charAt(i)
      if (quote != 0) {
        if (c == quote) {
          if (i + 1 < s.length && s.charAt(i + 1) == quote) i += 1
          else quote = 0
        }
        i += 1
      } else c match {
        case '\'' | '"' | '`' => quote = c; i += 1
        case '(' => depth += 1; i += 1
        case ')' => depth -= 1; i += 1
        case _ =>
          if (depth == 0 && kwAt(i, "CASE")) { caseDepth += 1; i += 4 }
          else if (depth == 0 && caseDepth > 0 && kwAt(i, "END")) {
            caseDepth -= 1; i += 3
          } else if (depth == 0 && caseDepth == 0 && kwAt(i, word)) return i
          else i += 1
      }
    }
    -1
  }

  /** Split on top-level commas (quote- and paren-aware). */
  private def splitTop(s: String): Seq[String] = {
    val out = Seq.newBuilder[String]
    val cur = new StringBuilder
    var depth = 0
    var quote: Char = 0
    var i = 0
    while (i < s.length) {
      val c = s.charAt(i)
      if (quote != 0) {
        cur += c
        if (c == quote) {
          if (i + 1 < s.length && s.charAt(i + 1) == quote) { cur += c; i += 1 }
          else quote = 0
        }
      } else c match {
        case '\'' | '"' | '`' => cur += c; quote = c
        case '(' => depth += 1; cur += c
        case ')' => depth -= 1; cur += c
        case ',' if depth == 0 => out += cur.toString.trim; cur.clear()
        case other => cur += other
      }
      i += 1
    }
    val last = cur.toString.trim
    if (last.nonEmpty) out += last
    out.result()
  }

  /** Consume a balanced parenthesized span starting at `open` (which
    * must be '('); returns the index AFTER the closing paren. */
  private def balancedParen(s: String, open: Int): Int = {
    var i = open
    var depth = 0
    var quote: Char = 0
    while (i < s.length) {
      val c = s.charAt(i)
      if (quote != 0) {
        if (c == quote) {
          if (i + 1 < s.length && s.charAt(i + 1) == quote) i += 1
          else quote = 0
        }
      } else c match {
        case '\'' | '"' | '`' => quote = c
        case '(' => depth += 1
        case ')' =>
          depth -= 1
          if (depth == 0) return i + 1
        case _ =>
      }
      i += 1
    }
    throw new IllegalArgumentException("unbalanced parentheses in MERGE")
  }

  private def skipWs(s: String, from: Int): Int = {
    var i = from
    while (i < s.length && s.charAt(i).isWhitespace) i += 1
    i
  }

  /** Read an identifier chain (dots allowed); a BACKTICKED leg unwraps
    * to its inner name — the wire plane's Trino `"t"` arrives requoted
    * as `` `t` `` and must still parse as the target/source/alias. */
  private def readWord(s: String, from: Int): (String, Int) = {
    val start = skipWs(s, from)
    var i = start
    val out = new StringBuilder
    var more = true
    while (more && i < s.length) {
      val c = s.charAt(i)
      if (c == '`') {
        i += 1
        while (i < s.length && s.charAt(i) != '`') { out += s.charAt(i); i += 1 }
        require(i < s.length, "unterminated backtick in MERGE identifier")
        i += 1
      } else if (isWordChar(c) || c == '.') { out += c; i += 1 }
      else more = false
    }
    (out.toString, i)
  }

  // -------------------------------------------------------------- parse

  private final case class Parsed(table: String, targetAlias: String,
      sourceRel: String, sourceAlias: String, cond: String,
      matched: Seq[Matched], notMatched: Option[NotMatched])

  private def parse(sql: String): Parsed = {
    val s = sql.trim.stripSuffix(";").trim
    val head = HeadRx.findFirstMatchIn(s).get
    var i = head.end
    val (table, i1) = readWord(s, i)
    require(table.nonEmpty, "MERGE INTO: missing target table")
    i = skipWs(s, i1)
    // optional [AS] alias before USING
    var targetAlias = table.split('.').last
    val (w1, i2) = readWord(s, i)
    if (w1.equalsIgnoreCase("AS")) {
      val (a, i3) = readWord(s, i2); targetAlias = a; i = skipWs(s, i3)
    } else if (!w1.equalsIgnoreCase("USING") && w1.nonEmpty) {
      targetAlias = w1; i = skipWs(s, i2)
    }
    val (using, i4) = readWord(s, i)
    require(using.equalsIgnoreCase("USING"),
      s"MERGE INTO: expected USING, found '$using'")
    i = skipWs(s, i4)
    // source: (subquery) or table name
    var sourceRel: String = null
    if (s.charAt(i) == '(') {
      val end = balancedParen(s, i)
      sourceRel = s.substring(i, end)
      i = skipWs(s, end)
    } else {
      val (src, i5) = readWord(s, i)
      require(src.nonEmpty, "MERGE INTO: missing source relation")
      sourceRel = src
      i = skipWs(s, i5)
    }
    var sourceAlias =
      if (sourceRel.startsWith("(")) "__merge_src"
      else sourceRel.split('.').last
    val (w2, i6) = readWord(s, i)
    if (w2.equalsIgnoreCase("AS")) {
      val (a, i7) = readWord(s, i6); sourceAlias = a; i = skipWs(s, i7)
    } else if (!w2.equalsIgnoreCase("ON") && w2.nonEmpty) {
      sourceAlias = w2; i = skipWs(s, i6)
    }
    val (on, i8) = readWord(s, i)
    require(on.equalsIgnoreCase("ON"), s"MERGE INTO: expected ON, found '$on'")
    i = i8
    val firstWhen = topLevelKeyword(s, "WHEN", i)
    require(firstWhen > 0, "MERGE INTO: needs at least one WHEN clause")
    val cond = s.substring(i, firstWhen).trim
    require(cond.nonEmpty, "MERGE INTO: empty ON condition")

    // split the tail into WHEN clauses at top level
    var starts = Seq.newBuilder[Int]
    var at = firstWhen
    while (at >= 0) {
      starts += at
      at = topLevelKeyword(s, "WHEN", at + 4)
    }
    val idxs = starts.result()
    val clauses = idxs.zipWithIndex.map { case (st, k) =>
      val en = if (k + 1 < idxs.length) idxs(k + 1) else s.length
      s.substring(st, en).trim
    }

    var matched = Seq.newBuilder[Matched]
    var notM: Option[NotMatched] = None
    val MatchedRx =
      "(?is)^WHEN\\s+MATCHED\\s*(?:AND\\s+(.*?))?\\s*THEN\\s+(UPDATE\\s+SET\\s+(.*)|DELETE)\\s*$".r
    val NotMatchedRx =
      ("(?is)^WHEN\\s+NOT\\s+MATCHED\\s*(?:AND\\s+(.*?))?\\s*THEN\\s+INSERT\\s*" +
        "(\\([^)]*\\))?\\s*VALUES\\s*(\\(.*\\))\\s*$").r
    clauses.foreach {
      case MatchedRx(condOpt, action, setList) =>
        if (action.toUpperCase.startsWith("UPDATE")) {
          val assigns = splitTop(setList).map { a =>
            val eq = a.indexOf('=')
            require(eq > 0, s"bad assignment in UPDATE SET: $a")
            (a.substring(0, eq).trim.stripPrefix("`").stripSuffix("`"),
              a.substring(eq + 1).trim)
          }
          matched += Matched(Option(condOpt).map(_.trim), isDelete = false, assigns)
        } else
          matched += Matched(Option(condOpt).map(_.trim), isDelete = true, Nil)
      case NotMatchedRx(condOpt, colsOpt, values) =>
        require(notM.isEmpty, "MERGE INTO: at most one WHEN NOT MATCHED clause")
        val cols = Option(colsOpt).map(c =>
          splitTop(c.stripPrefix("(").stripSuffix(")"))
            .map(_.stripPrefix("`").stripSuffix("`"))).getOrElse(Nil)
        val vals = splitTop(values.trim.stripPrefix("(").stripSuffix(")"))
        notM = Some(NotMatched(Option(condOpt).map(_.trim), cols, vals))
      case other =>
        throw new IllegalArgumentException(
          s"cannot parse MERGE clause: $other — supported: WHEN MATCHED " +
            "[AND c] THEN UPDATE SET ... | DELETE; WHEN NOT MATCHED " +
            "[AND c] THEN INSERT [(cols)] VALUES (...)")
    }
    val ms = matched.result()
    require(ms.count(!_.isDelete) <= 1, "MERGE INTO: at most one UPDATE clause")
    require(ms.count(_.isDelete) <= 1, "MERGE INTO: at most one DELETE clause")
    Parsed(table, targetAlias, sourceRel, sourceAlias, cond, ms, notM)
  }

  // ------------------------------------------------------------- execute

  private final case class Built(kept: DataFrame, inserted: Option[DataFrame],
      updPred: String, delPred: String, joinFrom: String)

  /** Build the kept/updated and inserted sides for a parsed statement —
    * pure plan construction, no jobs. */
  private def build(spark: SparkSession, p: Parsed, tgtView: String): Built = {
    val target = Layout.readCurrent(spark, p.table)
    val tcols = target.schema.fields.toSeq
    val ta = s"`${p.targetAlias}`"
    val sa = s"`${p.sourceAlias}`"
    val srcRel = s"(SELECT *, true AS __smatch FROM ${p.sourceRel} ) AS $sa"
    val joinFrom = s"FROM $tgtView AS $ta LEFT JOIN $srcRel ON (${p.cond})"
    // clause predicates in TEXTUAL order: first applicable wins
    def clausePred(k: Int): String = {
      val own = s"coalesce((${p.matched(k).cond.getOrElse("true")}), false)"
      val priors = p.matched.take(k).map(c =>
        s"NOT coalesce((${c.cond.getOrElse("true")}), false)")
      (Seq(s"coalesce($sa.__smatch, false)", own) ++ priors).mkString(" AND ")
    }
    val updIdx = p.matched.indexWhere(!_.isDelete)
    val delIdx = p.matched.indexWhere(_.isDelete)
    val updPred = if (updIdx < 0) "false" else clausePred(updIdx)
    val delPred = if (delIdx < 0) "false" else clausePred(delIdx)
    val assigns: Map[String, String] =
      if (updIdx < 0) Map.empty else p.matched(updIdx).assignments.toMap
    assigns.keys.foreach(c => require(tcols.exists(_.name == c),
      s"UPDATE SET names unknown column '$c' of ${p.table}"))
    val keptSelect = tcols.map { f =>
      val c = s"`${f.name}`"
      assigns.get(f.name) match {
        case Some(expr) =>
          s"CASE WHEN $updPred THEN CAST(($expr) AS ${f.dataType.sql}) " +
            s"ELSE $ta.$c END AS $c"
        case None => s"$ta.$c AS $c"
      }
    }.mkString(",\n  ")
    val kept = spark.sql(
      s"SELECT\n  $keptSelect\n$joinFrom\nWHERE NOT coalesce(($delPred), false)")
    val inserted = p.notMatched.map { nm =>
      val cols = if (nm.cols.nonEmpty) nm.cols else tcols.map(_.name)
      require(cols.length == nm.values.length,
        s"INSERT lists ${cols.length} columns but ${nm.values.length} values")
      cols.foreach(c => require(tcols.exists(_.name == c),
        s"INSERT names unknown column '$c' of ${p.table}"))
      val byCol = cols.zip(nm.values).toMap
      val proj = tcols.map { f =>
        byCol.get(f.name) match {
          case Some(expr) => s"CAST(($expr) AS ${f.dataType.sql}) AS `${f.name}`"
          case None => s"CAST(NULL AS ${f.dataType.sql}) AS `${f.name}`"
        }
      }.mkString(",\n  ")
      spark.sql(
        s"""SELECT
           |  $proj
           |FROM ${p.sourceRel} AS $sa
           |LEFT ANTI JOIN $tgtView AS $ta ON (${p.cond})
           |WHERE coalesce((${nm.cond.getOrElse("true")}), false)""".stripMargin)
    }
    Built(kept, inserted, updPred, delPred, joinFrom)
  }

  private def withTargetView[A](spark: SparkSession, p: Parsed)(
      f: String => A): A = {
    val tgtView = "__merge_tgt_" +
      java.util.UUID.randomUUID().toString.replace("-", "").take(8)
    Layout.readCurrent(spark, p.table).withColumn("__tid",
      org.apache.spark.sql.functions.monotonically_increasing_id())
      .createOrReplaceTempView(tgtView)
    try f(tgtView)
    finally { spark.catalog.dropTempView(tgtView); () }
  }

  /** The merged relation a statement WOULD commit — plan construction
    * only (no cardinality jobs, no write): what PlanQualitySpec locks
    * the join shapes on. */
  private[graft] def planOnly(spark: SparkSession, sql: String): DataFrame = {
    val p = parse(sql)
    withTargetView(spark, p) { tgtView =>
      val b = build(spark, p, tgtView)
      // analysis resolves the temp view into the plan at construction,
      // so the relation survives the view drop
      b.inserted.fold(b.kept)(b.kept.unionByName(_))
    }
  }

  private def execute(spark: SparkSession, sql: String): DataFrame = {
    import spark.implicits._
    val p = parse(sql)
    withTargetView(spark, p) { tgtView =>
      val ta = s"`${p.targetAlias}`"
      val sa = s"`${p.sourceAlias}`"
      val srcRel = s"(SELECT *, true AS __smatch FROM ${p.sourceRel} ) AS $sa"
      // the standard's cardinality rule: >1 source match per target row
      // refuses — silent first-match would be join-order-dependent
      val card = spark.sql(
        s"""SELECT coalesce(max(__cnt), 0) FROM (
           |  SELECT $ta.__tid, count(*) AS __cnt
           |  FROM $tgtView AS $ta JOIN $srcRel ON (${p.cond})
           |  GROUP BY $ta.__tid)""".stripMargin).collect().head.getLong(0)
      require(card <= 1L,
        s"MERGE cardinality violation: a target row of ${p.table} matched " +
          s"$card source rows — the ON condition must match at most one")
      val b = build(spark, p, tgtView)
      // affected-row counts (Trino's MERGE result) — one aggregate over
      // the same join, one count on the insert side
      val counts = spark.sql(
        s"""SELECT
           |  sum(CASE WHEN ${b.updPred} THEN 1 ELSE 0 END) AS u,
           |  sum(CASE WHEN coalesce((${b.delPred}), false) THEN 1 ELSE 0 END) AS d
           |${b.joinFrom}""".stripMargin).collect().head
      val updated = Option(counts.get(0)).map(_.asInstanceOf[Long]).getOrElse(0L)
      val deleted = Option(counts.get(1)).map(_.asInstanceOf[Long]).getOrElse(0L)
      val insertedCount = b.inserted.map(_.count()).getOrElse(0L)
      val merged = b.inserted.fold(b.kept)(b.kept.unionByName(_))
      Layout.overwrite(spark, p.table, merged, operation = "merge")
      Seq(updated + deleted + insertedCount).toDF("rows")
    }
  }
}
