package graft.engine

/** Trino → Spark SQL dialect mapping for the [[StatementHttp]] wire
  * front — exactly the constructs the reference's own clients emit
  * (`/root/reference/compose/seed.sh:65-118` statements; Superset's
  * SQLAlchemy probing, `compose/superset/entrypoint.sh:8-12`), nothing
  * more. Spark 4 already parses most of the overlap verbatim
  * (`INTERVAL '1' DAY * expr`, `!=`, `||`, CASE-on-expr,
  * `current_timestamp`), so the shim is five deterministic rewrites,
  * all QUOTE-AWARE (string literals pass through untouched):
  *
  *  1. `iceberg.` catalog prefix → the session catalog. Trino names the
  *     catalog in `iceberg.properties`; here the engine IS the catalog,
  *     so `iceberg.demo.events` resolves as `demo.events`. Bare and
  *     quoted spellings both strip, HEAD-of-chain only — a schema or
  *     table genuinely named `iceberg` mid-chain survives
  *     ([[stripCatalogPrefix]]).
  *  2. bare `varchar` → `STRING` (Spark requires a length on VARCHAR;
  *     `varchar(n)` is kept verbatim).
  *  3. `FROM UNNEST(expr) AS t(n)` → `FROM (SELECT explode(expr) AS n)
  *     AS t` — the single-column row-generator shape seed.sh uses
  *     (balanced-paren scan, so nested `sequence(1, 200)` survives).
  *  4. `CREATE SCHEMA ... WITH (location = '...')` → the clause is
  *     dropped: Trino's `WITH (...)` names object-store table
  *     properties; the engine's warehouse dir governs location.
  *  5. `SHOW CATALOGS` → a literal relation listing `iceberg` — the
  *     alias this front serves the session catalog under (the readiness
  *     probe at seed.sh:49 greps for it) — plus `spark_catalog`.
  *  6. `ARRAY[...]` → `array(...)` — Trino's array constructor, which
  *     Spark's parser rejects (balanced-bracket scan, nested
  *     constructors recurse; element access `x[1]` never triggers).
  *  7. double-quoted identifiers → backticks: Trino's `"name"` is
  *     ALWAYS an identifier, Spark's default dialect parses it as a
  *     STRING LITERAL — verbatim pass-through would hand a client
  *     quoting a column a constant string instead of the column
  *     (`""` → literal `"` in the name; backticks double on the way
  *     out; a quoted `"iceberg"` catalog leg strips like the bare one).
  */
object TrinoSql {

  // Trino's catalog-qualified SHOW family — what the trino SQLAlchemy
  // dialect and CLI emit while introspecting (`SHOW SCHEMAS FROM
  // iceberg`, `SHOW TABLES FROM iceberg.demo`, `SHOW COLUMNS FROM t`,
  // and `DESCRIBE t` / `DESC t` — Trino's documented SHOW COLUMNS
  // aliases, matched whole-statement so ORDER BY ... DESC never hits).
  // Lowered to information_schema selects (resolved live by
  // [[InfoSchema]]) so one shim serves both spellings, with Trino's own
  // output column names (`Schema` / `Table` / `Column`,`Type`,...).
  private val ShowSchemasRx =
    ("(?is)^SHOW\\s+SCHEMAS(?:\\s+(?:FROM|IN)\\s+(\"?[A-Za-z_]\\w*\"?))?" +
      "(?:\\s+LIKE\\s+('(?:[^']|'')*'))?\\s*$").r
  private val ShowTablesRx =
    ("(?is)^SHOW\\s+TABLES(?:\\s+(?:FROM|IN)\\s+((?:\"?[A-Za-z_]\\w*\"?)" +
      "(?:\\.\"?[A-Za-z_]\\w*\"?)?))?(?:\\s+LIKE\\s+('(?:[^']|'')*'))?\\s*$").r
  private val ShowColumnsRx =
    ("(?is)^(?:SHOW\\s+COLUMNS\\s+(?:FROM|IN)|DESCRIBE|DESC)\\s+" +
      "((?:\"?[A-Za-z_]\\w*\"?)(?:\\.\"?[A-Za-z_]\\w*\"?){0,2})\\s*$").r

  private def unq(leg: String): String = leg.replace("\"", "")

  private def requireCatalog(c: String): Unit =
    if (!c.equalsIgnoreCase("iceberg") && !c.equalsIgnoreCase("spark_catalog"))
      throw new IllegalArgumentException(s"catalog not found: $c")

  /** Lower a SHOW SCHEMAS/TABLES/COLUMNS statement to an
    * information_schema select, or None for every other statement. */
  private def lowerShow(t: String): Option[String] = t match {
    case ShowSchemasRx(cat, like) =>
      Option(cat).map(unq).foreach(requireCatalog)
      val where = Option(like).map(p => s" WHERE schema_name LIKE $p").getOrElse("")
      Some("SELECT schema_name AS `Schema` FROM information_schema.schemata" +
        s"$where ORDER BY schema_name")
    case ShowTablesRx(chain, like) =>
      val schemaExpr = Option(chain).map(_.split('.').map(unq)) match {
        case None => "current_database()"
        case Some(Array(s)) => s"'$s'"
        case Some(Array(c, s)) => requireCatalog(c); s"'$s'"
        case Some(other) => throw new IllegalArgumentException(
          s"bad SHOW TABLES qualifier: ${other.mkString(".")}")
      }
      val likeClause = Option(like).map(p => s" AND table_name LIKE $p").getOrElse("")
      Some("SELECT table_name AS `Table` FROM information_schema.tables" +
        s" WHERE table_schema = $schemaExpr$likeClause ORDER BY table_name")
    case ShowColumnsRx(chain) =>
      val (schemaExpr, table) = chain.split('.').map(unq) match {
        case Array(tb) => ("current_database()", tb)
        case Array(s, tb) => (s"'$s'", tb)
        case Array(c, s, tb) => requireCatalog(c); (s"'$s'", tb)
        case other => throw new IllegalArgumentException(
          s"bad SHOW COLUMNS qualifier: ${other.mkString(".")}")
      }
      Some("SELECT column_name AS `Column`, data_type AS `Type`, " +
        "'' AS `Extra`, '' AS `Comment` FROM information_schema.columns" +
        s" WHERE table_schema = $schemaExpr AND table_name = '$table'" +
        " ORDER BY ordinal_position")
    case _ => None
  }

  def toSpark(sql: String): String = {
    val t = sql.trim.stripSuffix(";").trim
    if (t.toUpperCase.matches("SHOW\\s+CATALOGS"))
      return "SELECT * FROM VALUES ('iceberg'), ('spark_catalog') AS t(catalog)"
    lowerShow(t) match {
      case Some(lowered) => return lowered
      case None =>
    }
    // Trino's parenthesized EXPLAIN options — `EXPLAIN (TYPE
    // DISTRIBUTED)` / `(TYPE LOGICAL)` / `(FORMAT TEXT)` — what SQL
    // Lab's Explain button emits; Spark's parser rejects the parens, so
    // the option list maps to the closest Spark mode (EXTENDED) and the
    // inner statement recurses through the full shim
    val ExplainRx = "(?is)^EXPLAIN\\s*\\(\\s*[A-Za-z_ ,]*\\)\\s+(.+)$".r
    t match {
      case ExplainRx(inner) => return "EXPLAIN EXTENDED " + toSpark(inner)
      case _ =>
    }
    // Trino's bare `ANALYZE t [WITH (...)]` (the stats-collection verb
    // its clients issue) — Spark spells it `ANALYZE TABLE t COMPUTE
    // STATISTICS`; the WITH property list names Trino-connector knobs
    // (columns, sample percentage) this engine's full-scan stats pass
    // subsumes, so it drops like CREATE SCHEMA's. The rewritten text
    // recurses so the table chain still gets requoting + catalog strip.
    val AnalyzeRx = ("(?is)^ANALYZE\\s+(?!TABLE\\b)" +
      "((?:\"?[A-Za-z_]\\w*\"?)(?:\\.\"?[A-Za-z_]\\w*\"?){0,2})" +
      "(?:\\s+WITH\\s*\\(.*\\))?\\s*$").r
    t match {
      case AnalyzeRx(chain) =>
        return toSpark(s"ANALYZE TABLE $chain COMPUTE STATISTICS")
      case _ =>
    }
    var s = mapOutsideQuotes(t) { seg =>
      seg.replaceAll("(?i)\\bvarchar\\b(?!\\s*\\()", "STRING")
    }
    s = requoteIdentifiers(s)
    s = stripCatalogPrefix(s)
    s = rewriteArrayLiterals(s)
    s = rewriteUnnest(s)
    if (s.toUpperCase.startsWith("CREATE SCHEMA"))
      s = s.replaceAll("(?is)\\s+WITH\\s*\\(.*\\)\\s*$", "")
    s
  }

  /** Strip the `iceberg` CATALOG qualifier — bare or backticked — from
    * the HEAD of identifier chains only (round-16 advisor: the previous
    * global string replace also stripped a schema or table genuinely
    * named `iceberg` — `"iceberg"."iceberg"."t"` collapsed to bare `t`,
    * resolving in the wrong database — and corrupted single-quoted
    * literals containing the text). Runs AFTER [[requoteIdentifiers]],
    * so the input has only single-quoted literals (copied verbatim) and
    * backticked identifiers. Head position = the previous significant
    * character is not `.` — a mid-chain `iceberg` leg is a real schema
    * or table name and survives; after a strip the cursor is marked
    * mid-chain so `iceberg.iceberg.t` keeps its SECOND leg (the schema
    * actually named iceberg). */
  private def stripCatalogPrefix(s: String): String = {
    val out = new StringBuilder
    var i = 0
    var prevSig: Char = 0 // last significant (non-whitespace) char seen
    def isWordChar(c: Char) = c.isLetterOrDigit || c == '_'
    // lookahead from j: optional whitespace then '.' → Some(dot index)
    def dotAfter(j0: Int): Int = {
      var j = j0
      while (j < s.length && s.charAt(j).isWhitespace) j += 1
      if (j < s.length && s.charAt(j) == '.') j else -1
    }
    while (i < s.length) {
      val c = s.charAt(i)
      if (c == '\'') { // copy the literal verbatim ('' stays inside)
        out += c; i += 1
        var closed = false
        while (i < s.length && !closed) {
          val d = s.charAt(i); out += d; i += 1
          if (d == '\'') {
            if (i < s.length && s.charAt(i) == '\'') { out += '\''; i += 1 }
            else closed = true
          }
        }
        prevSig = '\''
      } else if (c == '`') {
        val start = i
        i += 1
        val name = new StringBuilder
        var closed = false
        while (i < s.length && !closed) {
          val d = s.charAt(i)
          if (d == '`') {
            if (i + 1 < s.length && s.charAt(i + 1) == '`') { name += '`'; i += 2 }
            else { closed = true; i += 1 }
          } else { name += d; i += 1 }
        }
        val dot = dotAfter(i)
        if (closed && prevSig != '.' && dot >= 0 &&
          name.toString.equalsIgnoreCase("iceberg")) {
          i = dot + 1
          prevSig = '.' // the next leg is mid-chain: never re-stripped
        } else {
          out ++= s.substring(start, i)
          prevSig = '`'
        }
      } else if (isWordChar(c)) {
        // always entered at a word boundary: words are consumed whole
        // below, and a strip leaves the cursor just past a '.'
        val start = i
        while (i < s.length && isWordChar(s.charAt(i))) i += 1
        val word = s.substring(start, i)
        val dot = dotAfter(i)
        if (prevSig != '.' && dot >= 0 && word.equalsIgnoreCase("iceberg")) {
          i = dot + 1
          prevSig = '.'
        } else {
          out ++= word
          prevSig = word.last
        }
      } else {
        out += c
        if (!c.isWhitespace) prevSig = c
        i += 1
      }
    }
    out.toString
  }

  /** Trino `"identifier"` → Spark `` `identifier` ``. In Trino a
    * double-quoted span is ALWAYS an identifier; in Spark's default
    * dialect it parses as a STRING LITERAL — leaving it verbatim hands
    * a client that quotes a column name a constant string instead of
    * the column, silently (round-16 review). `""` unescapes to a
    * literal `"` inside the name; a backtick inside the name escapes by
    * doubling (Spark's rule). Single-quoted literals pass through
    * untouched. */
  private def requoteIdentifiers(s: String): String = {
    val out = new StringBuilder
    var i = 0
    var inStr = false
    while (i < s.length) {
      val c = s.charAt(i)
      if (inStr) {
        out += c
        if (c == '\'') {
          if (i + 1 < s.length && s.charAt(i + 1) == '\'') { out += '\''; i += 1 }
          else inStr = false
        }
        i += 1
      } else if (c == '\'') { out += c; inStr = true; i += 1 }
      else if (c == '"') {
        val name = new StringBuilder
        i += 1
        var closed = false
        while (i < s.length && !closed) {
          val d = s.charAt(i)
          if (d == '"') {
            if (i + 1 < s.length && s.charAt(i + 1) == '"') { name += '"'; i += 2 }
            else { closed = true; i += 1 }
          } else { name += d; i += 1 }
        }
        out += '`'
        out ++= name.toString.replace("`", "``")
        out += '`'
      } else { out += c; i += 1 }
    }
    out.toString
  }

  /** Apply `f` to the segments of `s` OUTSIDE single-quoted literals AND
    * double-quoted identifiers (both escape their quote by doubling —
    * `''` / `""` stay inside). Double-quoted spans are opaque because
    * they are IDENTIFIERS: rewriting inside one mangles a column
    * literally named `varchar` to STRING or strips a `"iceberg.x"`
    * name's "prefix" — round-15 advisor. */
  private def mapOutsideQuotes(s: String)(f: String => String): String = {
    val out = new StringBuilder
    val seg = new StringBuilder
    var i = 0
    var quote: Char = 0 // 0 = outside; otherwise the active quote char
    while (i < s.length) {
      val c = s.charAt(i)
      if (quote == 0 && (c == '\'' || c == '"')) {
        out ++= f(seg.toString); seg.clear()
        out += c; quote = c; i += 1
      } else if (quote != 0) {
        out += c
        if (c == quote) {
          if (i + 1 < s.length && s.charAt(i + 1) == quote) { out += quote; i += 1 }
          else quote = 0
        }
        i += 1
      } else { seg += c; i += 1 }
    }
    out ++= f(seg.toString)
    out.toString
  }

  /** Trino `ARRAY[...]` constructor → Spark `array(...)` — core Trino
    * syntax (Superset emits it for IN-list style filters; seed-shaped
    * clients may too) that Spark's parser rejects. Word-bounded,
    * quote-aware, bracket-BALANCED scan; nested constructors rewrite
    * through the recursion (`ARRAY[ARRAY[1], ARRAY[2]]` →
    * `array(array(1), array(2))`). `my_array[1]` (element access on an
    * identifier) never triggers: only the bare keyword does. */
  private def rewriteArrayLiterals(s: String): String = {
    var from = 0
    var cur = s
    while (from < cur.length) {
      val at = indexOfKeyword(cur, "ARRAY", from)
      if (at < 0) return cur
      var i = at + "ARRAY".length
      while (i < cur.length && cur.charAt(i).isWhitespace) i += 1
      if (i >= cur.length || cur.charAt(i) != '[') { from = at + 1 }
      else {
        val open = i
        var depth = 0
        var quote: Char = 0
        while (i < cur.length && (depth > 0 || i == open)) {
          val c = cur.charAt(i)
          if (quote != 0) { if (c == quote) quote = 0 }
          else c match {
            case '\'' | '`' => quote = c
            case '[' => depth += 1
            case ']' => depth -= 1
            case _ =>
          }
          i += 1
        }
        val inner = cur.substring(open + 1, i - 1)
        cur = cur.substring(0, at) + "array(" +
          rewriteArrayLiterals(inner) + ")" + cur.substring(i)
        from = at + 1
      }
    }
    cur
  }

  /** `UNNEST( <balanced> ) AS <alias>(<col>)` →
    * `(SELECT explode(<balanced>) AS <col>) AS <alias>`.
    * The scan is QUOTE-AWARE (an UNNEST inside a string literal is
    * data, not syntax) and WORD-BOUNDED (`my_unnest_col`/`FUNNEST(`
    * never trigger); an aliasless UNNEST is left alone and the scan
    * continues past it, so later aliased ones still rewrite. */
  private def rewriteUnnest(s: String): String = {
    var from = 0
    while (from < s.length) {
      val at = indexOfKeyword(s, "UNNEST", from)
      if (at < 0) return s
      var i = at + "UNNEST".length
      while (i < s.length && s.charAt(i).isWhitespace) i += 1
      if (i >= s.length || s.charAt(i) != '(') { from = at + 1 }
      else {
        val open = i
        var depth = 0
        var inQuote = false
        while (i < s.length && (depth > 0 || i == open)) {
          val c = s.charAt(i)
          if (inQuote) { if (c == '\'') inQuote = false }
          else c match {
            case '\'' => inQuote = true
            case '(' => depth += 1
            case ')' => depth -= 1
            case _ =>
          }
          i += 1
        }
        val inner = s.substring(open + 1, i - 1)
        val tail = s.substring(i)
        val AliasRx = "(?is)^\\s*AS\\s+([A-Za-z_][A-Za-z_0-9]*)\\s*\\(\\s*([A-Za-z_][A-Za-z_0-9]*)\\s*\\)".r
        AliasRx.findFirstMatchIn(tail) match {
          case Some(m) =>
            val (alias, colName) = (m.group(1), m.group(2))
            return rewriteUnnest(s.substring(0, at) +
              s"(SELECT explode($inner) AS $colName) AS $alias" +
              tail.substring(m.end))
          case None => from = i // aliasless: skip it, keep scanning
        }
      }
    }
    s
  }

  /** Case-insensitive index of `word` at or after `from`, outside
    * single-quoted literals and not embedded in a longer identifier. */
  private def indexOfKeyword(s: String, word: String, from: Int): Int = {
    var i = 0
    var inQuote = false
    def isIdent(c: Char) = c.isLetterOrDigit || c == '_'
    while (i < s.length) {
      val c = s.charAt(i)
      if (inQuote) { if (c == '\'') inQuote = false; i += 1 }
      else if (c == '\'') { inQuote = true; i += 1 }
      else if (i >= from && s.regionMatches(true, i, word, 0, word.length) &&
        (i == 0 || !isIdent(s.charAt(i - 1))) &&
        (i + word.length >= s.length || !isIdent(s.charAt(i + word.length)))) {
        return i
      } else i += 1
    }
    -1
  }
}
