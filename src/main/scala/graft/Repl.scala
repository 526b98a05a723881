package graft

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.engine.{Lakehouse, Seed}

/** Ad-hoc SQL entry point (SURVEY.md §3.3) — the lifecycle the reference
  * serves over Trino's :8080 (README.md:49-50: `docker exec ... trino` /
  * Superset SQL Lab): seed the demo catalog, run user SQL against it,
  * deliver results as CSV.
  *
  * Usage: `graft.Repl <sql-file | -> [csvOutDir]`
  *   - `-` reads the SQL text from stdin (the `trino < query.sql` shape).
  *   - Statements are ;-separated (quote-aware); every statement executes,
  *     the LAST one's result is printed and (if `csvOutDir` is given)
  *     delivered via [[Lakehouse.deliverCsv]] (seed.sh:9's
  *     `--output-format CSV`).
  *   - With SPARK_GRAFT_SF_DIR set, the driver parquet tables are also
  *     registered as `sf_`-prefixed temp views (prefixed so they can't
  *     shadow the seeded demo tables), so analytical SQL joins demo +
  *     TPC-H-ish tables in one statement.
  */
object Repl {

  /** Quote/comment-aware ;-splitter: semicolons inside '...' literals
    * (with backslash escapes, which Spark's default dialect accepts) or
    * behind `--` line comments don't end a statement; comment-only
    * fragments are dropped (Spark's parser rejects empty statements). */
  private[graft] def splitStatements(text: String): Seq[String] = {
    val out = Seq.newBuilder[String]
    val cur = new StringBuilder
    var i = 0
    var inQuote = false
    var inComment = false
    while (i < text.length) {
      val c = text.charAt(i)
      if (inComment) {
        cur += c
        if (c == '\n') inComment = false
        i += 1
      } else if (inQuote) {
        cur += c
        if (c == '\\' && i + 1 < text.length) { cur += text.charAt(i + 1); i += 2 }
        else { if (c == '\'') inQuote = false; i += 1 }
      } else c match {
        case '\'' => inQuote = true; cur += c; i += 1
        case '-' if i + 1 < text.length && text.charAt(i + 1) == '-' =>
          inComment = true; cur += c; i += 1
        case ';' => out += cur.toString; cur.clear(); i += 1
        case _ => cur += c; i += 1
      }
    }
    out += cur.toString
    out.result().map(_.trim)
      .filter(s => s.nonEmpty &&
        !s.linesIterator.forall(l => l.trim.isEmpty || l.trim.startsWith("--")))
  }

  /** Execute all statements, return the last result. The seeded `demo`
    * database is current, so unqualified table names resolve like the
    * reference's `trino --catalog iceberg --schema demo`. */
  private[graft] def execute(spark: SparkSession, sqlText: String): DataFrame = {
    val stmts = splitStatements(sqlText)
    require(stmts.nonEmpty, "no SQL statements in input")
    stmts.map(Lakehouse.sql(spark, _)).last
  }

  def main(args: Array[String]): Unit = {
    require(args.nonEmpty, "usage: graft.Repl <sql-file | -> [csvOutDir]")
    val sqlText =
      if (args(0) == "-") scala.io.Source.stdin.mkString
      else Files.readString(Paths.get(args(0)))

    val spark = SparkSession.builder()
      .master(sys.env.getOrElse("SPARK_GRAFT_MASTER", "local[8]"))
      .appName("graft-repl")
      .config("spark.sql.shuffle.partitions",
        sys.env.getOrElse("SPARK_GRAFT_CPUS", "8"))
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    Seed.seedCatalog(spark, "demo")
    spark.sql("USE demo")
    // Driver tables register under an `sf_` prefix: temp views resolve
    // BEFORE the current database, so bare `events`/`orders` views would
    // silently shadow the seeded demo tables of the same name.
    sys.env.get("SPARK_GRAFT_SF_DIR").foreach { d =>
      Tables.names.foreach(n => Tables.load(spark, d, n).createOrReplaceTempView(s"sf_$n"))
    }

    val result = execute(spark, sqlText)
    // CLI-shaped preview on stdout; full result goes to the CSV sink.
    result.show(100, truncate = false)
    args.lift(1).foreach { out =>
      Lakehouse.deliverCsv(result, out)
      println(s"[repl] csv delivered to $out")
    }
    spark.stop()
  }
}
