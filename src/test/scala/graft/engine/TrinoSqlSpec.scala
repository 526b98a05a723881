package graft.engine

import org.scalatest.funsuite.AnyFunSuite

/** The Trino → Spark dialect shim's rewrite discipline: string literals
  * AND double-quoted identifiers are opaque (round-15 advisor: a column
  * literally named `varchar` or an identifier `"iceberg.x"` must never
  * be rewritten), while the documented seed.sh shapes still map. */
class TrinoSqlSpec extends AnyFunSuite {

  test("iceberg. prefix strips and bare varchar maps outside quotes") {
    assert(TrinoSql.toSpark("SELECT * FROM iceberg.demo.events")
      === "SELECT * FROM demo.events")
    assert(TrinoSql.toSpark("CREATE TABLE t (x varchar, y varchar(10))")
      === "CREATE TABLE t (x STRING, y varchar(10))")
  }

  test("single-quoted literals are data") {
    val s = "SELECT 'iceberg.demo keeps varchar' AS msg"
    assert(TrinoSql.toSpark(s) === s)
  }

  test("double-quoted identifiers map to backticks: no prefix strip, no type map inside") {
    // Trino "name" is an IDENTIFIER; Spark's default dialect would
    // parse it as a string literal — so the shim requotes to backticks
    assert(TrinoSql.toSpark("""SELECT "iceberg.x", "varchar" FROM t""")
      === "SELECT `iceberg.x`, `varchar` FROM t")
    // doubled "" unescapes to a literal " inside the identifier
    assert(TrinoSql.toSpark("""SELECT "a""iceberg.b" FROM t""")
      === "SELECT `a\"iceberg.b` FROM t")
    // ...while the same tokens outside quotes still rewrite in one
    // statement mixing both
    assert(TrinoSql.toSpark("""SELECT "varchar", CAST(x AS varchar) FROM iceberg.t""")
      === "SELECT `varchar`, CAST(x AS STRING) FROM t")
    // a quoted catalog leg strips like the bare one
    assert(TrinoSql.toSpark("""SELECT * FROM "iceberg"."demo"."events"""")
      === "SELECT * FROM `demo`.`events`")
  }

  test("catalog strip is HEAD-of-chain only: a schema/table named iceberg survives") {
    // round-16 advisor: the old global replace collapsed
    // "iceberg"."iceberg"."t" to bare t — the catalog leg must strip,
    // the schema genuinely NAMED iceberg must stay
    assert(TrinoSql.toSpark("""SELECT * FROM "iceberg"."iceberg"."t"""")
      === "SELECT * FROM `iceberg`.`t`")
    assert(TrinoSql.toSpark("SELECT * FROM iceberg.iceberg.t")
      === "SELECT * FROM iceberg.t")
    // mid-chain quoted leg: schema.table where the TABLE is named iceberg
    assert(TrinoSql.toSpark("""SELECT * FROM "demo"."iceberg"""")
      === "SELECT * FROM `demo`.`iceberg`")
    assert(TrinoSql.toSpark("SELECT * FROM demo.iceberg")
      === "SELECT * FROM demo.iceberg")
    // a single-quoted literal containing the quoted-catalog text is data
    val lit = """SELECT 'see `iceberg`.demo and "iceberg".x' AS s"""
    assert(TrinoSql.toSpark(lit)
      === """SELECT 'see `iceberg`.demo and "iceberg".x' AS s""")
    // a bare column named iceberg (no trailing dot) is untouched
    assert(TrinoSql.toSpark("SELECT iceberg FROM t WHERE iceberg > 1")
      === "SELECT iceberg FROM t WHERE iceberg > 1")
  }

  test("ARRAY[...] constructors map to array(...); element access and literals are untouched") {
    assert(TrinoSql.toSpark("SELECT ARRAY[1, 2, 3] AS a")
      === "SELECT array(1, 2, 3) AS a")
    assert(TrinoSql.toSpark("SELECT ARRAY[ARRAY[1], ARRAY[2, 3]] AS a")
      === "SELECT array(array(1), array(2, 3)) AS a")
    // element access on an identifier is NOT a constructor
    assert(TrinoSql.toSpark("SELECT my_array[1] FROM t")
      === "SELECT my_array[1] FROM t")
    // inside a string literal it is data
    assert(TrinoSql.toSpark("SELECT 'use ARRAY[1] here' AS s")
      === "SELECT 'use ARRAY[1] here' AS s")
  }

  test("Trino's parenthesized EXPLAIN options map to Spark's EXTENDED mode") {
    assert(TrinoSql.toSpark("EXPLAIN (TYPE DISTRIBUTED) SELECT * FROM iceberg.demo.t")
      === "EXPLAIN EXTENDED SELECT * FROM demo.t")
    assert(TrinoSql.toSpark("EXPLAIN (FORMAT TEXT, TYPE LOGICAL) SELECT 1")
      === "EXPLAIN EXTENDED SELECT 1")
    // Spark's own bare EXPLAIN passes through untouched
    assert(TrinoSql.toSpark("EXPLAIN SELECT 1") === "EXPLAIN SELECT 1")
  }

  test("a quoted identifier genuinely resolves the COLUMN through Spark, not a string literal") {
    val spark = graft.SparkSpec.spark
    import spark.implicits._
    Seq((1L, "row1")).toDF("id", "value")
      .createOrReplaceTempView("trinosql_requote")
    val got = Lakehouse.sql(spark,
      TrinoSql.toSpark("""SELECT "value" FROM trinosql_requote"""))
      .collect().head.getString(0)
    assert(got === "row1") // verbatim pass-through would return 'value'
  }
}
