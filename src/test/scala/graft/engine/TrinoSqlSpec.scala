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

  test("double-quoted identifiers are opaque: no prefix strip, no type map") {
    assert(TrinoSql.toSpark("""SELECT "iceberg.x", "varchar" FROM t""")
      === """SELECT "iceberg.x", "varchar" FROM t""")
    // doubled "" stays inside the identifier span
    assert(TrinoSql.toSpark("""SELECT "a""iceberg.b" FROM t""")
      === """SELECT "a""iceberg.b" FROM t""")
    // ...while the same tokens outside quotes still rewrite in one
    // statement mixing both
    assert(TrinoSql.toSpark("""SELECT "varchar", CAST(x AS varchar) FROM iceberg.t""")
      === """SELECT "varchar", CAST(x AS STRING) FROM t""")
  }
}
