package graft.engine

import graft.SparkSpec

class ChecksSpec extends SparkSpec {
  import spark.implicits._
  import Checks._

  private def fact = Seq(
    (Some(1L), Some(10.0), Some(100L)),
    (Some(2L), Some(-5.0), Some(200L)),   // range violation
    (Some(2L), Some(20.0), Some(999L)),   // dup key + dangling FK
    (None, None, None)                     // null key/value/FK
  ).toDF("k", "v", "fk")
  private def dim = Seq(100L, 200L).toDF("id")

  test("each rule counts its violations exactly") {
    val got = validate(fact, Seq(
        NotNull("k"), UniqueKey("k"), InRange("v", 0.0, 50.0),
        RefIntegrity("fk", "dim", dim, "id")))
      .as[(String, Long, Boolean)].collect()
      .map(r => r._1 -> ((r._2, r._3))).toMap
    assert(got("not_null(k)") === ((1L, false)))
    // 4 rows, 2 distinct non-null k (1, 2) -> count 4 - distinct 2 = 2
    assert(got("unique(k)") === ((2L, false)))
    // -5 out of range + null v counts -> 2
    assert(got("range(v,0.0,50.0)") === ((2L, false)))
    // non-null FKs: 100, 200, 999 -> one dangling
    assert(got("ref(fk->dim.id)") === ((1L, false)))
  }

  test("a clean table passes every rule") {
    val clean = Seq((1L, 5.0, 100L), (2L, 6.0, 200L)).toDF("k", "v", "fk")
    val got = validate(clean, Seq(
        NotNull("k"), UniqueKey("k"), InRange("v", 0.0, 50.0),
        RefIntegrity("fk", "dim", dim, "id")))
      .as[(String, Long, Boolean)].collect()
    assert(got.forall(r => r._2 === 0L && r._3))
  }
}
