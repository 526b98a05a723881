package graft.ext

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** [[HybridRetrieval]] RRF contracts: the Cormack fusion formula on known
  * ranked lists (hand-computed expectations), consensus-beats-single-list
  * behavior, deterministic tie-breaks, and single-list degeneration.
  */
class HybridRetrievalSpec extends SparkSpec {
  import spark.implicits._

  private def list(rows: (Long, Double)*) =
    rows.toSeq.toDF("doc_id", "score")

  private def fuse(lists: Seq[(Long, Double)]*) = {
    val ranked = lists.map(l => HybridRetrieval.ranked(list(l: _*), "doc_id", "score"))
    HybridRetrieval.rrfFuse(ranked, "doc_id", topK = 10)
      .collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
  }

  private def rr(rank: Int): BigDecimal =
    BigDecimal(1.0 / (60 + rank)).setScale(6, BigDecimal.RoundingMode.HALF_UP)

  test("hand-computed RRF on two overlapping lists") {
    // list A ranks: 1→r1, 2→r2, 3→r3; list B: 2→r1, 1→r2, 4→r3
    val got = fuse(
      Seq(1L -> 0.9, 2L -> 0.8, 3L -> 0.7),
      Seq(2L -> 0.99, 1L -> 0.5, 4L -> 0.4))
    val exp = Seq(
      1L -> (rr(1) + rr(2)), 2L -> (rr(2) + rr(1)),
      3L -> rr(3), 4L -> rr(3))
      .map { case (id, s) => (id, s.toDouble) }
      .sortBy { case (id, s) => (-s, id) }
    assert(got === exp)
    // consensus docs (1, 2) beat single-list docs (3, 4)
    assert(got.take(2).map(_._1).toSet === Set(1L, 2L))
  }

  test("ranked() breaks score ties by id ascending") {
    val r = HybridRetrieval.ranked(
        list(5L -> 0.5, 3L -> 0.5, 4L -> 0.9), "doc_id", "score")
      .collect().map(x => (x.getLong(0), x.getInt(1))).toMap
    assert(r === Map(4L -> 1, 3L -> 2, 5L -> 3))
  }

  test("tied fused scores break by id; single list preserves its order") {
    // docs 1 and 2 both only in one list at the same rank across lists
    val got = fuse(Seq(1L -> 0.9), Seq(2L -> 0.9))
    assert(got === Seq(1L -> rr(1).toDouble, 2L -> rr(1).toDouble))
    val single = fuse(Seq(1L -> 0.9, 2L -> 0.8, 3L -> 0.7))
    assert(single.map(_._1) === Seq(1L, 2L, 3L))
  }
}
