package graft.ext

import org.apache.spark.sql.DataFrame

import graft.SparkSpec

/** Contracts for [[LabelProp]] — deterministic synchronous label
  * propagation. Pinned against an independent single-node adjacency-map
  * reference (the PageRankSpec convention): same semantics, no shared
  * code, label-for-label equality.
  */
class LabelPropSpec extends SparkSpec {

  private def df(edges: Seq[(Long, Long)]): DataFrame = {
    val s = spark; import s.implicits._
    edges.toDF("src", "dst")
  }

  private def run(edges: Seq[(Long, Long)], rounds: Int): Map[Long, Long] =
    LabelProp.run(df(edges), "src", "dst", rounds)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap

  /** Independent reference: synchronous updates over an adjacency map,
    * argmax neighbor label by (count desc, label asc), keep own label
    * when no in-neighbors. */
  private def reference(edges: Seq[(Long, Long)], rounds: Int): Map[Long, Long] = {
    val nodes = (edges.map(_._1) ++ edges.map(_._2)).distinct
    val inNbrs = edges.groupBy(_._2).map { case (v, es) => v -> es.map(_._1) }
    var lab = nodes.map(v => v -> v).toMap
    for (_ <- 1 to rounds) {
      lab = nodes.map { v =>
        inNbrs.get(v) match {
          case None => v -> lab(v)
          case Some(ns) =>
            val counts = ns.map(lab).groupBy(identity).map { case (l, o) => (l, o.size) }
            v -> counts.toSeq.minBy { case (l, c) => (-c, l) }._1
        }
      }.toMap
    }
    lab
  }

  private def undirected(pairs: (Long, Long)*): Seq[(Long, Long)] =
    pairs.toSeq ++ pairs.map(p => (p._2, p._1))

  test("two cliques joined by one bridge edge resolve to two communities") {
    // cliques {1,2,3,4} and {10,11,12,13}, bridge 4-10
    val cl1 = for (a <- 1L to 4L; b <- 1L to 4L if a < b) yield (a, b)
    val cl2 = for (a <- 10L to 13L; b <- 10L to 13L if a < b) yield (a, b)
    val edges = undirected((cl1 ++ cl2 :+ (4L -> 10L)): _*)
    val got = run(edges, 4)
    assert(got == reference(edges, 4))
    // both cliques collapse to their min label
    assert(Set(1L, 2L, 3L).map(got) == Set(got(1L)))
    assert(Set(11L, 12L, 13L).map(got) == Set(got(10L)))
    assert(got(1L) != got(11L))
  }

  test("matches the reference round-for-round on random graphs") {
    val rnd = new scala.util.Random(11)
    val edges = undirected((1 to 160).map(_ =>
      (rnd.nextInt(40).toLong, rnd.nextInt(40).toLong))
      .filter(p => p._1 != p._2).distinct: _*)
    for (r <- 1 to 5)
      assert(run(edges, r) == reference(edges, r), s"rounds=$r")
  }

  test("a node with no in-neighbors keeps its own label") {
    // directed-only: 5 -> 1; 1 has an in-neighbor, 5 does not
    val edges = Seq((5L, 1L))
    val got = run(edges, 3)
    assert(got(5L) == 5L)
    assert(got(1L) == 5L)
  }

  test("star graph: leaves adopt the hub's label via min-tie, hub adopts min leaf") {
    val edges = undirected((1L, 2L), (1L, 3L), (1L, 4L))
    assert(run(edges, 2) == reference(edges, 2))
  }
}
