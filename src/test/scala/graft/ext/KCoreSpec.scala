package graft.ext

import org.apache.spark.sql.DataFrame

import graft.SparkSpec

/** Contracts for [[GraphAlgos.kCore]] — synchronous fixed-round k-core
  * peeling, pinned sweep-for-sweep against an independent adjacency-map
  * reference.
  */
class KCoreSpec extends SparkSpec {

  private def df(edges: Seq[(Long, Long)]): DataFrame = {
    val s = spark; import s.implicits._
    edges.toDF("x", "y")
  }

  private def run(edges: Seq[(Long, Long)], k: Int, rounds: Int): Map[Long, Long] =
    GraphAlgos.kCore(df(edges), "x", "y", k, rounds)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap

  /** Independent reference: synchronous sweeps over adjacency sets —
    * every sub-k node of the CURRENT graph is removed at once. */
  private def reference(edges: Seq[(Long, Long)], k: Int,
      rounds: Int): Map[Long, Long] = {
    val und = edges.filter(e => e._1 != e._2)
      .flatMap(e => Seq(e, e.swap)).distinct
    var adj = und.groupBy(_._1).map { case (v, es) => v -> es.map(_._2).toSet }
    for (_ <- 1 to rounds) {
      val bad = adj.collect { case (v, ns) if ns.size < k => v }.toSet
      adj = adj.collect {
        case (v, ns) if !bad(v) => v -> (ns -- bad)
      }.filter(_._2.nonEmpty)
    }
    adj.map { case (v, ns) => v -> ns.size.toLong }
  }

  test("a clique survives at k = n-1 and fully peels at k = n") {
    val clique = for (a <- 1L to 5L; b <- 1L to 5L if a < b) yield (a, b)
    val got4 = run(clique, 4, 3)
    assert(got4 == (1L to 5L).map(_ -> 4L).toMap)
    assert(run(clique, 5, 3).isEmpty)
  }

  test("a tree fully peels at k = 2, leaves-first cascade") {
    // path 1-2-3-4-5: sweep 1 removes {1,5}, sweep 2 {2,4}, sweep 3 {3}
    val path = Seq((1L, 2L), (2L, 3L), (3L, 4L), (4L, 5L))
    for (r <- 1 to 4)
      assert(run(path, 2, r) == reference(path, 2, r), s"rounds=$r")
    assert(run(path, 2, 3).isEmpty)
  }

  test("clique with a pendant chain: the chain peels, the core keeps k") {
    val clique = for (a <- 1L to 5L; b <- 1L to 5L if a < b) yield (a, b)
    val chain = Seq((5L, 10L), (10L, 11L), (11L, 12L))
    val edges = clique ++ chain
    val got = run(edges, 3, 4)
    assert(got == reference(edges, 3, 4))
    assert(got.keySet == Set(1L, 2L, 3L, 4L, 5L))
  }

  test("matches the reference sweep-for-sweep on random graphs") {
    val rnd = new scala.util.Random(13)
    val edges = (1 to 240).map(_ =>
      (rnd.nextInt(60).toLong, rnd.nextInt(60).toLong))
      .filter(p => p._1 != p._2).distinct
    for (k <- Seq(2, 3, 4); r <- 1 to 4)
      assert(run(edges, k, r) == reference(edges, k, r), s"k=$k rounds=$r")
  }
}
