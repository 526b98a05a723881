package graft.ext

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** [[PageRank]] contracts, all against an independent single-node
  * reference (adjacency maps + the same exact micro-unit integer
  * arithmetic — so equality assertions are EXACT, not epsilon):
  * convergence arithmetic, dangling-mass redistribution, partition
  * invariance, and the ranking a known asymmetric graph must produce.
  */
class PageRankSpec extends SparkSpec {
  import spark.implicits._

  /** Independent reference: same recurrence in plain Scala Maps. Returns
    * micro-unit ranks. */
  private def refPageRank(edges: Seq[(Long, Long)], iters: Int,
      handleDangling: Boolean = true): Map[Long, Long] = {
    val nodes = (edges.map(_._1) ++ edges.map(_._2)).distinct.sorted
    val out = edges.groupBy(_._1).map { case (s, es) => s -> es.size.toLong }
    val in = edges.groupBy(_._2)
    val n = nodes.size.toLong
    var r: Map[Long, Long] = nodes.map(_ -> 1000000L).toMap
    for (_ <- 1 to iters) {
      val danglingShare: Long =
        if (!handleDangling) 0L
        else {
          val s = nodes.filterNot(out.contains).map(r).sum
          if (s == 0L) 0L else (2L * s + n) / (2L * n)
        }
      r = nodes.map { v =>
        val m = in.getOrElse(v, Seq.empty).map { case (u, _) =>
          val d = out(u)
          (2L * r(u) + d) / (2L * d)
        }.sum
        v -> (150000L + (85L * (m + danglingShare) + 50L) / 100L)
      }.toMap
    }
    r
  }

  private def runSpark(edges: Seq[(Long, Long)], iters: Int,
      parts: Int = 4, handleDangling: Boolean = true): Map[Long, Long] =
    PageRank.run(edges.toDF("src", "dst").repartition(parts), "src", "dst",
        iters, handleDangling = handleDangling)
      .select(col("id"),
        round(col("r") * 1000000.0, 0).cast("long").as("ri"))
      .collect().map(x => x.getLong(0) -> x.getLong(1)).toMap

  // A small asymmetric graph with a hub (1 ← everyone) and a chain.
  private val hubGraph: Seq[(Long, Long)] =
    Seq(2L -> 1L, 3L -> 1L, 4L -> 1L, 5L -> 1L, 1L -> 2L, 2L -> 3L, 3L -> 4L)

  test("exact equality with the independent reference on an asymmetric graph") {
    val got = runSpark(hubGraph, iters = 10)
    val exp = refPageRank(hubGraph, iters = 10)
    assert(got === exp)
    // the hub out-ranks every spoke
    assert(got(1L) === got.values.max)
  }

  test("dangling mass redistributes (sink node present)") {
    // 1→2, 1→3, 2→3; 3 is a sink. Without redistribution its collected
    // mass would vanish; with it, every node's rank includes the share.
    val g = Seq(1L -> 2L, 1L -> 3L, 2L -> 3L)
    val got = runSpark(g, iters = 8)
    val exp = refPageRank(g, iters = 8)
    assert(got === exp)
    val off = runSpark(g, iters = 8, handleDangling = false)
    val expOff = refPageRank(g, iters = 8, handleDangling = false)
    assert(off === expOff)
    // redistribution strictly raises the non-sink ranks
    assert(got(1L) > off(1L) && got(2L) > off(2L))
  }

  test("partition invariance: 1 vs 7 partitions, bit-identical") {
    assert(runSpark(hubGraph, 10, parts = 1) === runSpark(hubGraph, 10, parts = 7))
  }

  /** Independent PPR reference: teleport base on seeds, r⁰ = teleport
    * vector, dangling mass restarts at a seed. */
  private def refPpr(edges: Seq[(Long, Long)], seeds: Set[Long],
      iters: Int): Map[Long, Long] = {
    val nodes = (edges.map(_._1) ++ edges.map(_._2)).distinct.sorted
    val out = edges.groupBy(_._1).map { case (s, es) => s -> es.size.toLong }
    val in = edges.groupBy(_._2)
    val present = nodes.filter(seeds).toSet
    val sb = (150000L * nodes.size) / present.size
    def base(v: Long): Long = if (present(v)) sb else 0L
    var r: Map[Long, Long] = nodes.map(v => v -> base(v)).toMap
    for (_ <- 1 to iters) {
      val dSum = nodes.filterNot(out.contains).map(r).sum
      val dShare =
        if (dSum == 0L) 0L else (2L * dSum + present.size) / (2L * present.size)
      r = nodes.map { v =>
        val m = in.getOrElse(v, Seq.empty).map { case (u, _) =>
          val d = out(u)
          (2L * r(u) + d) / (2L * d)
        }.sum
        val restart = if (present(v)) dShare else 0L
        v -> (base(v) + (85L * (m + restart) + 50L) / 100L)
      }.toMap
    }
    r
  }

  private def runPpr(edges: Seq[(Long, Long)], seeds: Seq[Long],
      iters: Int, parts: Int = 4): Map[Long, Long] =
    PageRank.personalized(edges.toDF("src", "dst").repartition(parts),
        "src", "dst", seeds, iters)
      .select(col("id"),
        round(col("r") * 1000000.0, 0).cast("long").as("ri"))
      .collect().map(x => x.getLong(0) -> x.getLong(1)).toMap

  test("personalized: exact equality with the reference; mass localizes at seeds") {
    // two loosely-connected triangles; seed in the left one
    val g = Seq(1L -> 2L, 2L -> 3L, 3L -> 1L, 2L -> 1L, 3L -> 2L, 1L -> 3L,
      4L -> 5L, 5L -> 6L, 6L -> 4L, 5L -> 4L, 6L -> 5L, 4L -> 6L,
      3L -> 4L, 4L -> 3L)
    val got = runPpr(g, Seq(1L), iters = 10)
    assert(got === refPpr(g, Set(1L), 10))
    // walk-proximity: the seed's own triangle out-ranks the far one
    assert(got(2L) > got(5L) && got(3L) > got(6L))
  }

  test("personalized: dangling mass restarts at seeds; absent seed ids ignored") {
    val g = Seq(1L -> 2L, 2L -> 3L) // 3 is a sink
    val got = runPpr(g, Seq(1L, 99L), iters = 6) // 99 not in graph
    assert(got === refPpr(g, Set(1L), 6))
    assertThrows[IllegalArgumentException] {
      runPpr(g, Seq(98L, 99L), iters = 2) // NO seed present
    }
  }

  test("personalized: partition invariance") {
    val g = hubGraph
    assert(runPpr(g, Seq(2L, 3L), 8, parts = 1) ===
      runPpr(g, Seq(2L, 3L), 8, parts = 7))
  }

  test("purchaseGraph is symmetric, parity-disambiguated, and self-loop-free") {
    val orders = Seq((10L, 100L), (11L, 101L)).toDF("o_orderkey", "o_custkey")
    val li = Seq((10L, 7L), (10L, 8L), (11L, 7L)).toDF("l_orderkey", "l_partkey")
    val g = PageRank.purchaseGraph(orders, li)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val fwd = Set((200L, 15L), (200L, 17L), (202L, 15L))
    assert(g === fwd ++ fwd.map(_.swap))
    assert(g.forall { case (s, d) => s != d && (s % 2 != d % 2) })
  }
}
