package graft.ext

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** [[GraphAlgos]] contracts: triangle counts vs a brute-force triple
  * enumeration, the degree-orientation hub bound, and BFS vs a reference
  * queue implementation with depth-cap and reachability edges.
  */
class GraphAlgosSpec extends SparkSpec {
  import spark.implicits._

  private def bruteTriangles(edges: Seq[(Long, Long)]): Long = {
    val es = edges.map { case (a, b) => (math.min(a, b), math.max(a, b)) }
      .filter(p => p._1 != p._2).distinct.toSet
    val nodes = es.flatMap(p => Seq(p._1, p._2)).toSeq.sorted
    (for {
      i <- nodes.indices; j <- i + 1 until nodes.size; k <- j + 1 until nodes.size
      if es((nodes(i), nodes(j))) && es((nodes(j), nodes(k))) &&
        es((nodes(i), nodes(k)))
    } yield 1).size.toLong
  }

  private def deterministicGraph(n: Int, m: Int): Seq[(Long, Long)] =
    (0 until m).map { i =>
      val a = math.abs((i * 2654435761L + 17) % n)
      val b = math.abs((i * 40503L + 7919) % n)
      (a, b)
    }.filter(p => p._1 != p._2)

  test("triangle count equals brute force on a pseudo-random graph") {
    val g = deterministicGraph(30, 120)
    val got = GraphAlgos.triangleCount(g.toDF("x", "y"), "x", "y")
      .collect()(0)
    assert(got.getLong(0) === bruteTriangles(g))
    // n_edges / n_nodes audit the dedup + self-loop drop
    val es = g.map(p => (math.min(p._1, p._2), math.max(p._1, p._2))).distinct
    assert(got.getLong(1) === es.size.toLong)
    assert(got.getLong(2) === es.flatMap(p => Seq(p._1, p._2)).distinct.size.toLong)
  }

  test("hub graph: orientation points INTO the hub; closed fans count exactly") {
    // star 0-1..0-8 plus ring edges 1-2, 3-4: exactly 2 triangles
    val g = (1L to 8L).map(i => (0L, i)) ++ Seq((1L, 2L), (3L, 4L))
    val got = GraphAlgos.triangleCount(g.toDF("x", "y"), "x", "y").collect()(0)
    assert(got.getLong(0) === 2L)
    // degree orientation: the hub (deg 8) receives every star edge, so no
    // wedge is centered on it — max out-degree stays ≤ 2 on this graph
    val dir = GraphAlgos.orient(g.toDF("x", "y"), "x", "y")
    val maxOut = dir.groupBy("src").count().agg(max("count")).collect()(0).getLong(0)
    assert(maxOut <= 2L)
  }

  test("bfs distances equal a reference BFS; depth cap honored") {
    val g = deterministicGraph(40, 80)
    val adj = (g ++ g.map(_.swap)).groupBy(_._1).view
      .mapValues(_.map(_._2).distinct).toMap
    def ref(src: Long, cap: Int): Map[Long, Int] = {
      var dist = Map(src -> 0)
      var frontier = Seq(src)
      var d = 0
      while (d < cap && frontier.nonEmpty) {
        d += 1
        val next = frontier.flatMap(adj.getOrElse(_, Seq.empty))
          .distinct.filterNot(dist.contains)
        dist ++= next.map(_ -> d)
        frontier = next
      }
      dist
    }
    val src = g.head._1
    for (cap <- Seq(0, 2, 10)) {
      val got = GraphAlgos.bfsDistances(g.toDF("x", "y"), "x", "y", src, cap)
        .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
      assert(got === ref(src, cap), s"cap=$cap")
    }
  }

  test("bfs: disconnected component stays unreached") {
    val g = Seq((1L, 2L), (2L, 3L), (10L, 11L))
    val got = GraphAlgos.bfsDistances(g.toDF("x", "y"), "x", "y", 1L, 5)
      .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    assert(got === Map(1L -> 0, 2L -> 1, 3L -> 2))
  }
}
