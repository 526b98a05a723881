package graft.ext

import graft.SparkSpec

class ClusteringSpec extends SparkSpec {
  import spark.implicits._

  test("connectedComponents labels chains, triangles and singleton edges") {
    // components: {1,2,3,4} (path), {10,11,12} (triangle), {20,21} (edge)
    val edges = Seq((2L, 1L), (2L, 3L), (4L, 3L),
      (10L, 11L), (11L, 12L), (12L, 10L),
      (21L, 20L)).toDF("a", "b")
    val got = Clustering.connectedComponents(edges, "a", "b")
      .as[(Long, Long)].collect().toMap
    assert(got === Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 4L -> 1L,
      10L -> 10L, 11L -> 10L, 12L -> 10L, 20L -> 20L, 21L -> 20L))
  }

  test("connectedComponents converges on a long path (diameter > 1 round)") {
    val n = 64
    val edges = (1 until n).map(i => (i.toLong, (i + 1).toLong)).toDF("a", "b")
    val got = Clustering.connectedComponents(edges, "a", "b")
      .as[(Long, Long)].collect()
    assert(got.length === n)
    assert(got.forall(_._2 === 1L))
  }

  test("clusterSizes summarizes components by min-id representative") {
    val edges = Seq((1L, 2L), (2L, 3L), (8L, 9L)).toDF("id_a", "id_b")
    val got = Clustering.clusterSizes(edges, "id_a", "id_b")
      .as[(Long, Long)].collect().toSeq
    assert(got === Seq((1L, 3L), (8L, 2L)))
  }
}
