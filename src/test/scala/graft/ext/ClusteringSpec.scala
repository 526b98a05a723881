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

  private def fullCc(edges: Seq[(Long, Long)]): Map[Long, Long] =
    Clustering.connectedComponents(edges.toDF("a", "b"), "a", "b")
      .as[(Long, Long)].collect().toMap

  private def incCc(base: Seq[(Long, Long)],
      inc: Seq[(Long, Long)]): Map[Long, Long] = {
    val stored = Clustering.connectedComponents(base.toDF("a", "b"), "a", "b")
    Clustering.appendEdges(stored, inc.toDF("a", "b"), "a", "b")
      .as[(Long, Long)].collect().toMap
  }

  test("appendEdges merges two stored components through a bridge edge") {
    val base = Seq((1L, 2L), (2L, 3L), (10L, 11L), (20L, 21L))
    val got = incCc(base, Seq((3L, 10L)))
    assert(got === fullCc(base :+ (3L, 10L)))
    assert(got(11L) === 1L) // far endpoint of the merged component relabels
    assert(got(20L) === 20L) // untouched component keeps its label
  }

  test("appendEdges handles new-only, new-old, and intra-component edges") {
    val base = Seq((1L, 2L), (5L, 6L))
    // 100-101 brand new; 7 joins {5,6}; 1-2 is a no-op repeat
    val inc = Seq((100L, 101L), (6L, 7L), (1L, 2L))
    val got = incCc(base, inc)
    assert(got === fullCc(base ++ inc))
    assert(got(100L) === 100L && got(101L) === 100L)
    assert(got(7L) === 5L)
  }

  test("appendEdges merging three stored components picks the global min") {
    val base = Seq((4L, 5L), (8L, 9L), (2L, 3L))
    val inc = Seq((5L, 8L), (9L, 3L)) // chains all three together
    val got = incCc(base, inc)
    assert(got === fullCc(base ++ inc))
    assert(got.values.toSet === Set(2L))
  }

  test("appendEdges ≡ full recompute on random graphs across random splits") {
    val rnd = new scala.util.Random(7)
    for (trial <- 1 to 5) {
      val n = 40 + trial * 10
      val edges = Seq.fill(n)((rnd.nextInt(60).toLong, rnd.nextInt(60).toLong))
        .filter(e => e._1 != e._2)
      val cut = rnd.nextInt(edges.size)
      val (base, inc) = edges.splitAt(cut)
      // base may be empty at cut=0 — the degenerate split must still hold
      val stored =
        Clustering.connectedComponents(base.toDF("a", "b"), "a", "b")
      val got = Clustering.appendEdges(stored, inc.toDF("a", "b"), "a", "b")
        .as[(Long, Long)].collect().toMap
      assert(got === fullCc(edges), s"trial $trial cut $cut")
    }
  }

  test("IndexStore cc lifecycle: write, chained appends, load, compact") {
    val dir = java.nio.file.Files
      .createTempDirectory("graft_cc_spec").toString
    val base = Seq((1L, 2L), (10L, 11L), (20L, 21L), (30L, 31L))
    IndexStore.writeCc(
      Clustering.connectedComponents(base.toDF("a", "b"), "a", "b"), dir)
    // append 1 merges {1,2}+{10,11}; append 2 chains in {20,21} through
    // the ALREADY-FORWARDED label 10 → exercises chain resolution a→b→c
    IndexStore.appendCcEdges(Seq((2L, 10L)).toDF("a", "b"), "a", "b", dir)
    IndexStore.appendCcEdges(Seq((11L, 20L), (40L, 41L)).toDF("a", "b"),
      "a", "b", dir)
    val want = fullCc(base ++ Seq((2L, 10L), (11L, 20L), (40L, 41L)))
    val got = IndexStore.loadCc(spark, dir).as[(Long, Long)].collect().toMap
    assert(got === want)
    // compaction drops the forwarding pile without changing the labeling
    IndexStore.compactCc(spark, dir)
    assert(!java.nio.file.Files.exists(java.nio.file.Paths.get(dir, "forward")))
    val gotC = IndexStore.loadCc(spark, dir).as[(Long, Long)].collect().toMap
    assert(gotC === want)
    // and a post-compaction append still folds in correctly
    IndexStore.appendCcEdges(Seq((31L, 40L)).toDF("a", "b"), "a", "b", dir)
    val want2 = fullCc(base ++
      Seq((2L, 10L), (11L, 20L), (40L, 41L), (31L, 40L)))
    val got2 = IndexStore.loadCc(spark, dir).as[(Long, Long)].collect().toMap
    assert(got2 === want2)
  }

  test("loadCc plan: the corpus-sized labels table crosses exactly one join") {
    val dir = java.nio.file.Files
      .createTempDirectory("graft_cc_plan").toString
    IndexStore.writeCc(
      Clustering.connectedComponents(
        Seq((1L, 2L), (10L, 11L)).toDF("a", "b"), "a", "b"), dir)
    IndexStore.appendCcEdges(Seq((2L, 10L)).toDF("a", "b"), "a", "b", dir)
    // forwarding resolution runs eagerly on the (append-bounded) forward
    // table; the RETURNED plan must be labels ⋈ resolved-forward and
    // nothing else — the scale claim of the MOR design
    val plan = IndexStore.loadCc(spark, dir).queryExecution.analyzed
    val joins = plan.collect {
      case j: org.apache.spark.sql.catalyst.plans.logical.Join => j }
    assert(joins.size === 1, s"labels must cross exactly one join:\n$plan")
  }

  test("appendCcEdges with a pure no-op increment appends nothing visible") {
    val dir = java.nio.file.Files
      .createTempDirectory("graft_cc_noop").toString
    val base = Seq((1L, 2L), (2L, 3L))
    IndexStore.writeCc(
      Clustering.connectedComponents(base.toDF("a", "b"), "a", "b"), dir)
    IndexStore.appendCcEdges(Seq((1L, 3L)).toDF("a", "b"), "a", "b", dir)
    val got = IndexStore.loadCc(spark, dir).as[(Long, Long)].collect().toMap
    assert(got === fullCc(base))
  }
}
