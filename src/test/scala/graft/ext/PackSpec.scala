package graft.ext

import org.apache.spark.sql.functions._

import graft.SparkSpec

class PackSpec extends SparkSpec {
  import spark.implicits._

  private def docs = Seq(
    // group g1: sizes 300, 300, 500, 100 with capacity 512
    ("g1", 1L, 300L), ("g1", 2L, 300L), ("g1", 3L, 500L), ("g1", 4L, 100L),
    // group g2: an oversize doc (1300 > 512) between normal ones
    ("g2", 1L, 200L), ("g2", 2L, 1300L), ("g2", 3L, 200L)
  ).toDF("g", "ord", "sz")

  test("chunkAssign computes stream offsets and sequence spans per group") {
    val got = Pack.chunkAssign(docs, "g", "ord", "sz", 512)
      .select("g", "ord", "tok_start", "seq_first", "seq_last")
      .as[(String, Long, Long, Long, Long)].collect().toSet
    assert(got === Set(
      ("g1", 1L, 0L, 0L, 0L),       // tokens [0, 300)
      ("g1", 2L, 300L, 0L, 1L),     // [300, 600) spans the 512 cut
      ("g1", 3L, 600L, 1L, 2L),     // [600, 1100) spans the 1024 cut
      ("g1", 4L, 1100L, 2L, 2L),    // [1100, 1200)
      ("g2", 1L, 0L, 0L, 0L),
      ("g2", 2L, 200L, 0L, 2L),     // oversize: spans three sequences
      ("g2", 3L, 1500L, 2L, 3L)))
  }

  test("chunkAssign invariants: contiguous stream, non-negative spans") {
    val out = Pack.chunkAssign(docs, "g", "ord", "sz", 512)
    // next doc starts exactly where the previous ended
    val gaps = out.selectExpr("g", "ord", "tok_start", "sz")
      .withColumn("expected_next",
        col("tok_start") + col("sz"))
      .as[(String, Long, Long, Long, Long)].collect()
      .groupBy(_._1).values.flatMap { rows =>
        rows.sortBy(_._2).sliding(2).collect {
          case Array(a, b) => b._3 - a._5
        }
      }
    assert(gaps.forall(_ === 0L), gaps.toSeq.toString)
    assert(out.filter(col("seq_last") < col("seq_first")).count() === 0L)
  }

  test("sharded two-level prefix sum equals the plain per-group window") {
    val rnd = new scala.util.Random(23)
    val data = (1 to 500).map(i => ("g" + (i % 3), i.toLong, (rnd.nextInt(300) + 1).toLong))
      .toDF("g", "ord", "sz")
    def run(shards: Int) = Pack.chunkAssign(data, "g", "ord", "sz", 512, shards)
      .select("g", "ord", "tok_start", "seq_first", "seq_last")
      .as[(String, Long, Long, Long, Long)].collect().toSet
    val plain = run(0)
    assert(run(7) === plain)
    assert(run(32) === plain) // more shards than rows-per-shard boundaries
  }

  test("packGreedy: bins fill greedily, never split, oversize gets own bin") {
    val got = Pack.packGreedy(docs, "g", "ord", "sz", 512)
      .select("g", "ord", "bin")
      .as[(String, Long, Long)].collect().toSet
    assert(got === Set(
      ("g1", 1L, 0L),  // fill 300
      ("g1", 2L, 1L),  // 300+300 > 512 -> new bin
      ("g1", 3L, 2L),  // 300+500 > 512 -> new bin
      ("g1", 4L, 3L),  // 500+100 > 512 -> new bin
      ("g2", 1L, 0L),
      ("g2", 2L, 1L),  // oversize 1300 gets a bin of its own
      ("g2", 3L, 2L))) // 1300+200 > 512 -> next bin
  }

  test("packGreedy properties: capacity respected, bins dense and monotone") {
    val rnd = new scala.util.Random(11)
    val data = (1 to 200).map(i => ("s" + (i % 4), i.toLong, (rnd.nextInt(400) + 1).toLong))
      .toDF("g", "ord", "sz")
    val out = Pack.packGreedy(data, "g", "ord", "sz", 512)
      .as[(String, Long, Long, Long)].collect()
    out.groupBy(_._1).values.foreach { rows =>
      val sorted = rows.sortBy(_._2)
      // monotone non-decreasing bins in order, steps of at most 1
      val bins = sorted.map(_._4)
      assert(bins.head === 0L)
      bins.sliding(2).foreach { case Array(a, b) =>
        assert(b === a || b === a + 1, s"bins jump: $a -> $b")
      case _ => }
      // every bin's fill <= capacity (all sizes here are <= 400 < 512)
      val fills = sorted.groupBy(_._4).values.map(_.map(_._3).sum)
      assert(fills.forall(_ <= 512L), fills.toString)
      // greedy: a new bin only opens because the doc would not have fit
      sorted.sliding(2).foreach { case Array(a, b) =>
        if (b._4 == a._4 + 1) {
          val prevFill = sorted.filter(r => r._4 == a._4).map(_._3).sum
          assert(prevFill + b._3 > 512L, s"bin closed early at fill $prevFill + ${b._3}")
        }
      case _ => }
    }
  }
}
