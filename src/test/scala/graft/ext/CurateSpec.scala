package graft.ext

import graft.SparkSpec

class CurateSpec extends SparkSpec {
  import spark.implicits._

  // docs 1 and 2 are near-identical (one token differs); 2 is LONGER →
  // higher length-driven quality, so the cluster's rep must be 2, not
  // min-id 1. Docs 3/4 are unique singletons. Doc 5 is another language.
  private def mk(n: Int, tail: String) =
    (1 to n).map(i => s"w$i").mkString(" ") + " " + tail
  private def docs = Seq(
    (1L, "en", mk(40, "the a and of common tail ending here")),
    (2L, "en", mk(40, "the a and of common tail ending here plus extra richer content with the stopwords and more of the same")),
    (3L, "en", "completely different unique document " + mk(30, "x")),
    (4L, "en", "another entirely distinct text body " + mk(25, "y")),
    (5L, "de", "der die das und ist ein " + mk(20, "z"))
  ).toDF("doc_id", "lang", "text")
    .withColumn("n_chars", org.apache.spark.sql.functions.length($"text"))

  test("curate keeps the highest-quality rep per near-dup cluster, budgets per language") {
    val kept = Curate.curate(docs, "doc_id", "text", "lang", "n_chars",
        threshold = 0.6, budgets = Map("en" -> 100000L, "de" -> 100000L))
      .select("doc_id").as[Long].collect().toSet
    assert(!kept.contains(1L), "lower-quality duplicate must be dropped")
    assert(kept.contains(2L), "highest-quality copy is the representative")
    assert(kept === Set(2L, 3L, 4L, 5L))
  }

  test("budget cut drops the worst-quality docs first; unbudgeted languages vanish") {
    // en budget fits only the best doc(s); de has no budget at all
    val q = Curate.curate(docs, "doc_id", "text", "lang", "n_chars",
      threshold = 0.6, budgets = Map("en" -> 1L))
    val kept = q.select("doc_id").as[Long].collect().toSet
    assert(kept.size === 1, s"one doc starts inside a 1-char budget: $kept")
    // the kept doc is the quality-max of the deduped en pool
    val pool = Curate.curate(docs, "doc_id", "text", "lang", "n_chars",
      threshold = 0.6, budgets = Map("en" -> 100000L))
    val best = pool.orderBy(org.apache.spark.sql.functions.col("quality").desc,
      org.apache.spark.sql.functions.col("doc_id")).select("doc_id").as[Long].head()
    assert(kept === Set(best))
  }

  test("leakage-safe split: clusters move as units, no near-dup pair straddles") {
    import org.apache.spark.sql.functions.col
    // a wider corpus: three near-dup clusters + many singletons so every
    // split label actually occurs
    val wide = (1 to 60).map { i =>
      val base = (1 to 30).map(j => s"w${i}_$j").mkString(" ")
      (i.toLong * 10, base)
    } ++ Seq(
      (601L, mk(40, "shared tail one")), (602L, mk(40, "shared tail one x")),
      (603L, mk(40, "shared tail one y")),
      (701L, mk(35, "other shared tail")), (702L, mk(35, "other shared tail q")))
    val wdf = wide.toDF("doc_id", "text")
    val got = Curate.leakageSafeSplit(wdf, "doc_id", "text",
      threshold = 0.6, weights = Seq(("train", 8), ("val", 1), ("test", 1)))
    val rows = got.collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getString(2)))).toMap
    assert(rows.size == wide.size, "every doc gets a split")
    // cluster members share rep AND split
    for (grp <- Seq(Seq(601L, 602L, 603L), Seq(701L, 702L))) {
      assert(grp.map(rows(_)._1).distinct.size == 1, s"$grp reps differ")
      assert(grp.map(rows(_)._2).distinct.size == 1, s"$grp splits differ")
    }
    // no emitted near-dup pair straddles a split boundary
    val pairs = Dedup.minHashLshPairs(wdf, "doc_id", "text", 0.6)
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(pairs.nonEmpty)
    for ((a, b) <- pairs)
      assert(rows(a)._2 == rows(b)._2, s"pair ($a,$b) straddles splits")
    // singletons draw on their own id — the q43 distribution carries over
    val singles = wide.map(_._1).filter(_ < 601L)
    assert(singles.map(rows(_)._2).distinct.size == 3,
      "all three split labels occur across 60 singletons")
  }
}
