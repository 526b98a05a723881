package graft.ext

import org.apache.spark.sql.functions._
import graft.{SparkSpec, Tables}

class DedupSpec extends SparkSpec {

  private lazy val docs = Tables.documents(spark, sf0001).cache()

  /** Ground truth: exact all-pairs 3-gram Jaccard ≥ 0.8 (small corpus only —
    * this is exactly what LSH exists to avoid at scale). */
  private lazy val exactPairs: Set[(Long, Long)] = {
    val sh = docs.select(col("doc_id"), TextPrep.shingles(col("text"), 3).as("sh"))
      .filter(size(col("sh")) > 0)
    sh.as("a").join(sh.as("b"), col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id").as("ia"), col("b.doc_id").as("ib"),
        round(TextPrep.jaccard(col("a.sh"), col("b.sh")), 6).as("j"))
      .where(col("j") >= 0.8)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
  }

  test("minHashLshPairs finds exactly the all-pairs-exact near-dup set") {
    val lsh = Dedup.minHashLshPairs(docs, "doc_id", "text", 0.8)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(exactPairs.nonEmpty, "test corpus should contain planted near-dups")
    assert(lsh === exactPairs)
  }

  test("simHashPairs recalls the high-similarity pairs") {
    val sim = Dedup.simHashPairs(docs, "doc_id", "text", maxHamming = 16)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    // SimHash is a different sketch; require it to recover most of the
    // exact near-dup set (these pairs have jaccard ≥ 0.8, typically ≥ 0.9).
    val recalled = exactPairs.intersect(sim).size.toDouble / exactPairs.size
    assert(recalled >= 0.8, s"simhash recall $recalled over ${exactPairs.size} pairs")
  }

  test("dropNearDuplicates keeps one rep per cluster and every unclustered doc") {
    val survivors = Dedup.dropNearDuplicates(docs, "doc_id", "text", 0.8)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    // closure-correct expectation from the exact pair set
    val comps = Clustering.connectedComponents(
      docs.sparkSession.createDataFrame(
        exactPairs.toSeq.map(p => (p._1, p._2))).toDF("id_a", "id_b"),
      "id_a", "id_b")
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    val dropped = comps.filter { case (node, comp) => node != comp }.map(_._1).toSet
    val allIds = docs.select("doc_id").collect().map(_.getLong(0)).toSet
    assert(survivors === (allIds -- dropped))
    assert(dropped.nonEmpty, "test corpus should contain planted near-dups")
  }

  test("dropNearDuplicatesKeepBest keeps the argmax(keepCol) member per cluster") {
    val survivors = Dedup.dropNearDuplicatesKeepBest(docs, "doc_id", "text",
        keepCol = "n_chars", threshold = 0.8)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    // expectation from the exact pair set: per component keep the
    // longest doc (ties min id); everything unclustered survives
    val comps = Clustering.connectedComponents(
      docs.sparkSession.createDataFrame(
        exactPairs.toSeq.map(p => (p._1, p._2))).toDF("id_a", "id_b"),
      "id_a", "id_b")
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    val chars = docs.select("doc_id", "n_chars").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val winners = comps.groupBy(_._2).values.map { members =>
      members.map(_._1).minBy(id => (-chars(id), id))
    }.toSet
    val clustered = comps.map(_._1).toSet
    val allIds = docs.select("doc_id").collect().map(_.getLong(0)).toSet
    assert(survivors === (allIds -- clustered) ++ winners)
    // the policy genuinely differs from min-id keep on this corpus —
    // otherwise the test proves nothing beyond dropNearDuplicates
    val minIdWinners = comps.groupBy(_._2).values.map(_.map(_._1).min).toSet
    assert(winners !== minIdWinners,
      "corpus has no cluster where the longest member isn't the min id; " +
        "pick a different keepCol to keep this spec meaningful")
  }

  test("exactKeepFirst: dedup(x ++ x) == dedup(x) and keeps min id") {
    import spark.implicits._
    val df = Seq((1L, "a"), (2L, "a"), (3L, "b")).toDF("id", "text")
    val once = Dedup.exactKeepFirst(df, "text", "id")
    val twice = Dedup.exactKeepFirst(df.unionAll(df), "text", "id")
    assert(once.select("text", "id").collect().map(r => (r.getString(0), r.getLong(1))).toSet
      === Set(("a", 1L), ("b", 3L)))
    assert(twice.select("text", "id").collect().map(r => (r.getString(0), r.getLong(1))).toSet
      === Set(("a", 1L), ("b", 3L)))
  }

  test("ngramJaccard: identical text has jaccard 1.0; disjoint has 0.0") {
    import spark.implicits._
    val d = Seq((1L, "a b c d e"), (2L, "a b c d e"), (3L, "x y z w q")).toDF("doc_id", "text")
    val pairs = Seq((1L, 2L), (1L, 3L)).toDF("id_a", "id_b")
    val out = Dedup.ngramJaccard(d, pairs, "doc_id", "text", 3)
      .collect().map(r => ((r.getLong(1), r.getLong(0)), r.getDouble(2))).toMap
    // note: ngramJaccard output column order is (id_a, id_b, jaccard) after joins
    val byPair = Dedup.ngramJaccard(d, pairs, "doc_id", "text", 3)
      .select("id_a", "id_b", "jaccard")
      .collect().map(r => ((r.getLong(0), r.getLong(1)), r.getDouble(2))).toMap
    assert(byPair((1L, 2L)) === 1.0)
    assert(byPair((1L, 3L)) === 0.0)
  }

  test("embeddingNearDup is symmetric-free (each pair once) and thresholded") {
    val out = Dedup.embeddingNearDup(Tables.embeddings(spark, sf0001), "vec_id", "embedding", 0.4)
      .collect()
    assert(out.forall(r => r.getLong(0) < r.getLong(1)))
    assert(out.forall(r => r.getDouble(2) >= 0.4))
  }

  test("embeddingNearDupLsh emits only true pairs (subset of exact) with real recall") {
    val emb = Tables.embeddings(spark, sf0001)
    val key = (r: org.apache.spark.sql.Row) => (r.getLong(0), r.getLong(1))
    val exact = Dedup.embeddingNearDup(emb, "vec_id", "embedding", 0.4)
      .collect().map(key).toSet
    val lsh = Dedup.embeddingNearDupLsh(emb, "vec_id", "embedding", 0.4,
      tables = 12, bits = 4).collect().map(key).toSet
    assert(lsh.subsetOf(exact), "LSH pairs are exact-verified, so never false positives")
    assert(exact.nonEmpty)
    val recall = lsh.size.toDouble / exact.size
    // uniform-random vectors at cos 0.4 are ANN's hardest case; the bucket
    // stage must still recover a solid majority of the true pairs
    assert(recall >= 0.5, s"recall $recall over ${exact.size} exact pairs")
  }

  test("segmentDedup keeps first occurrences, rebuilds docs, drops emptied docs") {
    val d = spark.createDataFrame(Seq(
      // doc 1: two distinct segments (2-word windows)
      (1L, "a b c d"),
      // doc 2: first segment duplicates doc 1's first; second is new
      (2L, "a b x y"),
      // doc 3: exact duplicate of doc 1 — loses everything
      (3L, "a b c d"),
      // doc 4: short tail segment, unique
      (4L, "p q r"))).toDF("doc_id", "text")
    val out = Dedup.segmentDedup(d, "doc_id", "text", 2)
      .collect().map(r => r.getLong(0) ->
        ((r.getString(1), r.getLong(2), r.getLong(3)))).toMap
    assert(out.keySet === Set(1L, 2L, 4L), "doc 3 is fully duplicate")
    assert(out(1L) === (("a b c d", 2L, 2L)))
    assert(out(2L) === (("x y", 1L, 2L)), "dup head segment cut, tail survives")
    assert(out(4L) === (("p q r", 2L, 2L)), "short tail segment kept intact")
  }

  test("segmentDedup is idempotent: re-running on its output changes nothing") {
    val docs3 = Tables.documents(spark, sf0001)
    val once = Dedup.segmentDedup(docs3, "doc_id", "text", 12)
    val twice = Dedup.segmentDedup(once, "doc_id", "text", 12)
      .select("doc_id", "text")
    assert(once.select("doc_id", "text").exceptAll(twice).isEmpty &&
      twice.exceptAll(once.select("doc_id", "text")).isEmpty)
  }

  test("substringDedup removes repeated sliding spans, keeps first occurrence") {
    val d = spark.createDataFrame(Seq(
      // doc 1: owns the first occurrence of every one of its 3-grams
      (1L, "a b c d e"),
      // doc 2: embeds doc 1's span "b c d" mid-document — windows at the
      // straddling positions are dups, so exactly those 3 tokens vanish
      (2L, "x y b c d z w"),
      // doc 3: exact duplicate of doc 1 — every window is a dup, doc empties
      (3L, "a b c d e"),
      // doc 4: shorter than the window — no windows, passes through
      (4L, "p q"),
      // doc 5: internal repetition — second "m n o" is a dup of the first
      (5L, "m n o u v m n o"))).toDF("doc_id", "text")
    val out = Dedup.substringDedup(d, "doc_id", "text", 3)
      .collect().map(r => r.getLong(0) ->
        ((r.getString(1), r.getLong(2), r.getLong(3)))).toMap
    assert(out.keySet === Set(1L, 2L, 3L, 4L, 5L),
      "rewrite, not filter: emptied docs stay, with zero kept tokens")
    assert(out(1L) === (("a b c d e", 5L, 5L)))
    assert(out(2L) === (("x y z w", 4L, 7L)), "only the borrowed span is cut")
    assert(out(3L) === (("", 0L, 5L)), "full duplicate loses every token")
    assert(out(4L) === (("p q", 2L, 2L)), "sub-window doc untouched")
    assert(out(5L) === (("m n o u v", 5L, 8L)), "internal repeat cut once")
  }

  test("substringDedup catches tile-straddling dupes segmentDedup misses") {
    // The duplicated span "c d e f" straddles doc 2's 4-token tile
    // boundary (tiles: [q r c d] [e f s t]) — segment dedup sees no
    // duplicate tile, substring dedup removes the span.
    val d = spark.createDataFrame(Seq(
      (1L, "a b c d e f g h"),
      (2L, "q r c d e f s t"))).toDF("doc_id", "text")
    val seg = Dedup.segmentDedup(d, "doc_id", "text", 4)
      .where(col("doc_id") === 2L).select("text")
      .collect().head.getString(0)
    assert(seg === "q r c d e f s t", "tiling misses the straddling span")
    val sub = Dedup.substringDedup(d, "doc_id", "text", 4)
      .where(col("doc_id") === 2L).select("text")
      .collect().head.getString(0)
    assert(sub === "q r s t", "sliding windows remove it")
  }

  test("substringDedup excludes null-text docs and matches between runs") {
    val d = spark.createDataFrame(Seq(
      (1L, Option("a b c")), (2L, Option.empty[String])))
      .toDF("doc_id", "text")
    val out = Dedup.substringDedup(d, "doc_id", "text", 2)
    assert(out.select("doc_id").collect().map(_.getLong(0)).toSet === Set(1L))
    // deterministic on the real corpus: two runs, identical bytes
    val a = Dedup.substringDedup(docs, "doc_id", "text", 8)
    val b = Dedup.substringDedup(docs, "doc_id", "text", 8)
    assert(a.exceptAll(b).isEmpty && b.exceptAll(a).isEmpty)
  }
}
