package graft.ext

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.{SparkSpec, Tables}

/** [[IndexStore.compact]] — the inc-chain fold (VERDICT r12 What's-wrong
  * #2): after any number of appends, compaction must leave the bundle
  * serving EXACTLY the same rows (load-after ≡ load-before, search
  * results identical), with `meta.incs` empty, the increment directories
  * gone, and the base re-clustered into one versioned dir the meta CAS
  * swapped in. Post-compaction appends must keep working (the pointer
  * must survive the append's meta rewrite), and a second compaction is a
  * no-op. An UNCOMMITTED compaction stage must be invisible to loads —
  * the crash-atomicity half, extending IndexStoreAtomicitySpec's
  * kill-between-steps matrix to the compact step. */
class IndexStoreCompactSpec extends SparkSpec {

  private lazy val embeddings = Tables.embeddings(spark, sf0001)
  private lazy val docs = Tables.documents(spark, sf0001)
    .select(col("doc_id"), col("text"))
  private lazy val docMax: Long = docs.agg(max(col("doc_id"))).head().getLong(0)

  private def tmp(): String =
    Files.createTempDirectory("graft-compact").toString

  private def assertSame(a: DataFrame, b: DataFrame, hint: String): Unit =
    assert(a.exceptAll(b).isEmpty && b.exceptAll(a).isEmpty, hint)

  private def incs(dir: String): Seq[String] = {
    val m = new com.fasterxml.jackson.databind.ObjectMapper()
      .readTree(Files.readAllBytes(Paths.get(dir, "meta.json")))
    Option(m.get("incs"))
      .map(n => (0 until n.size).map(i => n.get(i).asText()).toSeq)
      .getOrElse(Seq.empty)
  }

  private def assertCompacted(dir: String): Unit = {
    assert(incs(dir).isEmpty, s"$dir: meta.incs must reset on compaction")
    assert(!Files.exists(Paths.get(dir, "inc")),
      s"$dir: the folded increment pile must be GC'd")
  }

  test("lsh: compact folds buckets + vectors; load and GC state exact; post-compact append works") {
    val cut = 400L
    val base = embeddings.where(col("vec_id") < cut)
    val mid = embeddings.where(col("vec_id") >= cut && col("vec_id") < 450L)
    val last = embeddings.where(col("vec_id") >= 450L)
    val dir = tmp()
    val built = LshIndex.build(base, "vec_id", "embedding", tables = 4, dim = 64)
    IndexStore.writeLsh(built, dir)
    IndexStore.writeLshVectors(base, "vec_id", "embedding", dir)
    LshIndex.drop(built)
    IndexStore.appendLsh(mid, "vec_id", "embedding", dir)
    val preB = IndexStore.loadLsh(spark, dir).buckets.collect().toSet
    val preV = IndexStore.loadLshVectors(spark, dir).collect().toSet
    IndexStore.compact(spark, dir)
    assertCompacted(dir)
    assert(!Files.exists(Paths.get(dir, "buckets")) &&
      !Files.exists(Paths.get(dir, "vectors")),
      "old base dirs must be GC'd after the pointer swap")
    assert(IndexStore.loadLsh(spark, dir).buckets.collect().toSet === preB,
      "compaction changed the served bucket rows")
    assert(IndexStore.loadLshVectors(spark, dir).collect().toSet === preV,
      "compaction changed the served vector rows")
    // append AFTER compaction: the pointer must ride the append's meta
    IndexStore.appendLsh(last, "vec_id", "embedding", dir)
    val after = IndexStore.loadLsh(spark, dir)
    assertSame(after.buckets,
      Similarity.lshBuckets(embeddings.select(col("vec_id"), col("embedding")),
        "vec_id", "embedding", after.tables, after.bits, after.dim),
      "post-compaction append must still equal the frozen-plane rebuild")
    // and a second compact folds it again, identically (rows snapshotted
    // first: the fold GCs the files the lazy `after` plan reads)
    val afterRows = after.buckets.collect().toSet
    IndexStore.compact(spark, dir)
    assertCompacted(dir)
    assert(IndexStore.loadLsh(spark, dir).buckets.collect().toSet === afterRows,
      "second compaction changed rows")
  }

  test("lshb: compact folds the bucket-clustered rows; search identical") {
    val cut = 450L
    val base = embeddings.where(col("vec_id") < cut)
    val inc = embeddings.where(col("vec_id") >= cut)
    val dir = tmp()
    val built = LshIndex.build(base, "vec_id", "embedding", tables = 4, dim = 64)
    IndexStore.writeLshBucketed(built, base, "vec_id", "embedding", dir)
    LshIndex.drop(built)
    IndexStore.appendLshBucketed(inc, "vec_id", "embedding", dir)
    val probes = embeddings.where(col("vec_id") < 3)
      .select(col("vec_id").as("probe_id"), col("embedding").as("pv"))
    val pre = IndexStore.loadLshBucketed(spark, dir)
    val preRows = pre.rows.collect().toSet
    val preSearch = LshIndex.searchBucketed(pre, probes,
      "vec_id", "embedding", "probe_id", "pv", k = 5).collect().toSet
    IndexStore.compact(spark, dir)
    assertCompacted(dir)
    val post = IndexStore.loadLshBucketed(spark, dir)
    assert(post.rows.collect().toSet === preRows,
      "compaction changed the bucketed row set")
    assert(LshIndex.searchBucketed(post, probes,
      "vec_id", "embedding", "probe_id", "pv", k = 5).collect().toSet
      === preSearch, "compaction changed search results")
  }

  test("lshbq: compact folds q8 rows AND the float vectors table; search identical") {
    val cut = 450L
    val base = embeddings.where(col("vec_id") < cut)
    val inc = embeddings.where(col("vec_id") >= cut)
    val dir = tmp()
    val built = LshIndex.build(base, "vec_id", "embedding", tables = 4, dim = 64)
    IndexStore.writeLshBucketedQ8(built, base, "vec_id", "embedding", dir)
    LshIndex.drop(built)
    IndexStore.appendLshBucketedQ8(inc, "vec_id", "embedding", dir)
    val probes = embeddings.where(col("vec_id") < 3)
      .select(col("vec_id").as("probe_id"), col("embedding").as("pv"))
    val pre = IndexStore.loadLshBucketedQ8(spark, dir)
    val preRows = pre.rows.collect().toSet
    val preVecs = pre.vectors.collect().map(r =>
      (r.getLong(0), r.getSeq[Float](1))).toSet
    val preSearch = LshIndex.searchBucketedQ8(pre, probes,
      "vec_id", "embedding", "probe_id", "pv", k = 5).collect().toSet
    IndexStore.compact(spark, dir)
    assertCompacted(dir)
    val post = IndexStore.loadLshBucketedQ8(spark, dir)
    assert(post.rows.collect().toSet === preRows,
      "compaction changed the q8 row set")
    assert(post.vectors.collect().map(r =>
      (r.getLong(0), r.getSeq[Float](1))).toSet === preVecs,
      "compaction changed the float vectors table")
    assert(LshIndex.searchBucketedQ8(post, probes,
      "vec_id", "embedding", "probe_id", "pv", k = 5).collect().toSet
      === preSearch, "compaction changed search results")
  }

  test("ivf: compact folds the assignment; frozen-centroid equality holds") {
    val cut = 450L
    val base = embeddings.where(col("vec_id") < cut)
    val inc = embeddings.where(col("vec_id") >= cut)
    val dir = tmp()
    val ivf = IvfIndex.buildTrained(base, "vec_id", "embedding",
      nCentroids = 8, lloydIters = 2)
    IndexStore.writeIvf(ivf, dir)
    IvfIndex.drop(ivf)
    IndexStore.appendIvf(inc, "vec_id", "embedding", dir)
    val pre = IndexStore.loadIvf(spark, dir).assignment.collect().toSet
    IndexStore.compact(spark, dir)
    assertCompacted(dir)
    val post = IndexStore.loadIvf(spark, dir)
    assert(post.assignment.collect().toSet === pre,
      "compaction changed the assignment rows")
    assertSame(post.assignment,
      Similarity.ivfAssign(embeddings, "vec_id", "embedding", post.centroids),
      "compacted assignment must still equal frozen-centroid reassignment")
  }

  test("inverted: compact folds postings + df; scores bit-identical; df one row per term") {
    val cut = docMax - docMax / 5
    val dir = tmp()
    val built = InvertedIndex.build(docs.where(col("doc_id") < cut),
      "doc_id", "text")
    IndexStore.writeInverted(built, dir)
    InvertedIndex.drop(built)
    IndexStore.appendInverted(docs.where(col("doc_id") >= cut),
      "doc_id", "text", dir)
    val q = Seq("spark", "window", "hash")
    val pre = IndexStore.loadInverted(spark, dir)
    val preScores = InvertedIndex.bm25(pre, q, topK = 20).collect().toSeq
    val (preN, preSum) = (pre.nDocs, pre.sumDl)
    IndexStore.compact(spark, dir)
    assertCompacted(dir)
    val post = IndexStore.loadInverted(spark, dir)
    assert(post.nDocs === preN && post.sumDl === preSum,
      "compaction must not touch the corpus scalars")
    assert(InvertedIndex.bm25(post, q, topK = 20).collect().toSeq === preScores,
      "compaction changed BM25 scores")
    // the per-increment df rows folded: stored table holds one row/term
    val dfDir = {
      val m = new com.fasterxml.jackson.databind.ObjectMapper()
        .readTree(Files.readAllBytes(Paths.get(dir, "meta.json")))
      Option(m.get("docfreqDir")).map(_.asText()).getOrElse("docfreq")
    }
    val stored = spark.read.parquet(s"$dir/$dfDir")
    assert(stored.groupBy("term").count().where(col("count") > 1).isEmpty,
      "compacted docfreq must hold exactly one row per term")
  }

  test("positional: compact folds the phrase postings; rows exact") {
    val cut = docMax - docMax / 5
    val dir = tmp()
    IndexStore.writePositional(
      InvertedIndex.buildPositional(docs.where(col("doc_id") < cut),
        "doc_id", "text"), dir)
    IndexStore.appendPositional(docs.where(col("doc_id") >= cut),
      "doc_id", "text", dir)
    val pre = IndexStore.loadPositional(spark, dir).collect().toSet
    IndexStore.compact(spark, dir)
    assertCompacted(dir)
    assert(IndexStore.loadPositional(spark, dir).collect().toSet === pre,
      "compaction changed the positional row set")
    assertSame(IndexStore.loadPositional(spark, dir),
      InvertedIndex.buildPositional(docs, "doc_id", "text"),
      "compacted positional bundle must equal the rebuild row set")
  }

  test("pq: compact folds the code table; codes exact") {
    val cut = 450L
    val base = embeddings.where(col("vec_id") < cut)
    val inc = embeddings.where(col("vec_id") >= cut)
    val dir = tmp()
    val pq = Pq.build(base, "vec_id", "embedding", m = 8, ksub = 16,
      iters = 1, dim = 64)
    IndexStore.writePq(pq, dir)
    Pq.drop(pq)
    IndexStore.appendPq(inc, "vec_id", "embedding", dir)
    val pre = IndexStore.loadPq(spark, dir).codes.collect().toSet
    IndexStore.compact(spark, dir)
    assertCompacted(dir)
    assert(IndexStore.loadPq(spark, dir).codes.collect().toSet === pre,
      "compaction changed the code rows")
  }

  test("no increments → no-op; uncommitted compaction stage is invisible (kill-before-commit)") {
    val cut = 450L
    val dir = tmp()
    val built = LshIndex.build(embeddings.where(col("vec_id") < cut),
      "vec_id", "embedding", tables = 4, dim = 64)
    IndexStore.writeLsh(built, dir)
    LshIndex.drop(built)
    val metaBefore = Files.readAllBytes(Paths.get(dir, "meta.json")).toSeq
    IndexStore.compact(spark, dir) // no incs: must not touch anything
    assert(Files.readAllBytes(Paths.get(dir, "meta.json")).toSeq === metaBefore,
      "a no-op compaction must not rewrite meta")
    // crash-before-commit: a fully-written but never-CAS'd stage is
    // unreferenced — loads ignore it, and a later real compaction works
    IndexStore.appendLsh(embeddings.where(col("vec_id") >= cut),
      "vec_id", "embedding", dir)
    val pre = IndexStore.loadLsh(spark, dir).buckets.collect().toSet
    Files.createDirectories(Paths.get(dir, "compact_deadbeef", "buckets"))
    assert(IndexStore.loadLsh(spark, dir).buckets.collect().toSet === pre,
      "an uncommitted compaction stage leaked into the load")
    IndexStore.compact(spark, dir)
    assertCompacted(dir)
    assert(IndexStore.loadLsh(spark, dir).buckets.collect().toSet === pre,
      "compaction after a dead stage changed rows")
  }
}
