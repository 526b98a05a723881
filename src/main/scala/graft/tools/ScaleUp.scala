package graft.tools

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._

/** Generate an sf-scaled copy of a testdata dir by principled fact
  * replication — the scaling-checkpoint harness (BASELINE.md §sf1,
  * §sf10). The factor is arbitrary: the round-7 100× checkpoint runs
  * this tool directly at factor 100 (one pass, same per-copy key
  * offsets / word perturbation / sign flips — composing 10×-of-10×
  * would produce the identical structure with an extra generation).
  *
  * Shape: dimension tables stay fixed; fact tables are replicated
  * `factor`× with per-copy key offsets (each copy is a disjoint key
  * range, so join fan-outs scale linearly, exactly "more days of the same
  * workload"). Two tables need care so the WORKLOAD's structure scales
  * honestly rather than degenerately:
  *
  *   - `documents`: verbatim replication would make every copy an exact
  *     dup of every other (dedup outputs explode combinatorially). Each
  *     copy k>0 instead suffixes every word with `_k`: Jaccard/MinHash/
  *     SimHash relationships WITHIN a copy are preserved exactly (same
  *     shingle structure), while cross-copy similarity drops to zero —
  *     so dup clusters scale linearly, like genuinely new text would.
  *     `n_chars` is recomputed from the perturbed text.
  *   - `embeddings`: each copy applies a per-(copy, dimension) sign flip.
  *     cos(s∘u, s∘v) = cos(u, v), so within-copy similarity structure is
  *     EXACT; across copies the signs decorrelate and cosine ≈ 0 — near-
  *     dup and ANN candidate counts scale linearly.
  *
  * `events.ts` is read as raw nanos (nanosAsLong) and written back as the
  * same BIGINT so the generated dir round-trips through `Tables.load`'s
  * nanos handling identically to the driver's files.
  */
object ScaleUp {

  def main(args: Array[String]): Unit = {
    require(args.length >= 3,
      "usage: ScaleUp <srcDir> <dstDir> <factor> [--graph] [--only t1,t2]")
    val src = args(0); val dst = args(1); val factor = args(2).toInt
    // --only: emit just the named tables (e.g. `--only embeddings` for
    // the gsf100 two-decade serving probe — 2M vectors is ~0.5 GB where
    // the full gsf100 fact side would be ~12 GB and an hour of writes;
    // the replication math per table is IDENTICAL to a full run, so a
    // partial dir's tables are byte-compatible with a full one's)
    val only: Option[Set[String]] = {
      val i = args.indexOf("--only")
      if (i < 0) None
      else {
        require(i + 1 < args.length,
          "--only needs a table list: " +
            "usage: ScaleUp <srcDir> <dstDir> <factor> [--graph] [--only t1,t2]")
        Some(args(i + 1).split(",").map(_.trim).filter(_.nonEmpty).toSet)
      }
    }
    def wanted(t: String): Boolean = only.forall(_.contains(t))
    // --graph: ALSO replicate customer/part/supplier with per-copy key
    // offsets (fact FKs remapped to match). The derived purchase graph
    // becomes `factor` DISJOINT copies of the base graph — nodes ∝ SF,
    // edges ∝ SF, degree distribution preserved exactly — so the graph
    // tier's exponents measure N·E growth of the iteration core, not
    // just the fact-side derivation (BASELINE notes the default mode's
    // node set is dimension-bound). Disjoint copies are the honest
    // shape: genuinely new users/products arrive as new communities, and
    // nothing in the plans exploits the disjointness (every exchange,
    // rank table, and wedge join carries the full scaled graph).
    val graphMode = args.contains("--graph")
    require(factor >= 1, "factor must be >= 1")
    val spark = graft.GraftSession.local("graft-scaleup")
    spark.sparkContext.setLogLevel("WARN")
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")

    def read(t: String): DataFrame = spark.read.parquet(s"$src/$t.parquet")
    def write(df: DataFrame, t: String): Unit =
      df.write.mode(SaveMode.Overwrite).parquet(s"$dst/$t.parquet")

    val copies = spark.range(factor).select(col("id").as("__copy"))
    // A replicated frame keeps the BASE file's partitioning (the copies
    // side is broadcast), so a high factor over a small source would
    // write one giant file/row-group — every downstream scan of the
    // generated dir then runs as ONE task (caught live: the gsf100
    // embeddings probe pinned a single core for 20+ minutes). Spread
    // replicated outputs across tasks, capped so small factors don't
    // shatter into confetti files.
    def replicate(df: DataFrame): DataFrame = df.crossJoin(broadcast(copies))
      .repartition(math.min(256, math.max(spark.sparkContext.defaultParallelism, factor)))
    def span(df: DataFrame, key: String): Long =
      df.agg(max(col(key))).head().getLong(0) + 1L

    // region/nation: always fixed (c_nationkey/s_nationkey stay valid —
    // replicated entities reuse the base geography)
    Seq("region", "nation").filter(wanted).foreach(t => write(read(t), t))

    val (custSpan, partSpan, suppSpan) =
      if (!graphMode) {
        // default: dimensions fixed (facts-per-dim-row grows — "more
        // days of the same workload")
        Seq("customer", "supplier", "part").filter(wanted)
          .foreach(t => write(read(t), t))
        (0L, 0L, 0L)
      } else {
        val (cust, part, supp) = (read("customer"), read("part"), read("supplier"))
        val (cs, ps, ss) =
          (span(cust, "c_custkey"), span(part, "p_partkey"), span(supp, "s_suppkey"))
        // Names follow their keys (TPC-H dbgen derives them from the key;
        // part names get a per-copy word suffix, the `documents` move):
        // verbatim name replication would make every copy an exact dup of
        // every other — string-similarity outputs would grow ∝ factor²,
        // the degenerate-replication failure this tool exists to avoid.
        // Spans come from the READS above, so --only still honors its
        // contract here: an unwanted dimension is never written, but the
        // wanted facts still get the correct per-copy key offsets.
        if (wanted("customer")) write(replicate(cust)
          .withColumn("c_custkey", col("c_custkey") + col("__copy") * cs)
          .withColumn("c_name",
            format_string("Customer#%09d", col("c_custkey")))
          .drop("__copy"), "customer")
        if (wanted("part")) write(replicate(part)
          .withColumn("p_partkey", col("p_partkey") + col("__copy") * ps)
          .withColumn("p_name",
            when(col("__copy") === 0, col("p_name"))
              .otherwise(concat(col("p_name"), lit(" c"), col("__copy"))))
          .drop("__copy"), "part")
        if (wanted("supplier")) write(replicate(supp)
          .withColumn("s_suppkey", col("s_suppkey") + col("__copy") * ss)
          .withColumn("s_name",
            format_string("Supplier#%09d", col("s_suppkey")))
          .drop("__copy"), "supplier")
        (cs, ps, ss)
      }

    // orders + lineitem share the order-key offset so joins stay intact;
    // in graph mode the dim FKs shift by the same per-copy offsets, so
    // each copy's facts reference that copy's entities — joins intact,
    // graph disjoint by construction.
    if (wanted("orders") || wanted("lineitem")) {
      val orders = read("orders")
      val orderSpan = span(orders, "o_orderkey")
      if (wanted("orders")) write(replicate(orders)
        .withColumn("o_orderkey", col("o_orderkey") + col("__copy") * orderSpan)
        .withColumn("o_custkey", col("o_custkey") + col("__copy") * custSpan)
        .drop("__copy"), "orders")
      if (wanted("lineitem")) write(replicate(read("lineitem"))
        .withColumn("l_orderkey", col("l_orderkey") + col("__copy") * orderSpan)
        .withColumn("l_partkey", col("l_partkey") + col("__copy") * partSpan)
        .withColumn("l_suppkey", col("l_suppkey") + col("__copy") * suppSpan)
        .drop("__copy"), "lineitem")
    }

    if (wanted("events")) {
      val events = read("events")
      write(replicate(events)
        .withColumn("event_id", col("event_id") + col("__copy") * span(events, "event_id"))
        .drop("__copy"), "events")
    }

    if (wanted("documents")) {
    val docs = read("documents")
    write(replicate(docs)
      .withColumn("doc_id", col("doc_id") + col("__copy") * span(docs, "doc_id"))
      .withColumn("text",
        when(col("__copy") === 0, col("text"))
          .otherwise(array_join(
            expr("transform(split(text, ' '), w -> concat(w, '_', cast(__copy AS string)))"),
            " ")))
      .withColumn("n_chars", length(col("text")).cast("long"))
      .drop("__copy"), "documents")
    }

    if (wanted("embeddings")) {
    val emb = read("embeddings")
    write(replicate(emb)
      .withColumn("vec_id", col("vec_id") + col("__copy") * span(emb, "vec_id"))
      .withColumn("embedding",
        expr("transform(embedding, (x, i) -> CAST(x * (CASE WHEN pmod(hash(__copy, i), 2) = 0 " +
          "THEN 1.0 ELSE -1.0 END) AS float))"))
      .drop("__copy"), "embeddings")
    }

    println(s"[scaleup] wrote $dst at ${factor}x of $src")
    spark.stop()
  }
}
