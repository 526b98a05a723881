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
    require(args.length == 3, "usage: ScaleUp <srcDir> <dstDir> <factor>")
    val Array(src, dst, factorS) = args
    val factor = factorS.toInt
    require(factor >= 1, "factor must be >= 1")
    val spark = graft.GraftSession.local("graft-scaleup")
    spark.sparkContext.setLogLevel("WARN")
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")

    def read(t: String): DataFrame = spark.read.parquet(s"$src/$t.parquet")
    def write(df: DataFrame, t: String): Unit =
      df.write.mode(SaveMode.Overwrite).parquet(s"$dst/$t.parquet")

    // dimensions: fixed (facts-per-dim-row grows, the realistic scale-up)
    Seq("region", "nation", "customer", "supplier", "part")
      .foreach(t => write(read(t), t))

    val copies = spark.range(factor).select(col("id").as("__copy"))
    def replicate(df: DataFrame): DataFrame = df.crossJoin(broadcast(copies))
    def span(df: DataFrame, key: String): Long =
      df.agg(max(col(key))).head().getLong(0) + 1L

    // orders + lineitem share the order-key offset so joins stay intact
    val orders = read("orders")
    val orderSpan = span(orders, "o_orderkey")
    write(replicate(orders)
      .withColumn("o_orderkey", col("o_orderkey") + col("__copy") * orderSpan)
      .drop("__copy"), "orders")
    write(replicate(read("lineitem"))
      .withColumn("l_orderkey", col("l_orderkey") + col("__copy") * orderSpan)
      .drop("__copy"), "lineitem")

    val events = read("events")
    write(replicate(events)
      .withColumn("event_id", col("event_id") + col("__copy") * span(events, "event_id"))
      .drop("__copy"), "events")

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

    val emb = read("embeddings")
    write(replicate(emb)
      .withColumn("vec_id", col("vec_id") + col("__copy") * span(emb, "vec_id"))
      .withColumn("embedding",
        expr("transform(embedding, (x, i) -> CAST(x * (CASE WHEN pmod(hash(__copy, i), 2) = 0 " +
          "THEN 1.0 ELSE -1.0 END) AS float))"))
      .drop("__copy"), "embeddings")

    println(s"[scaleup] wrote $dst at ${factor}x of $src")
    spark.stop()
  }
}
