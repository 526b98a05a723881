package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.functions._

import graft.{SparkSpec, Tables}
import graft.ext.{IndexStore, LshIndex, Similarity}
import graft.functions.VectorFunctions

/** ST16 contracts: the streaming radius search equals the batch
  * candidates-with-threshold set over micro-batch delivery, each
  * (probe, id) pair is emitted once despite multi-table bucket
  * collisions, and the stream stays append-legal. */
class StreamAnnSpec extends SparkSpec {

  private def ts(s: String) = Timestamp.valueOf(s)

  private lazy val embeddings = Tables.embeddings(spark, sf0001)

  test("stream radius == batch radius across micro-batches; pairs emitted once") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    val s = spark; import s.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext

    val dir = java.nio.file.Files.createTempDirectory("stream-ann").toString
    val built = LshIndex.build(embeddings, "vec_id", "embedding",
      tables = 8, dim = 64)
    IndexStore.writeLsh(built, dir)
    IndexStore.writeLshVectors(embeddings, "vec_id", "embedding", dir)
    LshIndex.drop(built)
    val index = IndexStore.loadLsh(spark, dir)
    val vectors = IndexStore.loadLshVectors(spark, dir)

    // probes = corpus vectors 0..3 (guaranteed bucket mates: themselves
    // excluded, near neighbors in their own bucket remain)
    val probeRows = embeddings.where(col("vec_id") < 4)
      .select(col("vec_id"), col("embedding"))
      .collect().map(r => (r.getLong(0), r.getSeq[Float](1)))
    val minSim = 0.2

    val mem = MemoryStream[(Long, Timestamp, Seq[Float])]
    val out = StreamAnn.radius(index, vectors,
      mem.toDF().toDF("probe_id", "ts", "pv"),
      "probe_id", "pv", "ts", "vec_id", "embedding", minSim,
      watermark = "10 minutes")
    val q = out.writeStream.format("memory").queryName("sann")
      .outputMode("append").start()
    try {
      mem.addData(probeRows.take(2).map { case (id, v) =>
        (id, ts("2026-03-01 00:00:00"), v) })
      q.processAllAvailable()
      mem.addData(probeRows.drop(2).map { case (id, v) =>
        (id, ts("2026-03-01 00:01:00"), v) })
      q.processAllAvailable()
    } finally q.stop()

    val got = spark.table("sann")
      .select("probe_id", "vec_id", "cos_sim")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))

    // once-only: no duplicate (probe, id) rows despite 8-table collisions
    assert(got.length == got.map(p => (p._1, p._2)).distinct.length,
      "duplicate pair emission")

    // batch twin: bucket-candidate set with the same threshold
    val probes = embeddings.where(col("vec_id") < 4)
      .select(col("vec_id").as("pid"), col("embedding").as("pv"))
    val pb = Similarity.lshBuckets(probes, "pid", "pv",
      index.tables, index.bits, index.dim)
    val batch = index.buckets.join(pb, Seq("table_id", "bucket"))
      .select(col("pid"), col("vec_id")).distinct()
      .where(col("pid") =!= col("vec_id"))
      .join(embeddings, Seq("vec_id"))
      .join(probes.select(col("pid"), col("pv")), Seq("pid"))
      .select(col("pid"), col("vec_id"),
        round(VectorFunctions.cosine(col("embedding"), col("pv")), 6)
          .as("cs"))
      .where(col("cs") >= minSim)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))

    assert(got.toSet == batch.toSet,
      s"stream ${got.length} rows vs batch ${batch.length}")
    assert(got.nonEmpty, "radius search must surface at least one neighbor")
  }
}
