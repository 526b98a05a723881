package graft.streaming

import java.nio.file.Files
import java.sql.Timestamp

import org.apache.spark.sql.functions._

import graft.{SparkSpec, Tables}
import graft.engine.Layout
import graft.ext.{Curate, Decontaminate, LangId, MinHashIndex, Splits}

/** The COMPOSED nightly training-data pipeline (VERDICT r12 Next-round
  * #5): streaming curation with the TRAINED langid tier landing in a
  * durable MOR table (ST17′), then leakage-safe splitting (P8) and
  * temperature mixing (P7) over the curated table — the end-to-end
  * artifact the per-operator gates exist for. The contract pinned here:
  * the composed run's FINAL outputs (split assignment and mixed
  * selection) equal the stage-by-stage batch twin's exactly —
  * curation stream ≡ batch (the ST17 contract), and the downstream
  * stages are pure deterministic functions of the curated row set
  * (portable md5 draws), so the whole composition is reproducible
  * from either entry path. `tools/PipelineBench` prices the same
  * composition at the scaled dirs (BASELINE §Round 13). */
class CurationPipelineSpec extends SparkSpec {
  import spark.implicits._

  test("streamed curate→MOR→split→mix equals the stage-by-stage batch twin") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext

    val all = Tables.documents(spark, sf0001)
      .select(col("doc_id"), col("text"), col("lang"))
    val corpus = all.where(col("doc_id") < 300).select("doc_id", "text")
    // incoming docs: the real tail of the corpus — carries genuine
    // cross near-dups of the indexed slice (MinHashIndexSpec pins that
    // they exist), so the near-dup gate does real work here
    val incomingRows = all.where(col("doc_id") >= 300)
      .select("doc_id", "text").collect()
      .map(r => (r.getLong(0), r.getString(1)))
    val base = Timestamp.valueOf("2026-01-01 00:00:00").getTime
    val incoming = incomingRows.zipWithIndex.map { case ((id, txt), i) =>
      (id, new Timestamp(base + i * 500L), txt) // all inside a few minutes
    }.toSeq
    val flusher = (9000000L, new Timestamp(base + 3600L * 1000L),
      "the night sky is full of quiet stars and the moon drifts slowly over sleeping hills")

    val index = MinHashIndex.build(corpus, "doc_id", "text",
      shingleK = 5, numHashes = 128, numBands = 32)
    val bf = Decontaminate.buildShingleBloom(
      corpus.where(col("doc_id") < 50), "doc_id", "text")
    val model = LangId.train(
      all.where(col("doc_id") < 300), "doc_id", "text", "lang",
      buckets = 128, iters = 3, lr = 2.0)
    val langs = model.labels.toSet
    val table = s"pipe_mor_${java.util.UUID.randomUUID().toString.take(8)}"
    Seq.empty[(Long, Timestamp, String, Long, String)]
      .toDF("doc_id", "win_start", "lang", "n_tokens", "text")
      .write.saveAsTable(table)
    try {
      // ---- composed run: stream → durable MOR → split → mix --------
      val ckpt = Files.createTempDirectory("pipe-ckpt").toString
      val mem = MemoryStream[(Long, Timestamp, String)]
      val q = StreamCurate.pipelineInto(index, bf,
        mem.toDF().toDF("doc_id", "ts", "text"), "doc_id", "text", "ts",
        langs = langs, threshold = 0.8, watermark = "1 minute",
        windowDur = "5 minutes", table = table, checkpointDir = ckpt,
        shingleK = 5, minWords = 5, maxWords = 1000000,
        langModel = Some(model))
      try {
        val (a, b) = incoming.splitAt(incoming.size / 2)
        mem.addData(a)
        q.processAllAvailable()
        mem.addData(b :+ flusher)
        q.processAllAvailable()
      } finally q.stop()
      val curated = Layout.readCurrent(spark, table)
        .select(col("doc_id"), col("lang"), col("n_tokens"), col("text"))
      assert(curated.count() > 0, "fixture must curate a non-empty set")
      val split = Curate.leakageSafeSplit(curated, "doc_id", "text",
        threshold = 0.8, weights = Seq("train" -> 9, "test" -> 1))
      val trainDocs = curated.join(
        split.where(col("split") === "train").select("doc_id"), Seq("doc_id"))
      val mixed = Splits.temperatureMix(trainDocs, "lang", "doc_id",
        total = trainDocs.count() / 2, tau = 0.7)

      // ---- batch twin: identical stages over the static frame ------
      val curatedTwin = StreamCurate.batch(index, bf,
        incoming.toDF("doc_id", "ts", "text"), "doc_id", "text",
        langs = langs, threshold = 0.8,
        shingleK = 5, minWords = 5, maxWords = 1000000,
        langModel = Some(model))
        .select(col("doc_id"), col("lang"), col("n_tokens"), col("text"))
      assert(curated.exceptAll(curatedTwin).isEmpty &&
        curatedTwin.exceptAll(curated).isEmpty,
        "streamed curation must equal the batch twin doc-for-doc")
      val splitTwin = Curate.leakageSafeSplit(curatedTwin, "doc_id", "text",
        threshold = 0.8, weights = Seq("train" -> 9, "test" -> 1))
      assert(split.exceptAll(splitTwin).isEmpty &&
        splitTwin.exceptAll(split).isEmpty,
        "split assignments must match the twin exactly")
      val trainTwin = curatedTwin.join(
        splitTwin.where(col("split") === "train").select("doc_id"), Seq("doc_id"))
      val mixedTwin = Splits.temperatureMix(trainTwin, "lang", "doc_id",
        total = trainTwin.count() / 2, tau = 0.7)
      assert(mixed.exceptAll(mixedTwin).isEmpty &&
        mixedTwin.exceptAll(mixed).isEmpty,
        "temperature-mixed selection must match the twin exactly")
      // the composition did real selection work at every stage
      assert(split.select("split").distinct().count() === 2,
        "both split labels must be populated")
      assert(mixed.count() > 0 && mixed.count() < trainDocs.count(),
        "mix must select a strict, non-empty subset")
    } finally {
      MinHashIndex.drop(index)
      spark.sql(s"DROP TABLE IF EXISTS $table")
    }
  }
}
