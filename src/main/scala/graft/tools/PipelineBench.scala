package graft.tools

import java.sql.Timestamp

import org.apache.spark.sql.functions._

import graft.Tables
import graft.engine.Layout
import graft.ext.{Curate, Decontaminate, LangId, MinHashIndex, Splits}
import graft.streaming.StreamCurate

/** End-to-end price of the COMPOSED nightly training-data pipeline
  * (VERDICT r12 Next-round #5) — the artifact the per-operator numbers
  * exist for: streaming curation with the TRAINED langid tier (ST17′:
  * Gopher → trained softmax gate → bloom decontamination → stored-index
  * near-dup verdict → durable MOR sink), then leakage-safe splitting
  * (P8: banded LSH pairs → connected components → portable md5 draw on
  * the cluster representative) and temperature mixing (P7) over the
  * curated table. CurationPipelineSpec pins composed ≡ stage-by-stage
  * batch twin; THIS tool prices it at the scaled dirs (BASELINE §Round
  * 13).
  *
  * Shape: the INDEXED corpus is the first half of the documents table;
  * the second half replays as the night's crawl in `batches`
  * micro-batches (event time advancing inside the watermark, one
  * far-future flusher closing the windows). At the SCALED dirs the
  * crawl half's text is ScaleUp's `word_k`-suffixed perturbation, which
  * no linguistic battery should pass (every stopword reads `the_7`) —
  * the STOPWORD tokens alone are de-suffixed (`the_7` → `the`), which
  * re-arms the Gopher stop rule while leaving content words copy-tagged
  * so ScaleUp's similarity structure survives (5-shingles keep ≥4
  * tagged content words; cross-copy overlap stays ~0 — an earlier
  * draft that inserted the copy tag as its OWN token halved effective
  * shingle entropy and the bloom gate flagged the whole crawl, see the
  * inline note). A ~4% slice of the crawl is
  * ALSO pre-registered in the index under shifted ids — "yesterday's
  * crawl overlaps tonight's" — so the near-dup verdict fetches and
  * verifies real hits, not just band misses; a ~1% slice seeds the
  * decontamination bloom; the langid model trains on the labeled head
  * (the q228/q232 convention). Prep (index build + bloom + training) is
  * priced separately from the serving stages, the warm/timed bench
  * discipline.
  *
  * `PipelineBench [sfDir] [batches]`. */
object PipelineBench {

  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val batches = args.lift(1).map(_.toInt).getOrElse(4)
    val spark = graft.GraftSession.local("graft-pipelinebench")
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

    def secs(t0: Long): Double = (System.nanoTime() - t0) / 1e9

    val all = Tables.load(spark, sfDir, "documents")
      .select(col("doc_id"), col("text"), col("lang")).cache()
    val maxId = all.agg(max(col("doc_id"))).head().getLong(0)
    val cut = maxId / 2
    // De-suffix the STOPWORDS only (no-op at plain dirs): ScaleUp's
    // `word_k` perturbation makes every stopword read `the_7`, which no
    // linguistic battery should pass — restoring just the ~6 stopword
    // tokens re-arms the Gopher stop rule while leaving content words
    // suffixed, so ScaleUp's similarity structure survives untouched
    // (5-shingles keep >=4 copy-tagged content words; an earlier draft
    // that inserted the copy tag as its OWN token halved the effective
    // shingle entropy and made the bloom gate flag the entire crawl)
    val norm = regexp_replace(col("text"),
      "(?<=^| )(" + graft.ext.TextQuality.StopWords.mkString("|") +
        ")_\\d+(?= |$)", "$1")
    val streamHalf = all.where(col("doc_id") >= cut)
      .select(col("doc_id"), norm.as("text")).cache()
    val streamRows = streamHalf.collect()
      .map(r => (r.getLong(0), r.getString(1)))
    val nIn = streamRows.length.toLong
    // the index holds the first half AS-IS plus the overlapping slice
    // of "yesterday's crawl" under shifted ids (real near-dup hits)
    val corpus = all.where(col("doc_id") < cut).select("doc_id", "text")
      .unionByName(streamHalf.where(col("doc_id") % 23 === 0)
        .select((col("doc_id") + maxId + 1000000L).as("doc_id"), col("text")))

    // ---- prep: stored serving state (priced apart, warm discipline) --
    val tPrep = System.nanoTime()
    val index = MinHashIndex.build(corpus, "doc_id", "text",
      shingleK = 5, numHashes = 128, numBands = 32)
    val bf = Decontaminate.buildShingleBloom(
      streamHalf.where(col("doc_id") % 97 === 0), "doc_id", "text")
    val model = LangId.train(all.where(col("doc_id") < 500),
      "doc_id", "text", "lang", buckets = 512, iters = 10, lr = 4.0)
    val prepS = secs(tPrep)

    // ---- stage 1: curation stream → durable MOR ----------------------
    val table = s"pipebench_${java.util.UUID.randomUUID().toString.take(8)}"
    Seq.empty[(Long, Timestamp, String, Long, String)]
      .toDF("doc_id", "win_start", "lang", "n_tokens", "text")
      .write.mode("overwrite").saveAsTable(table)
    val ckpt = java.nio.file.Files.createTempDirectory("pipebench-ckpt").toString
    val base = 1767225600000L // fixed epoch, the StreamBench convention
    val tCurate = System.nanoTime()
    val mem = MemoryStream[(Long, Timestamp, String)]
    val q = StreamCurate.pipelineInto(index, bf,
      mem.toDF().toDF("doc_id", "ts", "text"), "doc_id", "text", "ts",
      langs = model.labels.toSet, threshold = 0.8,
      watermark = "10 minutes", windowDur = "5 minutes",
      table = table, checkpointDir = ckpt,
      shingleK = 5, minWords = 5, maxWords = 1000000,
      langModel = Some(model))
    try {
      val per = math.max(1, streamRows.length / batches)
      streamRows.grouped(per).zipWithIndex.foreach { case (chunk, b) =>
        val ts = new Timestamp(base + b * 60000L)
        mem.addData(chunk.toSeq.map { case (id, txt) => (id, ts, txt) })
        q.processAllAvailable()
      }
      // far-future flusher: closes every data window (its own never closes)
      mem.addData(Seq((maxId + 1L, new Timestamp(base + 3600L * 1000L),
        "the night sky is full of quiet stars and the moon drifts slowly over sleeping hills")))
      q.processAllAvailable()
    } finally q.stop()
    val curateS = secs(tCurate)
    val curated = Layout.readCurrent(spark, table)
      .select(col("doc_id"), col("lang"), col("n_tokens"), col("text"))
      .cache()
    val nCurated = curated.count()

    // ---- stage 2: leakage-safe split (P8) ----------------------------
    val tSplit = System.nanoTime()
    val split = Curate.leakageSafeSplit(curated, "doc_id", "text",
      threshold = 0.8, weights = Seq("train" -> 9, "test" -> 1)).cache()
    val nSplit = split.count()
    val splitS = secs(tSplit)

    // ---- stage 3: temperature mix (P7) over the train partition ------
    val tMix = System.nanoTime()
    val trainDocs = curated.join(
      split.where(col("split") === "train").select("doc_id"), Seq("doc_id"))
      .cache()
    val nTrain = trainDocs.count()
    val mixed = Splits.temperatureMix(trainDocs, "lang", "doc_id",
      total = nTrain / 2, tau = 0.7)
    val nMixed = mixed.count()
    val mixS = secs(tMix)

    val totalS = prepS + curateS + splitS + mixS
    println(f"""{"metric":"pipeline","sf":"$sfDir","batches":$batches,"rows_in":$nIn,"curated":$nCurated,"split_rows":$nSplit,"train":$nTrain,"mixed":$nMixed,"prep_s":$prepS%.1f,"curate_s":$curateS%.1f,"curate_docs_s":${nIn / math.max(curateS, 1e-9)}%.0f,"split_s":$splitS%.1f,"mix_s":$mixS%.1f,"total_s":$totalS%.1f}""")
    spark.sql(s"DROP TABLE IF EXISTS $table")
    MinHashIndex.drop(index)
    spark.stop()
  }
}
