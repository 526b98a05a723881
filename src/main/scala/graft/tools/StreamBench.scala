package graft.tools

import java.sql.Timestamp

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.StreamingQuery

import graft.Tables
import graft.ext.{Decontaminate, LshIndex, MinHashIndex}
import graft.streaming.{StreamAnn, StreamCurate, StreamDecontaminate, StreamNearDup}

/** Streaming-serving throughput bench (ST14/ST15/ST16) — the BASELINE
  * measurement harness, not a gate: replay the sf corpus through a
  * micro-batched in-memory source against the PREBUILT static side
  * (stored MinHash bands / shingle bloom / LSH buckets+vectors), drive
  * each micro-batch to completion, report sustained rows/s and the
  * stream-state row count (the state-size bound each operator's scaladoc
  * declares: per-CANDIDATE-pair dedup keys for ST14/ST16 — both dedup
  * before their expensive stage — ZERO for ST15's map-only bloom probe).
  *
  * Protocol: B micro-batches of the full corpus each, ids uniquified per
  * (batch, row) and event time advancing one minute per batch inside a
  * 10-minute watermark (state grows to its in-window bound — the honest
  * shape). Steady rows/s excludes batch 1 (stream init + codegen).
  * Usage: `StreamBench [sfDir] [batches] [st14,st15,st16]` — the third
  * arg selects operators for scaled runs (st16's candidate population
  * grows with corpus × probes; pick batches accordingly).
  */
object StreamBench {

  private def drive(tag: String, spark: org.apache.spark.sql.SparkSession,
      feed: (Int, Timestamp) => Unit, out: DataFrame, batches: Int,
      rowsPerBatch: Long, mode: String = "append"): Unit = {
    val q: StreamingQuery = out.writeStream.format("noop")
      .outputMode(mode).start()
    try {
      var steadyNanos = 0L
      val t0 = System.nanoTime()
      for (b <- 0 until batches) {
        val tb = System.nanoTime()
        feed(b, new Timestamp(1767225600000L + b * 60000L))
        q.processAllAvailable()
        if (b > 0) steadyNanos += System.nanoTime() - tb
      }
      val wall = (System.nanoTime() - t0) / 1e9
      val steady = steadyNanos / 1e9
      val stateRows = Option(q.lastProgress)
        .map(_.stateOperators.map(_.numRowsTotal).sum).getOrElse(-1L)
      val total = batches * rowsPerBatch
      println(f"[streambench] $tag rows=$total wall=$wall%.1fs " +
        f"rows_s=${total / wall}%.0f " +
        f"steady_rows_s=${(total - rowsPerBatch) / math.max(steady, 1e-9)}%.0f " +
        s"state_rows=$stateRows")
    } finally q.stop()
  }

  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val batches = args.lift(1).map(_.toInt).getOrElse(10)
    val which = args.lift(2).map(_.split(",").toSet)
      .getOrElse(Set("st14", "st15", "st16", "st17", "st17t"))
    val spark = graft.GraftSession.local("graft-streambench")
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

    val docs = Tables.load(spark, sfDir, "documents")
      .select(col("doc_id"), col("text")).cache()
    val docRows = docs.collect().map(r => (r.getLong(0), r.getString(1)))
    // stream ids start past the corpus id space: a synthetic id equal to
    // a real corpus id would trip the self-pair guard and silently drop
    // genuine candidate pairs from the measurement
    val docBase = docRows.map(_._1).max + 1L
    val emb = Tables.load(spark, sfDir, "embeddings")
      .select(col("vec_id"), col("embedding")).cache()
    val embRows = emb.collect().map(r => (r.getLong(0), r.getSeq[Float](1)))
    val embBase = embRows.map(_._1).max + 1L

    // ---- ST14: near-dup vs stored MinHash bands ----------------------
    if (which("st14")) {
      val index = MinHashIndex.build(docs, "doc_id", "text",
        shingleK = 5, numHashes = 128, numBands = 32)
      try {
        val mem = MemoryStream[(Long, Timestamp, String)]
        val outDf = StreamNearDup.dedupedPairs(index,
          mem.toDF().toDF("doc_id", "ts", "text"),
          "doc_id", "text", "ts", threshold = 0.8, watermark = "10 minutes")
        drive("st14_neardup", spark, (b, ts) =>
          mem.addData(docRows.toSeq.zipWithIndex.map { case ((_, txt), i) =>
            (docBase + b.toLong * docRows.length + i, ts, txt)
          }): Unit,
          outDf, batches, docRows.length.toLong)
      } finally MinHashIndex.drop(index)
    }

    // ---- ST15: bloom decontamination (zero state) --------------------
    if (which("st15")) {
      val test = docs.where(col("doc_id") < 100)
      val bf = Decontaminate.buildShingleBloom(test, "doc_id", "text")
      val mem = MemoryStream[(Long, Timestamp, String)]
      val outDf = StreamDecontaminate.flags(bf,
        mem.toDF().toDF("doc_id", "ts", "text"), "doc_id", "text", "ts")
      drive("st15_decontaminate", spark, (b, ts) =>
        mem.addData(docRows.toSeq.zipWithIndex.map { case ((_, txt), i) =>
          (docBase + b.toLong * docRows.length + i, ts, txt)
        }): Unit,
        outDf, batches, docRows.length.toLong)
    }

    // ---- ST16: ANN radius search vs stored LSH -----------------------
    if (which("st16")) {
      val index = LshIndex.build(emb, "vec_id", "embedding",
        tables = 8, dim = 64)
      try {
        val mem = MemoryStream[(Long, Timestamp, Seq[Float])]
        val outDf = StreamAnn.radius(index, emb,
          mem.toDF().toDF("probe_id", "ts", "pv"),
          "probe_id", "pv", "ts", "vec_id", "embedding",
          minSim = 0.4, watermark = "10 minutes")
        drive("st16_ann_radius", spark, (b, ts) =>
          mem.addData(embRows.toSeq.zipWithIndex.map { case ((_, v), i) =>
            (embBase + b.toLong * embRows.length + i, ts, v)
          }): Unit,
          outDf, batches, embRows.length.toLong)
      } finally LshIndex.drop(index)
    }

    // ---- ST17: composed curation pipeline ----------------------------
    // langs covers the synthetic corpus's whole label space (incl. 'und':
    // the shared-vocabulary texts rarely vote a marker majority) and the
    // Gopher band is wide open — throughput here prices the PLUMBING
    // (staged gates + band join + windowed verdict), not the drop rate.
    if (which("st17")) {
      val index = MinHashIndex.build(docs, "doc_id", "text",
        shingleK = 5, numHashes = 128, numBands = 32)
      try {
        val test = docs.where(col("doc_id") < 100)
        val bf = Decontaminate.buildShingleBloom(test, "doc_id", "text")
        val mem = MemoryStream[(Long, Timestamp, String)]
        val outDf = StreamCurate.pipeline(index, bf,
          mem.toDF().toDF("doc_id", "ts", "text"), "doc_id", "text", "ts",
          langs = Set("en", "de", "es", "fr", "zh", "und"), threshold = 0.8,
          watermark = "10 minutes", windowDur = "5 minutes",
          shingleK = 5, minWords = 5, maxWords = 1000000)
        drive("st17_curate", spark, (b, ts) =>
          mem.addData(docRows.toSeq.zipWithIndex.map { case ((_, txt), i) =>
            (docBase + b.toLong * docRows.length + i, ts, txt)
          }): Unit,
          outDf, batches, docRows.length.toLong)
      } finally MinHashIndex.drop(index)
    }

    // ---- ST17 with the TRAINED langid tier (T1″) ---------------------
    // Same pipeline as st17 but the language gate runs LangId.scoreExpr
    // against a model trained in-engine on the labeled slice — the
    // map-only serving path, so throughput prices the trained tier's
    // in-row expression (a ~2.5k-double weight literal dotted per row)
    // on top of the same plumbing. langs covers the model's label space
    // (trained argmax always lands on a trained label, never 'und').
    if (which("st17t")) {
      val model = graft.ext.LangId.train(
        docs.where(col("doc_id") < 500)
          .join(Tables.load(spark, sfDir, "documents")
            .select(col("doc_id"), col("lang")), Seq("doc_id")),
        "doc_id", "text", "lang", buckets = 512, iters = 10, lr = 4.0)
      val index = MinHashIndex.build(docs, "doc_id", "text",
        shingleK = 5, numHashes = 128, numBands = 32)
      try {
        val test = docs.where(col("doc_id") < 100)
        val bf = Decontaminate.buildShingleBloom(test, "doc_id", "text")
        val mem = MemoryStream[(Long, Timestamp, String)]
        val outDf = StreamCurate.pipeline(index, bf,
          mem.toDF().toDF("doc_id", "ts", "text"), "doc_id", "text", "ts",
          langs = model.labels.toSet, threshold = 0.8,
          watermark = "10 minutes", windowDur = "5 minutes",
          shingleK = 5, minWords = 5, maxWords = 1000000,
          langModel = Some(model))
        drive("st17t_curate_trained", spark, (b, ts) =>
          mem.addData(docRows.toSeq.zipWithIndex.map { case ((_, txt), i) =>
            (docBase + b.toLong * docRows.length + i, ts, txt)
          }): Unit,
          outDf, batches, docRows.length.toLong)
      } finally MinHashIndex.drop(index)
    }

    // ---- ST18: decayed trending terms (transformWithState) -----------
    // Ingest = per-TERM aggregates of the whole corpus per batch (the
    // shape a real feed has after its per-batch map-side count), tick =
    // batch index, so every batch updates the ENTIRE live-term keyspace
    // — the worst case for the state store; update-mode emission.
    // Terms are word 3-GRAMS (the operator's stated use is spiking
    // n-grams; the synthetic corpus's unigram vocab is ~31 words — no
    // keyspace at all — while its 3-gram space is the real thing).
    if (which("st18")) {
      import graft.streaming.TrendingTerms
      spark.conf.set("spark.sql.streaming.stateStore.providerClass",
        "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
      // stage toks and drop <3-token docs FIRST: sequence(0, n-3) on a
      // 2-token doc is the descending [0,-1], whose -1 index makes
      // slice throw ("SQL array indices start at 1") and kills the leg
      val termRows = docs
        .select(split(lower(col("text")), "\\s+").as("toks"))
        .where(size(col("toks")) >= 3)
        .select(explode(transform(sequence(lit(0), size(col("toks")) - 3),
          i => concat_ws(" ", slice(col("toks"), i + 1, lit(3))))).as("term"))
        .where(length(col("term")) > 0)
        .groupBy("term").agg(count(lit(1)).as("n"))
        .collect().map(r => (r.getString(0), r.getLong(1)))
      println(s"[streambench] st18 live-term keyspace: ${termRows.length}")
      val mem = MemoryStream[TrendingTerms.TermEvent]
      val outDf = TrendingTerms.scores(mem.toDS(), decay = 0.9).toDF()
      drive("st18_trending", spark, (b, _) =>
        mem.addData(termRows.toSeq.map { case (t, n) =>
          TrendingTerms.TermEvent(t, b.toLong, n) }): Unit,
        outDf, batches, termRows.length.toLong, mode = "update")
    }

    // ---- ST19: streaming image near-dup vs a stored pHash bundle ----
    // Ingest = per-batch waves of REAL 32×32 PNGs (patterned fixture,
    // ids overlapping the indexed corpus so pairs genuinely fire);
    // stateless pipeline (map-only hash + stream-static band join), so
    // the measured rate is decode+DCT+join throughput, not state cost.
    if (which("st19")) {
      import graft.ext.{ImageHash, IndexStore}
      val corpusN = 4000L
      val waveN = 500
      val dir = java.nio.file.Files.createTempDirectory("sb_phash").toString
      IndexStore.writePhash(spark,
        ImageHash.synthesizePatterned(spark,
          spark.range(corpusN).select(col("id").as("doc_id")), "doc_id"),
        dir, maxDist = 7, bands = 8)
      val bundle = IndexStore.loadPhash(spark, dir)
      val waves: IndexedSeq[Seq[(Long, Array[Byte])]] =
        (0 until batches).map { b =>
          ImageHash.synthesizePatterned(spark,
            spark.range(b.toLong * waveN, (b + 1).toLong * waveN)
              .select(col("id").as("doc_id")), "doc_id")
            .collect().map(r => (r.getLong(0) + corpusN * 10, // disjoint probe ids
              r.getAs[Array[Byte]](1))).toSeq
        }
      // probe CONTENT is fixture id k's pattern (k < corpusN for the
      // early waves ⇒ every probe near-matches its group's 4 corpus
      // images); only the media_id is shifted out of the corpus space
      val mem = MemoryStream[(Long, Timestamp, Array[Byte])]
      val outDf = graft.streaming.StreamImageDup.pairs(bundle,
        mem.toDF().toDF("media_id", "ts", "media"), "media_id", "media", "ts")
      drive("st19_image_neardup", spark, (b, ts) =>
        mem.addData(waves(b).map { case (id, bytes) => (id, ts, bytes) }): Unit,
        outDf, batches, waveN.toLong)
    }

    // ---- ST21: streaming video near-dup vs a stored videofp bundle ----
    // The st19 shape on the video plane: per-batch waves of REAL MJPEG
    // AVIs (fixture ids overlapping the indexed corpus so congruence
    // pairs genuinely fire), map-only decode+quantize, ONE stream-static
    // (frame_index, qluma) join whose shared-count aggregate is the only
    // stateful stage (update mode — the ST20 protocol).
    if (which("st21")) {
      import graft.ext.{IndexStore, Multimodal}
      val corpusN = 4000L
      val waveN = 500
      val dir = java.nio.file.Files.createTempDirectory("sb_videofp").toString
      IndexStore.writeVideoFp(spark,
        Multimodal.synthesizeAvi(spark,
          spark.range(corpusN).select(col("id").as("doc_id")), "doc_id"),
        dir, minShared = 2)
      val bundle = IndexStore.loadVideoFp(spark, dir)
      val waves: IndexedSeq[Seq[(Long, Array[Byte])]] =
        (0 until batches).map { b =>
          Multimodal.synthesizeAvi(spark,
            spark.range(b.toLong * waveN, (b + 1).toLong * waveN)
              .select(col("id").as("doc_id")), "doc_id")
            .collect().map(r => (r.getLong(0) + corpusN * 10, // disjoint probe ids
              r.getAs[Array[Byte]](1))).toSeq
        }
      val mem = MemoryStream[(Long, Timestamp, Array[Byte])]
      val outDf = graft.streaming.StreamVideoDup.pairs(bundle,
        mem.toDF().toDF("media_id", "ts", "media"), "media_id", "media", "ts")
      drive("st21_video_neardup", spark, (b, ts) =>
        mem.addData(waves(b).map { case (id, bytes) => (id, ts, bytes) }): Unit,
        outDf, batches, waveN.toLong, mode = "update")
    }

    spark.stop()
  }
}
