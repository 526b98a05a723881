package graft.streaming

import java.sql.Timestamp

import graft.SparkSpec
import graft.ext.{Decontaminate, MinHashIndex}

/** ST17 contracts: the composed streaming curation pipeline equals its
  * batch twin over multi-batch delivery, each gate drops exactly its own
  * failure mode, candidate-less documents survive the near-dup stage,
  * and unclosed windows hold their documents back (append-mode
  * discipline). */
class StreamCurateSpec extends SparkSpec {

  private def ts(s: String) = Timestamp.valueOf(s)

  // corpus doc 1 is the planted near-dup target; both pass nothing —
  // corpus docs are index content, never gated
  private def corpus = {
    val s = spark; import s.implicits._
    Seq(
      (1L, "the quick brown fox jumps over the lazy dog and runs away"),
      (2L, "completely unrelated corpus filler text about engines here"))
      .toDF("doc_id", "text")
  }

  // held-out test set for the decontamination bloom
  private def testSet = {
    val s = spark; import s.implicits._
    Seq((900L,
      "contamination marker phrase alpha beta gamma delta appears verbatim in this benchmark"))
      .toDF("doc_id", "text")
  }

  // stream docs: 100 near-dup (exact copy of corpus 1) — dropped by the
  // index probe; 101/102 clean English, no band collisions — kept
  // (candidate-less path); 103 shares a 5-shingle with the test set —
  // dropped by the bloom; 104 German by marker vote (but with enough
  // English stopwords to PASS Gopher, so the drop is the language
  // gate's); 105 too short — dropped by Gopher
  private val incoming = Seq(
    (100L, ts("2026-01-01 00:00:00"),
      "the quick brown fox jumps over the lazy dog and runs away"),
    (101L, ts("2026-01-01 00:00:10"),
      "the sun rises over a calm valley and the birds sing softly to greet morning light"),
    (103L, ts("2026-01-01 00:00:20"),
      "the answer is contamination marker phrase alpha beta gamma and more words to pass gates today"),
    (102L, ts("2026-01-01 00:01:00"),
      "a gentle river flows past the old mill and carries leaves of autumn to the sea"),
    (104L, ts("2026-01-01 00:01:10"),
      "der hund und die katze ist the animal of wonder walking today here"),
    (105L, ts("2026-01-01 00:01:20"), "short text here"))

  // late arrival that closes the earlier windows; itself kept by every
  // gate but its OWN window never closes — append mode must hold it back
  private val flusher = (999L, ts("2026-01-01 01:00:00"),
    "the night sky is full of quiet stars and the moon drifts slowly over sleeping hills")

  test("stream curation == batch twin; per-gate drops; unclosed window held") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    val s = spark; import s.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val index = MinHashIndex.build(corpus, "doc_id", "text",
      shingleK = 3, numHashes = 128, numBands = 32)
    val bf = Decontaminate.buildShingleBloom(testSet, "doc_id", "text",
      shingleK = 5)
    try {
      val mem = MemoryStream[(Long, Timestamp, String)]
      val curated = StreamCurate.pipeline(index, bf,
        mem.toDF().toDF("doc_id", "ts", "text"),
        "doc_id", "text", "ts", langs = Set("en"), threshold = 0.8,
        watermark = "1 minute", windowDur = "5 minutes",
        shingleK = 5, minWords = 8, maxWords = 200)
      val q = curated.writeStream.format("memory").queryName("curated")
        .outputMode("append").start()
      try {
        mem.addData(incoming.take(3))
        q.processAllAvailable()
        mem.addData(incoming.drop(3))
        q.processAllAvailable()
        mem.addData(flusher)
        q.processAllAvailable()
      } finally q.stop()

      val got = spark.table("curated")
        .select("doc_id", "lang", "n_tokens", "text")
        .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2),
          r.getString(3))).toSet
      val batch = StreamCurate.batch(index, bf,
          incoming.toDF("doc_id", "ts", "text"), "doc_id", "text",
          langs = Set("en"), threshold = 0.8,
          shingleK = 5, minWords = 8, maxWords = 200)
        .select("doc_id", "lang", "n_tokens", "text")
        .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2),
          r.getString(3))).toSet
      assert(got === batch, "stream must equal the batch twin")
      assert(got.map(_._1) === Set(101L, 102L),
        s"exactly the clean docs survive: ${got.map(_._1)}")
      assert(got.forall(_._2 == "en"))
      // the flusher passes every gate (batch twin keeps it) but its
      // window never closed — append mode held it back
      val batchAll = StreamCurate.batch(index, bf,
        (incoming :+ flusher).toDF("doc_id", "ts", "text"),
        "doc_id", "text", langs = Set("en"), threshold = 0.8,
        shingleK = 5, minWords = 8, maxWords = 200)
        .select("doc_id").as[Long].collect().toSet
      assert(batchAll === Set(101L, 102L, 999L))
    } finally MinHashIndex.drop(index)
  }

  test("trained T1' language tier: stream == batch, gate fires on model verdict") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    val s = spark; import s.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    // disjoint-vocab training corpus (the LangIdSpec separable case):
    // "en" draws from the stream docs' own words so clean docs score en,
    // "xx" from the German doc's markers so 104 scores xx and is dropped
    // by the TRAINED verdict, not the marker heuristic
    val trainDocs = Seq(
      (1L, "en", "the sun rises over a calm valley and the birds sing"),
      (2L, "en", "a gentle river flows past the old mill to the sea"),
      (3L, "en", "the quick brown fox jumps over the lazy dog today"),
      (4L, "xx", "der hund und die katze ist wunderbar"),
      (5L, "xx", "der katze und der hund ist hier"))
      .toDF("id", "lang", "text")
    val model = graft.ext.LangId.train(trainDocs, "id", "text", "lang",
      buckets = 64, iters = 8, lr = 4.0)
    val index = MinHashIndex.build(corpus, "doc_id", "text",
      shingleK = 3, numHashes = 128, numBands = 32)
    val bf = Decontaminate.buildShingleBloom(testSet, "doc_id", "text",
      shingleK = 5)
    try {
      val mem = MemoryStream[(Long, Timestamp, String)]
      val curated = StreamCurate.pipeline(index, bf,
        mem.toDF().toDF("doc_id", "ts", "text"),
        "doc_id", "text", "ts", langs = Set("en"), threshold = 0.8,
        watermark = "1 minute", windowDur = "5 minutes",
        shingleK = 5, minWords = 8, maxWords = 200,
        langModel = Some(model))
      val q = curated.writeStream.format("memory").queryName("curated_t1p")
        .outputMode("append").start()
      try {
        mem.addData(incoming)
        q.processAllAvailable()
        mem.addData(flusher)
        q.processAllAvailable()
      } finally q.stop()
      val got = spark.table("curated_t1p")
        .select("doc_id", "lang", "n_tokens", "text")
        .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2),
          r.getString(3))).toSet
      val batch = StreamCurate.batch(index, bf,
          incoming.toDF("doc_id", "ts", "text"), "doc_id", "text",
          langs = Set("en"), threshold = 0.8,
          shingleK = 5, minWords = 8, maxWords = 200,
          langModel = Some(model))
        .select("doc_id", "lang", "n_tokens", "text")
        .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2),
          r.getString(3))).toSet
      assert(got === batch, "trained-tier stream must equal the batch twin")
      assert(got.map(_._1) === Set(101L, 102L),
        s"clean docs survive the trained gate: ${got.map(_._1)}")
      assert(got.forall(_._2 == "en"))
    } finally MinHashIndex.drop(index)
  }

  test("pipeline refuses a Gopher floor below the index shingle length") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    val s = spark; import s.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val index = MinHashIndex.build(corpus, "doc_id", "text",
      shingleK = 3, numHashes = 128, numBands = 32)
    try {
      val ex = intercept[IllegalArgumentException] {
        StreamCurate.pipeline(index, Array[Byte](0, 0, 0, 0),
          MemoryStream[(Long, Timestamp, String)].toDF()
            .toDF("doc_id", "ts", "text"),
          "doc_id", "text", "ts", Set("en"), 0.8, "1 minute", "5 minutes",
          minWords = 2)
      }
      assert(ex.getMessage.contains("minWords"))
    } finally MinHashIndex.drop(index)
  }
}
