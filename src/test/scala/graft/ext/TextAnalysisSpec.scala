package graft.ext

import org.apache.spark.sql.functions._
import graft.SparkSpec

class TextAnalysisSpec extends SparkSpec {
  import spark.implicits._

  private def one(text: String, c: org.apache.spark.sql.Column): Any =
    Seq(text).toDF("text").select(c).collect().head.get(0)

  test("langId picks the profile with most marker hits, deterministic ties") {
    assert(one("the cat and the dog is a pet", TextAnalysis.langId(col("text"))) === "en")
    assert(one("der hund und die katze ist ein tier", TextAnalysis.langId(col("text"))) === "de")
    assert(one("el perro y la casa de que es", TextAnalysis.langId(col("text"))) === "es")
    assert(one("le chat et les maisons est une", TextAnalysis.langId(col("text"))) === "fr")
    assert(one("xyzzy plugh foobar", TextAnalysis.langId(col("text"))) === "und")
  }

  test("token counts: whitespace vs BPE-ish pre-tokenizer") {
    assert(one("hello world", TextAnalysis.wsTokenCount(col("text"))) === 2)
    // "hello, world42!" → [hello][,][world][42][!] = 5
    assert(one("hello, world42!", TextAnalysis.bpeishTokenCount(col("text"))) === 5)
  }

  test("quality score stays in [0,1] and rewards longer natural text") {
    val lo = one("x", TextAnalysis.qualityScore(col("text"))).asInstanceOf[Double]
    val hi = one(("the quick brown fox jumps over the lazy dog and runs to a barn " * 10),
      TextAnalysis.qualityScore(col("text"))).asInstanceOf[Double]
    assert(lo >= 0.0 && lo <= 1.0 && hi >= 0.0 && hi <= 1.0)
    assert(hi > lo)
  }

  test("fingerprint: equal for identical text, short-text fallback works") {
    val df = Seq((1L, "a b c d e f g"), (2L, "a b c d e f g"), (3L, "zz")).toDF("id", "text")
    val fps = df.select(col("id"), TextAnalysis.fingerprint(col("text"), 5).as("fp"))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(fps(1L) === fps(2L))
    assert(fps(3L) !== fps(1L))
    assert(fps(3L).length === 32) // md5 hex fallback
  }

  test("punct_ratio counts quotes/hyphens/brackets — parity with the q33 oracle class") {
    // The Scala feature and the DuckDB oracle regex share the exact char
    // class [.,;:!?'"()\[\]{}-]; the synthetic corpus has none of the
    // "extended" chars, so this doc locks the parity a real corpus needs.
    val doc = """He said "wait" - (really!) [ok] {x}; done?"""
    // punctuation chars: " " - ( ! ) [ ] { } ; ? plus the period-free rest
    val expected = doc.count(c => ".,;:!?'\"()[]{}-".contains(c))
    val got = Seq(doc).toDF("text")
      .select(TextAnalysis.qualityFeatures(col("text")).find(_._1 == "punct_ratio").get._2
        .as("pr"), length(col("text")).as("n"))
      .collect().head
    assert(got.getDouble(0) === (expected.toDouble / doc.length * 1e6).round / 1e6)
  }

  test("shingles: k-grams over tokens, distinct, empty under k tokens") {
    val sh = Seq("a b c d").toDF("text")
      .select(TextPrep.shingles(col("text"), 3).as("s"))
      .collect().head.getSeq[String](0)
    assert(sh === Seq("a b c", "b c d"))
    val empty = Seq("a b").toDF("text")
      .select(TextPrep.shingles(col("text"), 3).as("s"))
      .collect().head.getSeq[String](0)
    assert(empty.isEmpty)
  }

  test("scriptProfile counts explicit codepoint ranges on a CJK/Latin-ext/edge fixture") {
    // The q244 gate's sf corpus is ASCII-only, so it cannot exercise the
    // ranges that went red in round 14 (JDK-vs-RE2 Unicode-table skew on
    // \p{IsLatin}/\p{Latin}). This fixture does: Han ideographs, accented
    // Latin (script Latin, É U+00C9 / ü U+00FC), a Latin Extended
    // Additional char (ḡ U+1E21), × U+00D7 (NOT script Latin — excluded
    // from the range class on both engines), vertical tab U+000B (Java \s
    // but NOT the explicit whitespace class → lands in `other`), and a
    // digit. Expected counts are hand-derived pure codepoint arithmetic —
    // any future drift back to named property classes breaks this pin.
    val doc = "caf\u00C9 \u00FC\u1E21 3\u00D7 \u4E2D\u6587\u3400ok\u000B"
    val prof = TextAnalysis.scriptProfile(col("text")).toMap
    val r = Seq(doc).toDF("text")
      .select(prof("latin_cnt").as("l"), prof("han_cnt").as("h"),
        prof("digit_cnt").as("d"), prof("space_cnt").as("s"),
        prof("other_cnt").as("o"), prof("script").as("sc"), prof("mixed").as("m"))
      .collect().head
    assert(r.getLong(0) === 8L) // c a f É ü ḡ o k
    assert(r.getLong(1) === 3L) // 中 文 㐀
    assert(r.getLong(2) === 1L) // 3
    assert(r.getLong(3) === 3L) // three U+0020; U+000B is NOT whitespace here
    assert(r.getLong(4) === 2L) // × and U+000B
    assert(r.getString(5) === "latin")
    assert(r.getBoolean(6))
  }
}
