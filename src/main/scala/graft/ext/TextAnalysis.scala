package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Text-analysis operators over document corpora: language identification,
  * quality scoring, token counting, document fingerprinting.
  *
  * All pure Catalyst expression trees (codegen'd, distributed); each has an
  * exact DuckDB-SQL twin documented with it so the driver oracle can
  * hash-match results.
  */
object TextAnalysis {

  /** Marker-word profiles for the n-gram/stopword language-ID heuristic.
    * Deterministic and tiny (broadcast as literals into the plan). */
  val langMarkers: Seq[(String, Seq[String])] = Seq(
    "en" -> Seq("the", "a", "and", "of", "to", "is"),
    "de" -> Seq("der", "die", "das", "und", "ist", "ein"),
    "es" -> Seq("el", "la", "de", "que", "y", "es"),
    "fr" -> Seq("le", "la", "les", "et", "est", "une"),
    "zh" -> Seq("的", "是", "了", "在", "我", "有"))

  /** Language-ID: argmax of marker-word hits over the distinct token set,
    * ties broken by profile order (en > de > es > fr > zh), 'und'
    * (undetermined) when nothing hits.
    * DuckDB twin: chained CASE over len(list_intersect(...)) ≥ pairwise max.
    */
  def langId(text: Column): Column = {
    val toks = array_distinct(TextPrep.tokens(text))
    val hits = langMarkers.map { case (lang, markers) =>
      lang -> size(array_intersect(toks, array(markers.map(lit): _*)))
    }
    val best = hits.map(_._2).reduce((a, b) => greatest(a, b))
    hits.foldRight(lit("und"): Column) { case ((lang, h), elseCol) =>
      when(h === best && h > 0, lit(lang)).otherwise(elseCol)
    }
  }

  /** Quality-score feature columns + composite score.
    *
    * Features (each oracle-expressible):
    *   n_chars (length), n_tokens (whitespace), punct_ratio (punctuation
    *   chars / chars), stop_ratio (stopword tokens / tokens), mean_tok_len.
    * Composite: a clamped linear score in [0,1] — a document is "good" when
    * it's long enough, not punctuation-soup, and has natural word lengths.
    */
  def qualityFeatures(text: Column): Seq[(String, Column)] = {
    val toks = TextPrep.tokens(text)
    val nChars = length(text)
    val nToks = size(toks)
    val punct = length(regexp_replace(text, "[^.,;:!?'\"()\\[\\]{}-]", ""))
    val stopHits = size(filter(toks, t => t.isin("the", "a", "and", "of", "to", "is"): Column))
    Seq(
      "n_chars" -> nChars,
      "n_tokens" -> nToks,
      "punct_ratio" -> round(punct.cast("double") / greatest(nChars, lit(1)), 6),
      "stop_ratio" -> round(stopHits.cast("double") / greatest(nToks, lit(1)), 6),
      "mean_tok_len" -> round((length(regexp_replace(lower(trim(text)), "\\s+", "")).cast("double"))
        / greatest(nToks, lit(1)), 6))
  }

  /** Composite quality score in [0,1]: rewards 200–2000 chars, penalizes
    * punctuation soup and stopword-free (unnatural) text. Deterministic
    * arithmetic only. */
  def qualityScore(text: Column): Column = {
    val f = qualityFeatures(text).toMap
    val lenScore = least(f("n_chars").cast("double") / 400.0, lit(1.0))
    val punctPenalty = least(f("punct_ratio") * 5.0, lit(1.0))
    round(greatest(least(lenScore - punctPenalty * 0.5 + f("stop_ratio") * 0.2, lit(1.0)), lit(0.0)), 6)
  }

  /** Canonical text normalization for ingest: strip C0 control chars →
    * Unicode NFC (native expression, engine has no built-in) → collapse
    * whitespace runs → trim. DuckDB twin:
    * `trim(regexp_replace(nfc_normalize(regexp_replace(text,'[\x00-\x1f]',' ','g')),'\s+',' ','g'))`. */
  def normalizeText(text: Column): Column =
    trim(regexp_replace(
      org.apache.spark.sql.graft.NfcNormalize(
        regexp_replace(text, "[\\x00-\\x1f]", " ")),
      "\\s+", " "))

  /** Whitespace token count. DuckDB: len(string_split_regex(trim(text),'\s+')). */
  def wsTokenCount(text: Column): Column = size(TextPrep.tokens(text))

  /** BPE-ish token count: letter runs, digit runs, and single punctuation
    * marks each count as one token — the standard pre-tokenizer shape.
    * DuckDB twin: len(regexp_extract_all(lower(text), '[a-z]+|[0-9]+|[^a-z0-9\s]')).
    */
  def bpeishTokenCount(text: Column): Column =
    size(regexp_extract_all(lower(text), lit("[a-z]+|[0-9]+|[^a-z0-9\\s]"), lit(0)))

  /** Document fingerprint: minimum md5 over word-`k`-shingles (a 1-hash
    * MinHash with an engine-portable hash). Equal fingerprints ⇒ high
    * shingle overlap with high probability; used for cheap near-dup
    * clustering and incremental corpus diffing.
    * DuckDB twin: list_min(list_transform(shingles, s -> md5(s))).
    *
    * Convenience single-expression form — fine for small inputs/specs; hot
    * paths use [[withFingerprint]], which stages the token array so the
    * tokenizer isn't re-evaluated per shingle index. */
  def fingerprint(text: Column, shingleK: Int = 5): Column =
    coalesce(
      array_min(transform(TextPrep.shingles(text, shingleK), s => md5(s))),
      md5(lower(trim(text))))

  /** df + fingerprint column `out`, staged (tokens materialized once per
    * row, shingles once, then the md5 fold). */
  def withFingerprint(df: DataFrame, textCol: String, shingleK: Int, out: String): DataFrame =
    TextPrep.stagedShingles(df, textCol, shingleK, "__sh")
      .withColumn(out,
        coalesce(
          array_min(transform(col("__sh"), s => md5(s))),
          md5(lower(trim(col(textCol))))))
      .drop("__sh")

  /** PII patterns scrubbed by [[redactPii]], applied in order. Both regexes
    * stay in the portable common subset of Java regex and RE2 (no
    * backrefs, no lookaround) so the DuckDB oracle twin is literal. */
  val piiPatterns: Seq[(String, String)] = Seq(
    "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}" -> "<EMAIL>",
    "\\+?[0-9]{1,2}-[0-9]{3}-[0-9]{4}" -> "<PHONE>")

  /** PII redaction: replace email addresses and phone-shaped numbers with
    * typed placeholder tags — the mandatory scrub pass before a corpus
    * becomes training data. A narrow map (two regexp_replace stages), no
    * shuffle. DuckDB twin: chained `regexp_replace(..., 'g')`. */
  def redactPii(text: Column): Column =
    piiPatterns.foldLeft(text) { case (c, (pat, tag)) =>
      regexp_replace(c, pat, tag)
    }

  /** T24 — Unicode-SCRIPT profile: per-doc codepoint counts by script
    * class (Latin, Han, digits, whitespace, everything else), the
    * dominant script, and a mixed-script flag. The signal under three
    * curation gates langid alone can't serve: (a) code-switching docs
    * (prose legitimately mixing scripts — route to multilingual
    * handling, don't drop), (b) mojibake / encoding damage (a "Latin"
    * doc with a high other-count is usually broken bytes, the classic
    * web-crawl failure), (c) CJK tokenizer routing (whitespace
    * tokenization is wrong for Han-dominant text regardless of what the
    * langid marker words said). One `regexp_count` pass per class —
    * codegen'd, map-only, no UDF. Every class is an EXPLICIT
    * codepoint-range character class, never a named Unicode property:
    * `\p{IsLatin}` (JDK) and `\p{Latin}` (RE2) read different frozen
    * copies of the Unicode script table, so their answers can skew by
    * Unicode VERSION even when both are "correct" — the same
    * divergence class as Java `\s` matching U+000B where RE2's does
    * not (whitespace here is the explicit `[ \t\n\r\f]` for that
    * reason). With literal ranges the count is a pure function of the
    * codepoints on any JDK/DuckDB build, and the DuckDB twin restates
    * the IDENTICAL ranges in RE2 `\x{...}` spelling (q244 pins it
    * hash-exact at the gate). Coverage note: "latin" = ASCII letters +
    * Latin-1/Extended-A/B + IPA + Latin Extended Additional; "han" =
    * CJK Extension A + Unified Ideographs + Compatibility Ideographs —
    * the blocks real crawl corpora actually contain; rarer historic
    * blocks deliberately land in `other` on BOTH engines. */
  def scriptProfile(text: Column): Seq[(String, Column)] = {
    def cnt(pat: String) = regexp_count(text, lit(pat)).cast("long")
    val latin = cnt("[A-Za-z\\u00C0-\\u00D6\\u00D8-\\u00F6\\u00F8-\\u02AF\\u1E00-\\u1EFF]")
    val han = cnt("[\\u3400-\\u4DBF\\u4E00-\\u9FFF\\uF900-\\uFAD9]")
    val digit = cnt("[0-9]")
    val space = cnt("[ \\t\\n\\r\\f]")
    val other = length(text).cast("long") - latin - han - digit - space
    Seq(
      "latin_cnt" -> latin,
      "han_cnt" -> han,
      "digit_cnt" -> digit,
      "space_cnt" -> space,
      "other_cnt" -> other,
      "script" -> when(latin === 0L && han === 0L, lit("none"))
        .when(han > latin, lit("han")).otherwise(lit("latin")),
      "mixed" -> (latin > 0L && han > 0L))
  }

  /** Count of PII matches [[redactPii]] would scrub.
    * DuckDB twin: sum of `len(regexp_extract_all(...))` per pattern —
    * counted pattern-by-pattern on the ORIGINAL text, mirroring the
    * sequential replace (emails are consumed before the phone pass). */
  def piiMatchCount(text: Column): Column =
    piiPatterns.zipWithIndex.map { case ((pat, _), i) =>
      // count each pattern on the text with all EARLIER patterns scrubbed,
      // exactly like the sequential replace does
      val scrubbed = piiPatterns.take(i).foldLeft(text) { case (c, (p, tag)) =>
        regexp_replace(c, p, tag)
      }
      size(regexp_extract_all(scrubbed, lit(pat), lit(0)))
    }.reduce(_ + _)

  /** LZ78 incremental-parse phrase count — the compressibility quality
    * signal ([[org.apache.spark.sql.graft.Lz78Phrases]]): boilerplate/
    * template spam parses into few long phrases (low count), natural
    * prose sits in a mid band, random byte soup approaches one phrase
    * per character. Unlike gzip-ratio filters, the LZ78 parse is a pure
    * function of the string — one canonical answer on any engine. */
  def lz78Phrases(text: Column): Column =
    org.apache.spark.sql.graft.CompressExprs.lz78Phrases(text)

  /** Normalized compressibility in (0, 1]: phrases / chars, rounded to
    * 6 places; 0.0 for the empty string. The band-filter form of the
    * signal (both tails are suspect: ≲0.2 is machine repetition, ≳0.95
    * is noise at document length). */
  def lz78Ratio(text: Column): Column =
    when(length(text) === 0, lit(0.0))
      .otherwise(round(lz78Phrases(text).cast("double") /
        greatest(length(text), lit(1)).cast("double"), 6))

  /** Gopher-style repetition signal: fraction of word 2..k-grams that are
    * duplicates of an earlier occurrence in the same document
    * (1 − distinct/total). High values flag boilerplate / looping
    * generations. `toks` must be a materialized token-array column
    * (TextPrep staging discipline).
    * DuckDB twin: `1 - len(list_distinct(ngrams)) / (len(w) - k + 1)`. */
  def dupNgramFraction(toks: Column, k: Int): Column = {
    val total = greatest(size(toks) - (k - 1), lit(0))
    val distinctN = size(TextPrep.shinglesFromTokens(toks, k))
    when(total <= 0, lit(0.0))
      .otherwise(round(lit(1.0) - distinctN.cast("double") / total.cast("double"), 6))
  }
}
