package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Shared text-preparation expressions for the LLM-data-pipeline operators
  * (dedup, text analysis, fingerprinting).
  *
  * Everything here is a Catalyst expression tree over built-in functions —
  * distributed, no UDF serialization — and every definition has an exact
  * DuckDB twin (documented per function) so results stay oracle-checkable.
  *
  * == Evaluation-cost discipline (the 100 TB part) ==
  *
  * Higher-order functions (`transform`/`aggregate`) evaluate their lambda
  * bodies interpreted, per element, with NO common-subexpression
  * elimination — any non-trivial expression referenced inside a lambda body
  * is recomputed on every element. Worse, `CollapseProject` inlines any
  * alias referenced exactly once, including into lambda bodies. Two rules
  * keep the pipelines linear-cost:
  *
  *   1. Expensive stages (tokenize, shingle, string-hash, signature) are
  *      materialized as their own projection (`withColumn` chain), and every
  *      consumer expression references the staged column ≥2 times — either
  *      naturally or through a load-bearing emptiness guard — so
  *      CollapseProject cannot inline the producer into a lambda.
  *   2. Hash families derive from ONE string hash per element:
  *      `xxhash64(shingle)` once, then `xxhash64(h, i)` per permutation —
  *      fixed-width long re-hashing instead of k full string hashes.
  */
object TextPrep {

  /** Whitespace tokens of lowercased, trimmed text.
    * DuckDB twin: `string_split_regex(lower(trim(text)), '\s+')`. */
  def tokens(text: Column): Column =
    split(lower(trim(text)), "\\s+")

  /** Distinct word k-shingles from a *materialized* token-array column.
    * `toks` must be an attribute reference (see [[stagedShingles]]) — it is
    * referenced inside the per-index lambda and would otherwise recompute
    * the tokenizer once per shingle position. (It is referenced 3× here, so
    * CollapseProject keeps the producing projection separate.) */
  def shinglesFromTokens(toks: Column, k: Int): Column =
    array_distinct(
      when(size(toks) >= k,
        transform(sequence(lit(1), size(toks) - (k - 1)),
          i => concat_ws(" ", slice(toks, i, lit(k)))))
        .otherwise(array().cast("array<string>")))

  /** Distinct word k-shingles of raw text — convenience form for small
    * inputs and oracle twins. Hot paths use [[stagedShingles]].
    * DuckDB twin: `list_distinct([w[i]||' '||...||w[i+k-1] for i in ...])`. */
  def shingles(text: Column, k: Int): Column =
    shinglesFromTokens(tokens(text), k)

  /** df + a shingle column `out`, built in two non-collapsible stages:
    * tokens (one regex split per row) → shingles (slice+concat per index). */
  def stagedShingles(df: DataFrame, textCol: String, k: Int, out: String): DataFrame =
    df.withColumn("__toks", tokens(col(textCol)))
      .withColumn(out, shinglesFromTokens(col("__toks"), k))
      .drop("__toks")

  /** Exact Jaccard similarity of two pre-deduplicated string arrays.
    * DuckDB twin: `len(list_intersect(a,b)) / len(list_distinct(list_concat(a,b)))`.
    * Returns DOUBLE; callers round before comparing/ordering. */
  def jaccard(a: Column, b: Column): Column = {
    val inter = size(array_intersect(a, b)).cast("double")
    val union = size(array_union(a, b)).cast("double")
    when(union === 0, lit(0.0)).otherwise(inter / union)
  }

  /** One 64-bit base hash per shingle/token — the ONLY string hashing the
    * sketch pipelines do. MinHash permutations and SimHash bit votes derive
    * from this via native long re-hash loops
    * (org.apache.spark.sql.graft.SketchExprs — codegen'd; no DuckDB twin:
    * oracle checks run on the *verified outputs*, not the sketches). */
  def baseHashes(shingleSet: Column): Column =
    transform(shingleSet, s => xxhash64(s))
}
