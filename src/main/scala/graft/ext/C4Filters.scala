package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** C4-style LINE-level corpus filters (Raffel et al. 2020, §2.2 — the
  * cleaning pipeline behind the C4 dataset), complementing §2.17's
  * document-level Gopher battery (T13): Gopher votes on whole documents,
  * C4 edits documents line by line and votes on what survives.
  *
  * Rules implemented (the C4 paper's battery, minus the external
  * badword list, which is an i18n'd third-party artifact — the hook is
  * the same `lineKeep` conjunction):
  *   - keep a line only if it ends in a terminal punctuation mark
  *     (period, exclamation, question mark, or closing quote),
  *   - keep a line only if it has at least `minWords` words,
  *   - drop any line containing the word "javascript" (cookie/JS
  *     boilerplate heuristic),
  *   - drop the whole page if fewer than `minKeptLines` lines survive
  *     (the paper's "fewer than 3 sentences" rule — surviving lines are
  *     the sentence proxy),
  *   - drop the whole page if it mentions "lorem ipsum" or contains a
  *     curly brace (template/code leakage).
  *
  * Scale shape: everything is ONE codegen'd projection over the scan —
  * `split` → array `filter` with the line predicate → `array_join`; no
  * explode, no shuffle, no UDF. At 100 TB the cost is the scan itself,
  * and the filtered text never materializes wider than the row it came
  * from. The per-line predicate is exposed separately ([[lineKeep]]) so
  * pipelines can explode-and-inspect when they want per-line forensics.
  *
  * Reference context: /root/reference/compose/init_db.py:348 seeds a raw
  * text corpus; C4 line filtering is the first pass a crawl-derived
  * corpus takes before the Gopher/perplexity tiers.
  */
object C4Filters {

  /** The C4 line predicate: terminal punctuation + minimum word count +
    * no "javascript". `trim(line) != ''` guards the empty-split artifact
    * (split of "" yields [""]). */
  def lineKeep(line: Column, minWords: Int = 5): Column =
    regexp_like(rtrim(line), lit("[.!?\"]$")) &&
      (size(split(trim(line), "\\s+")) >= minWords) &&
      (trim(line) =!= "") &&
      (instr(lower(line), "javascript") === 0)

  /** Per-document C4 verdict + edited text: (id, n_lines, n_kept, keep,
    * filtered_text). `keep` is the page-level vote; `filtered_text` is
    * the kept lines re-joined — what a curation pipeline would write
    * onward for kept pages. */
  def c4Filter(docs: DataFrame, idCol: String, textCol: String,
      minWords: Int = 5, minKeptLines: Int = 3): DataFrame = {
    val lines = split(col(textCol), "\n")
    val kept = filter(lines, l => lineKeep(l, minWords))
    docs.select(
      col(idCol),
      size(lines).as("n_lines"),
      size(kept).as("n_kept"),
      ((size(kept) >= minKeptLines) &&
        (instr(lower(col(textCol)), "lorem ipsum") === 0) &&
        (instr(col(textCol), "{") === 0)).as("keep"),
      array_join(kept, "\n").as("filtered_text"))
  }
}
