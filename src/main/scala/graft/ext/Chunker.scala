package graft.ext

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Overlapping token-window chunking — the context-window preparation step
  * of an LLM training/RAG pipeline: each document becomes a sequence of
  * fixed-size token windows advancing by a stride, with the degenerate
  * tail chunk (fully contained in its predecessor) dropped.
  *
  * Shape at scale: one tokenizer pass, one Generate (explode of the start
  * grid — an int array, not the tokens), and a narrow projection slicing
  * the staged token array per chunk. No shuffle at all: chunking is
  * embarrassingly parallel per document, so the operator composes with a
  * downstream `repartition` on the pack/shuffle key chosen by the caller
  * (e.g. `ext.Pack` for sequence packing) rather than imposing one.
  *
  * Reference framing: the corpus tables exist for the north-star pipeline
  * ops (`TESTDATA.md`); chunking is the standard upstream of the q69
  * sequence-packing operator already in the inventory.
  */
object Chunker {

  /** Chunk `textCol` into windows of `chunkSize` tokens advancing by
    * `stride` (overlap = chunkSize - stride). Keeps every grid chunk that
    * extends coverage: start 0 always, later starts only while they add
    * more than (chunkSize - stride) fresh tokens — i.e. the canonical
    * "last chunk may be short, but never nested" rule.
    *
    * Output: idCol, chunk_start (BIGINT), n_tokens (BIGINT), chunk_text.
    * DuckDB twin: generate_series start grid + list_slice (see Q103).
    */
  def chunk(docs: DataFrame, idCol: String, textCol: String,
            chunkSize: Int, stride: Int): DataFrame = {
    require(stride > 0 && chunkSize >= stride,
      s"need 0 < stride <= chunkSize, got stride=$stride chunkSize=$chunkSize")
    val minTail = chunkSize - stride
    docs
      .withColumn("__toks", TextPrep.tokens(col(textCol)))
      .withColumn("__n", size(col("__toks")))
      // start grid 0, stride, 2*stride, ... < n (tokens() is never empty:
      // splitting "" yields [""], so sequence bounds are always valid).
      // explode_outer, not explode: the plain form makes the optimizer
      // infer a size>0 filter below the staged projections, re-running the
      // tokenizer per row at the scan (q105's measured trap); the grid is
      // never empty, so outer semantics are identical here.
      .withColumn("chunk_start",
        explode_outer(sequence(lit(0), col("__n") - 1, lit(stride))))
      .withColumn("n_tokens", least(lit(chunkSize), col("__n") - col("chunk_start")))
      .filter(col("chunk_start") === 0 || col("n_tokens") > minTail)
      .select(col(idCol),
        col("chunk_start").cast("long").as("chunk_start"),
        col("n_tokens").cast("long").as("n_tokens"),
        concat_ws(" ",
          slice(col("__toks"), col("chunk_start") + 1, col("n_tokens")))
          .as("chunk_text"))
  }
}
