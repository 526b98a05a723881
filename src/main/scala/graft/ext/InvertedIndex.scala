package graft.ext

import java.util.concurrent.ConcurrentHashMap

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel

/** Build-once / query-many BM25 inverted index — the relevance twin of
  * the serving lifecycles ([[LshIndex]]/[[MinHashIndex]]):
  * [[Relevance.bm25TopK]] tokenizes the ENTIRE corpus inside every
  * query (the corpus scan dominates; the per-query terms only prune
  * AFTER the explode), but search serving builds postings once and
  * answers queries from them — the oldest index structure there is.
  *
  * Index anatomy:
  *   - `postings` — (term, doc_id, tf, dl): one row per distinct
  *     (document, term), with the document length riding along so
  *     scoring never re-joins a lengths table. Stored through
  *     [[IndexStore.writeInverted]] it clusters+sorts by term — a query
  *     is a `term IN (...)` literal predicate pushed to the parquet
  *     reader (the q187 move), so the scan reads the queried terms'
  *     row groups, not the corpus.
  *   - `docFreq` — (term, df): Zipf-bounded (vocabulary-sized),
  *     broadcast onto the postings at query time.
  *   - (nDocs, avgdl) — two scalars, pinned at build.
  *
  * A query therefore costs: selected postings rows (Σ df over query
  * terms) + a vocabulary-row broadcast — independent of corpus size for
  * fixed query terms. [[bm25]] is expression-for-expression the
  * [[Relevance.bm25TopK]] scorer (same log form, same rounding), so the
  * q55 oracle carries over unchanged.
  */
object InvertedIndex {

  /** `sumDl` (exact token total) rides beside `avgdl` because the APPEND
    * path must update the corpus scalars exactly: avgdl is a derived
    * quotient, and only the (nDocs, sumDl) pair folds under the counting
    * discipline — avgdl′ = (sumDl + sumDlᵢ)/(nDocs + nDocsᵢ) reproduces a
    * rebuild's avg(dl) bit-for-bit (integer sums below 2^53 are exact in
    * the double accumulator, so the final division is the same op). */
  final case class Index(postings: DataFrame, docFreq: DataFrame,
      nDocs: Long, avgdl: Double, sumDl: Long)

  /** Tokenize + count once; postings persisted and materialized, df and
    * the corpus scalars computed at build (bounded driver state). */
  def build(docs: DataFrame, idCol: String, textCol: String): Index = {
    val toks = docs
      .withColumn("__toks", TextPrep.tokens(col(textCol)))
      .select(col(idCol).as("doc_id"), col("__toks"),
        size(col("__toks")).as("dl"))
    val postings = toks
      .select(col("doc_id"), col("dl"), explode(col("__toks")).as("term"))
      .groupBy(col("term"), col("doc_id"), col("dl"))
      .agg(count(lit(1)).as("tf"))
      .select(col("term"), col("doc_id"), col("tf"), col("dl"))
      .persist(StorageLevel.MEMORY_AND_DISK)
    postings.count() // pay the corpus pass HERE
    val docFreq = postings.groupBy("term").agg(count(lit(1)).as("df"))
      .persist(StorageLevel.MEMORY_AND_DISK)
    val stats = toks.agg(count(lit(1)).as("n"), avg(col("dl")).as("a"),
      coalesce(sum(col("dl")), lit(0L)).cast("long").as("s")).head()
    Index(postings, docFreq, stats.getLong(0), stats.getDouble(1),
      stats.getLong(2))
  }

  /** BM25 top-k from the index: postings filtered to the query terms
    * (literal IN — pushed to the scan on a stored index), df broadcast,
    * the [[Relevance.bm25TopK]] scoring expression verbatim. */
  def bm25(index: Index, terms: Seq[String], topK: Int,
      k1: Double = 1.2, b: Double = 0.75): DataFrame = {
    require(terms.nonEmpty, "query terms must be non-empty")
    index.postings
      .where(col("term").isin(terms: _*))
      .join(broadcast(index.docFreq.where(col("term").isin(terms: _*))),
        Seq("term"))
      .select(col("doc_id"),
        (log((lit(index.nDocs) - col("df") + 0.5) / (col("df") + 0.5) + 1.0)
          * (col("tf") * (k1 + 1))
          / (col("tf") + (col("dl") / index.avgdl * b + (1.0 - b)) * k1))
          .as("__s"))
      .groupBy(col("doc_id"))
      .agg(round(sum(col("__s")), 6).as("bm25"))
      .orderBy(col("bm25").desc, col("doc_id"))
      .limit(topK)
  }

  /** Release the index's cluster-side state. */
  def drop(index: Index): Unit = {
    index.postings.unpersist(); index.docFreq.unpersist(); ()
  }

  // ---- positional postings + phrase search --------------------------

  /** Positional postings — (term, doc_id, pos), one row per token
    * OCCURRENCE (0-based position), vs [[build]]'s one row per distinct
    * (doc, term). This is the classic phrase/proximity index layout:
    * bigger than tf postings by the corpus token count, but the only
    * structure that can answer adjacency. Stored through
    * [[IndexStore.writePositional]] it clusters+sorts by term, so a
    * phrase query's `term IN (...)` pushes to the reader and row-group
    * skips to the queried terms (the q187/q191 move). */
  def buildPositional(docs: DataFrame, idCol: String,
      textCol: String): DataFrame =
    docs
      .withColumn("__toks", TextPrep.tokens(col(textCol)))
      .select(col(idCol).as("doc_id"),
        posexplode(col("__toks")).as(Seq("pos", "term")))
      .select(col("term"), col("doc_id"), col("pos"))

  /** Exact phrase occurrence counts: documents where `phrase`'s terms
    * appear CONSECUTIVELY, with how often. Every per-term stream is
    * re-keyed to the phrase's would-be START position (`pos − i`), so
    * each of the n−1 joins is an equi-join on the SAME key pair
    * (doc_id, pos) — Catalyst reuses one exchange partitioning across
    * the whole fold instead of re-shuffling per term. Query cost is
    * Σ occurrences of the phrase's terms (IN-pruned at the scan on a
    * stored index), independent of corpus size for fixed terms.
    * Duplicate terms in the phrase are handled naturally: the stream is
    * filtered per position, so "a b a" self-joins the a-stream at two
    * different alignments. */
  def phraseCount(positional: DataFrame, phrase: Seq[String]): DataFrame = {
    require(phrase.nonEmpty, "phrase must be non-empty")
    val pruned = positional.where(col("term").isin(phrase.distinct: _*))
    val first = pruned.where(col("term") === phrase.head)
      .select(col("doc_id"), col("pos"))
    val matches = phrase.zipWithIndex.tail.foldLeft(first) {
      case (acc, (t, i)) =>
        acc.join(
          pruned.where(col("term") === t)
            .select(col("doc_id"), (col("pos") - i).as("pos")),
          Seq("doc_id", "pos"))
    }
    matches.groupBy("doc_id").agg(count(lit(1)).as("n_occ"))
  }

  private val cache = new Memo[Index](drop)

  /** Serving memo — the q78_search semantics; bounded LRU, eviction
    * unpersists ([[Memo]]). */
  def cached(key: String)(build: => Index): Index = cache(key)(build)

  private val posCache =
    new Memo[DataFrame](df => { df.unpersist(false); () })

  /** Serving memo for positional postings (the [[cached]] semantics:
    * rep 1 pays build+store, reps 2+ price steady-state). */
  def cachedPositional(key: String)(build: => DataFrame): DataFrame =
    posCache(key)(build)
}
