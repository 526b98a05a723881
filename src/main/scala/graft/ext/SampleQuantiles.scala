package graft.ext

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graft.BottomKSampleAgg

/** Mergeable sampled quantiles — the summary-table percentile measure.
  *
  * Exact per-group percentiles (q66) re-scan history on every refresh;
  * `percentile_approx`'s internal buffer is neither portable nor
  * exposed for storage. This sketch is both: the state is the k pairs
  * (draw, value) with the smallest PORTABLE md5 draws
  * ([[Splits.md5Prefix]] discipline) — a uniform without-replacement
  * row sample that is a pure function of the input set, so
  *
  *   - the DuckDB oracle recomputes the IDENTICAL sample and quantiles
  *     (hash-exact gate, not a tolerance contract),
  *   - shard/day sketches MERGE exactly: union the pairs, keep the k
  *     smallest ([[mergeStates]] — the [[CountMin.merge]] property, so
  *     "p95 per day per shard" rolls up without rescanning facts),
  *   - state is bounded at k pairs per group inside the aggregation
  *     buffer itself ([[BottomKSampleAgg]], a TypedImperativeAggregate
  *     with a capped max-heap — `collect_list`-then-slice has unbounded
  *     partials; a sketch that spills is not a sketch).
  *
  * Estimator: value at rank max(1, ceil(p·n)) of the sample sorted
  * ascending — deterministic, stated identically in SQL. Sampling
  * error is the standard O(1/√k) in rank (SampleQuantilesSpec bounds
  * it empirically against exact percentiles).
  */
object SampleQuantiles {

  /** Portable uniform draw from a unique row id (int64 of the first 8
    * md5 hex chars — the [[Splits.md5Prefix]] value as a long). */
  def draw(id: Column): Column =
    conv(substring(md5(id.cast("string")), 1, 8), 16, 10).cast("long")

  /** The aggregate: array<struct<draw,value>> of the k pairs with the
    * smallest draws, sorted by (draw, value). */
  def bottomK(drawCol: Column, value: Column, k: Int): Column =
    BottomKSampleAgg.bottomK(drawCol, value.cast("double"), k)

  /** Sample values sorted ascending. */
  def sampleValues(state: Column): Column =
    array_sort(transform(state, p => p.getField("value")))

  /** Quantile estimate from a state: sorted sample value at rank
    * max(1, ceil(p·n)), null for an empty sample. */
  def quantile(state: Column, p: Double): Column = {
    val vs = sampleValues(state)
    element_at(vs, greatest(lit(1), ceil(lit(p) * size(vs)).cast("int")))
  }

  /** Merge stored states (an array of state arrays — e.g. one per
    * shard/day collected in a summary re-aggregation): union the pairs
    * and keep the k smallest by (draw, value). Exactly the aggregate's
    * own merge, expressed over stored columns. */
  def mergeStates(states: Column, k: Int): Column =
    slice(array_sort(flatten(states)), 1, k)
}
