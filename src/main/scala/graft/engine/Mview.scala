package graft.engine

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Incremental materialized-view maintenance — the summary-table engine
  * feature (Trino/BigQuery MVs, Iceberg's incremental-refresh pattern):
  * an aggregate over a fact table is stored as its own table and kept
  * fresh by folding in only the rows APPENDED since the last refresh.
  *
  * Mechanism: additive measures (count/sum — the partial-aggregable
  * class) make the view mergeable: refresh = aggregate the delta
  * ([[Layout.readBetween]] over snapshot tags — O(new data)) and
  * re-aggregate `stored ∪ delta-partial` by key. Both re-agg inputs are
  * SUMMARY-sized, so a refresh never touches historical fact bytes —
  * that is the entire point at 100 TB: the nightly dashboard refresh
  * costs the night's data, not the table's.
  *
  * avg and other ratios are derived at read time from their additive
  * parts (`avg = sum/count`), the standard MV discipline. Distinct
  * counts — non-additive as exact values — become mergeable as
  * `approx_distinct` measures: the view stores a DataSketches HLL sketch
  * per key (binary column), refresh unions delta sketches in
  * (`hll_union_agg`), and [[read]] surfaces the estimate. This is the
  * sketch-rollup pattern that makes "distinct users per day" a summary-
  * table measure instead of a nightly full scan.
  *
  * Tag bookkeeping: each view keeps a monotonic chain of source tags
  * `__mv_<view>_<i>`; refresh diffs the last two. Rewrites of the source
  * degrade the file diff to "everything is new" (same as Iceberg), which
  * double-counts rewritten history — the append-only contract is the
  * documented precondition, matching [[Layout.readBetween]]. */
object Mview {

  final case class Measure(fn: String, column: Option[String], alias: String)

  private def tagPrefix(view: String) = s"__mv_${view}_"

  private def lastTagIndex(spark: SparkSession, source: String, view: String): Int =
    Layout.listSnapshots(spark, source)
      .filter(_.startsWith(tagPrefix(view)))
      .map(_.stripPrefix(tagPrefix(view)).toInt)
      .sorted.lastOption.getOrElse(-1)

  private def aggCols(measures: Seq[Measure]) = measures.map { m =>
    m.fn.toLowerCase match {
      case "count" => count(m.column.map(col).getOrElse(lit(1))).as(m.alias)
      case "sum"   => sum(col(m.column.get)).as(m.alias)
      case "approx_distinct" => hll_sketch_agg(col(m.column.get)).as(m.alias)
      case other => throw new IllegalArgumentException(
        s"non-additive measure fn '$other' — only count/sum/approx_distinct merge; " +
          "derive ratios at read time")
    }
  }

  /** How a measure's PARTIALS merge when re-aggregating two summaries:
    * counts/sums add; sketches union. */
  private def mergeCol(m: Measure) = m.fn.toLowerCase match {
    case "approx_distinct" => hll_union_agg(col(m.alias)).as(m.alias)
    case _                 => sum(col(m.alias)).as(m.alias)
  }

  /** Aggregate `df` by `keys` into the measure columns. */
  private def summarize(df: DataFrame, keys: Seq[String], measures: Seq[Measure]) = {
    val aggs = aggCols(measures)
    df.groupBy(keys.map(col): _*).agg(aggs.head, aggs.tail: _*)
  }

  /** Create view `view` = `source` grouped by `keys` with additive
    * `measures`; materializes the full aggregate once and tags the
    * source's current files as refresh epoch 0. */
  def create(spark: SparkSession, view: String, source: String,
      keys: Seq[String], measures: Seq[Measure]): Unit = {
    summarize(spark.table(source), keys, measures)
      .write.mode("overwrite").saveAsTable(view)
    Layout.snapshot(spark, source, s"${tagPrefix(view)}0")
  }

  /** Fold rows appended to `source` since the last refresh into the view.
    * Cost: one aggregate over the DELTA + one re-aggregate of two
    * summary-sized inputs. No-op (and no new epoch) when nothing was
    * appended. */
  def refresh(spark: SparkSession, view: String, source: String,
      keys: Seq[String], measures: Seq[Measure]): Unit = {
    val last = lastTagIndex(spark, source, view)
    require(last >= 0, s"view $view was never created over $source")
    val nextTag = s"${tagPrefix(view)}${last + 1}"
    Layout.snapshot(spark, source, nextTag)
    val delta = Layout.readBetween(spark, source,
      s"${tagPrefix(view)}$last", nextTag)
    if (delta.isEmpty) return
    mergeInto(spark, view, summarize(delta, keys, measures), keys, measures)
  }

  /** Re-aggregate the stored view with a delta summary: count/sum
    * partials add, sketches union — both inputs summary-sized.
    * `dropWhere` removes groups AFTER the merge (the retraction path's
    * zero-support cleanup). */
  private def mergeInto(spark: SparkSession, view: String,
      deltaSummary: DataFrame, keys: Seq[String],
      measures: Seq[Measure],
      dropWhere: Option[org.apache.spark.sql.Column] = None): Unit = {
    val merged = spark.table(view).unionByName(deltaSummary)
      .groupBy(keys.map(col): _*)
      .agg(mergeCol(measures.head), measures.tail.map(mergeCol): _*)
    // align types: sum(count) widens; cast back to the stored schema
    val stored = spark.table(view).schema
    val aligned = merged.select(stored.map(f => col(f.name).cast(f.dataType).as(f.name)): _*)
    val cleaned = dropWhere.fold(aligned)(c => aligned.where(!c))
    // commit through the format: the view rewrite reads the view itself,
    // and Layout.overwrite materializes to a fresh commit dir before the
    // catalog entry moves
    Layout.overwrite(spark, view, cleaned, operation = "mv-refresh")
  }

  /** Fold a MERGE-ON-READ window into the view — [[refresh]] for sources
    * that advance by CDC upserts/deletes ([[Layout.upsertMor]] /
    * [[Layout.deleteWhereMor]] / the ST13 sink), where the append-only
    * contract does NOT hold: the window carries inserts AND retractions.
    * The classical counting algorithm (Gupta/Mumick/Subrahmanian 1993,
    * "Maintaining views incrementally"): additive measures fold the
    * inserts positively and the retracted rows NEGATIVELY, and a count
    * measure doubles as the group's support — a group whose support
    * reaches zero is DELETED from the view, exactly as a recompute would
    * drop it. Refresh cost: [[Layout.morDeltas]]'s (inserts = added
    * files; retractions = fromTag's visible rows ⋉ broadcast new delete
    * keys) + one re-aggregate of summary-sized inputs.
    *
    * Preconditions, both loud: at least one plain `count` measure (the
    * support column — without it group deletion is undecidable from
    * partials), and no sketch measures (HLL cannot retract; an
    * approx_distinct view under deletes refreshes by recompute). */
  def refreshMor(spark: SparkSession, view: String, source: String,
      keys: Seq[String], measures: Seq[Measure]): Unit = {
    require(measures.forall(_.fn.toLowerCase != "approx_distinct"),
      "sketch measures cannot retract — an approx_distinct view under " +
        "MOR deletes must recompute (or keep the append-only refresh)")
    val support = measures.find(m =>
      m.fn.toLowerCase == "count" && m.column.isEmpty).getOrElse(
      throw new IllegalArgumentException(
        "refreshMor needs a count(*) measure as group support — " +
          "zero-support groups must leave the view"))
    val last = lastTagIndex(spark, source, view)
    require(last >= 0, s"view $view was never created over $source")
    val nextTag = s"${tagPrefix(view)}${last + 1}"
    Layout.snapshot(spark, source, nextTag)
    // Materialize each delta ONCE (r19): the isEmpty probe and the
    // summarize below otherwise each re-execute the delta plan — and the
    // retraction side's plan re-SCANS fromTag's whole visible row set per
    // execution. The checkpointed output is window-sized.
    val (ins0, ret0) = Layout.morDeltas(spark, source,
      s"${tagPrefix(view)}$last", nextTag)
    val ins = ins0.localCheckpoint()
    val ret = ret0.localCheckpoint()
    if (ins.isEmpty && ret.isEmpty) return
    val negated = summarize(ret, keys, measures).select(
      (keys.map(col) ++ measures.map(m => (-col(m.alias)).as(m.alias))): _*)
    mergeInto(spark, view,
      summarize(ins, keys, measures).unionByName(negated), keys, measures,
      dropWhere = Some(col(support.alias) === 0L))
  }

  /** Create view `view` = `srcA ⋈ srcB` (inner equi-join USING
    * `joinKeys`) grouped by `keys` with additive `measures` — the
    * JOIN-view extension of [[create]] (the revenue-by-dimension summary
    * every BI stack maintains over fact ⋈ dimension). Both sources get
    * epoch-0 tags; each keeps its own independent tag chain under the
    * view's prefix. */
  def createJoin(spark: SparkSession, view: String, srcA: String,
      srcB: String, joinKeys: Seq[String], keys: Seq[String],
      measures: Seq[Measure]): Unit = {
    summarize(spark.table(srcA).join(spark.table(srcB), joinKeys),
        keys, measures)
      .write.mode("overwrite").saveAsTable(view)
    Layout.snapshot(spark, srcA, s"${tagPrefix(view)}0")
    Layout.snapshot(spark, srcB, s"${tagPrefix(view)}0")
  }

  /** Fold appends on EITHER side of the join into the view without ever
    * re-joining old against old — the classical delta rule
    * (Blakeley/Larson/Tompa 1986, "Efficiently updating materialized
    * views"):
    *
    *   Δ(A ⋈ B) = ΔA ⋈ B_new  ∪  A_old ⋈ ΔB
    *
    * (ΔA ⋈ B_new absorbs both ΔA⋈B_old and ΔA⋈ΔB, so the union is
    * disjoint-by-construction and exact for append-only sources — the
    * [[refresh]] contract, per side.) Refresh cost: two delta-sized
    * joins + one re-aggregate of two summaries. A_old is the tagged
    * snapshot read ([[Layout.readAt]]) — historical bytes are LISTED,
    * never re-joined against B's history; at 100 TB the nightly cost is
    * (night's A) ⋈ B + A ⋈ (night's B), not A ⋈ B. */
  def refreshJoin(spark: SparkSession, view: String, srcA: String,
      srcB: String, joinKeys: Seq[String], keys: Seq[String],
      measures: Seq[Measure]): Unit = {
    val lastA = lastTagIndex(spark, srcA, view)
    val lastB = lastTagIndex(spark, srcB, view)
    require(lastA >= 0 && lastB >= 0,
      s"view $view was never created over ($srcA, $srcB)")
    val tagA = s"${tagPrefix(view)}${lastA + 1}"
    val tagB = s"${tagPrefix(view)}${lastB + 1}"
    Layout.snapshot(spark, srcA, tagA)
    Layout.snapshot(spark, srcB, tagB)
    val dA = Layout.readBetween(spark, srcA, s"${tagPrefix(view)}$lastA", tagA)
    val dB = Layout.readBetween(spark, srcB, s"${tagPrefix(view)}$lastB", tagB)
    val aEmpty = dA.isEmpty
    val bEmpty = dB.isEmpty
    if (aEmpty && bEmpty) return
    val aOld = Layout.readAt(spark, srcA, s"${tagPrefix(view)}$lastA")
    val bNew = Layout.readAt(spark, srcB, tagB)
    val deltaJoin =
      if (bEmpty) dA.join(bNew, joinKeys)
      else if (aEmpty) aOld.join(dB, joinKeys)
      else dA.join(bNew, joinKeys).unionByName(aOld.join(dB, joinKeys))
    mergeInto(spark, view, summarize(deltaJoin, keys, measures),
      keys, measures)
  }

  /** [[summarize]] over a SIGNED delta: rows carry `__sgn` (+1 insert /
    * −1 retraction) and every additive partial folds with its sign —
    * count(*) → Σ sgn, count(c) → Σ sgn·[c≠null], sum(c) → Σ sgn·c.
    * This is the counting algorithm's aggregation step applied to a
    * join delta, where negation must ride PER ROW (a retraction can
    * join several dimension rows) rather than per summary as in
    * [[refreshMor]]'s append-source case. */
  private def summarizeSigned(df: DataFrame, keys: Seq[String],
      measures: Seq[Measure]) = {
    val aggs = measures.map { m =>
      m.fn.toLowerCase match {
        case "count" => sum(m.column
          .map(c => when(col(c).isNotNull, col("__sgn")).otherwise(lit(0L)))
          .getOrElse(col("__sgn"))).as(m.alias)
        case "sum" => sum(col("__sgn") * col(m.column.get)).as(m.alias)
        case other => throw new IllegalArgumentException(
          s"non-additive measure fn '$other' cannot fold a signed delta")
      }
    }
    df.groupBy(keys.map(col): _*).agg(aggs.head, aggs.tail: _*)
  }

  /** [[refreshJoin]] for sources that advance by CDC upserts/deletes —
    * the fact table maintained by [[Layout.upsertMor]]/the ST13 sink
    * feeding a join view. Each side's window comes from
    * [[Layout.morDeltas]] as (inserts, retractions) and folds as a
    * SIGNED delta through the exact join identity
    *
    *   A′⋈B′ − A⋈B = ΔA ⋈ B_new + A_old ⋈ ΔB
    *
    * (ΔA, ΔB signed; B_new = B_old ⊎ insB ∖ retB absorbs the ΔA⋈ΔB
    * cross term — the [[refreshJoin]] decomposition, now valid under
    * retraction because the joined row's sign rides along: a retracted
    * fact row joins the CURRENT dimension state and SUBTRACTS exactly
    * the partials its insert once added, per the counting rule
    * (Gupta/Mumick/Subrahmanian 1993). Both sides may be MOR sources;
    * an append-only side simply yields an empty retraction half.
    * Refresh cost: two delta-sized joins + one summary-sized
    * re-aggregate — historical A never re-joins historical B.
    *
    * Same loud preconditions as [[refreshMor]]: a count(*) support
    * measure (zero-support groups leave the view) and no sketch
    * measures (HLL cannot retract). */
  def refreshJoinMor(spark: SparkSession, view: String, srcA: String,
      srcB: String, joinKeys: Seq[String], keys: Seq[String],
      measures: Seq[Measure]): Unit = {
    require(measures.forall(_.fn.toLowerCase != "approx_distinct"),
      "sketch measures cannot retract — an approx_distinct join view " +
        "under MOR deletes must recompute (or keep refreshJoin's " +
        "append-only contract)")
    val support = measures.find(m =>
      m.fn.toLowerCase == "count" && m.column.isEmpty).getOrElse(
      throw new IllegalArgumentException(
        "refreshJoinMor needs a count(*) measure as group support — " +
          "zero-support groups must leave the view"))
    val lastA = lastTagIndex(spark, srcA, view)
    val lastB = lastTagIndex(spark, srcB, view)
    require(lastA >= 0 && lastB >= 0,
      s"view $view was never created over ($srcA, $srcB)")
    val oldTagA = s"${tagPrefix(view)}$lastA"
    val oldTagB = s"${tagPrefix(view)}$lastB"
    val tagA = s"${tagPrefix(view)}${lastA + 1}"
    val tagB = s"${tagPrefix(view)}${lastB + 1}"
    Layout.snapshot(spark, srcA, tagA)
    Layout.snapshot(spark, srcB, tagB)
    // one execution per delta (the refreshMor note): isEmpty + the signed
    // fold below otherwise re-run each delta plan, re-scanning fromTag's
    // visible rows on the retraction sides
    val (insA0, retA0) = Layout.morDeltas(spark, srcA, oldTagA, tagA)
    val (insB0, retB0) = Layout.morDeltas(spark, srcB, oldTagB, tagB)
    val insA = insA0.localCheckpoint(); val retA = retA0.localCheckpoint()
    val insB = insB0.localCheckpoint(); val retB = retB0.localCheckpoint()
    val dA = insA.withColumn("__sgn", lit(1L))
      .unionByName(retA.withColumn("__sgn", lit(-1L)))
    val dB = insB.withColumn("__sgn", lit(1L))
      .unionByName(retB.withColumn("__sgn", lit(-1L)))
    val aSide = !(insA.isEmpty && retA.isEmpty)
    val bSide = !(insB.isEmpty && retB.isEmpty)
    if (!aSide && !bSide) return
    val parts = Seq(
      if (aSide) Some(dA.join(Layout.readAt(spark, srcB, tagB), joinKeys))
      else None,
      if (bSide) Some(Layout.readAt(spark, srcA, oldTagA).join(dB, joinKeys))
      else None).flatten
    mergeInto(spark, view,
      summarizeSigned(parts.reduce(_ unionByName _), keys, measures),
      keys, measures, dropWhere = Some(col(support.alias) === 0L))
  }

  /** Read surface: additive measures come back as stored; sketch measures
    * surface as their cardinality ESTIMATE under the same alias — the
    * binary sketch never leaks to consumers. */
  def read(spark: SparkSession, view: String, keys: Seq[String],
      measures: Seq[Measure]): DataFrame =
    spark.table(view).select(keys.map(col) ++ measures.map { m =>
      m.fn.toLowerCase match {
        case "approx_distinct" => hll_sketch_estimate(col(m.alias)).as(m.alias)
        case _                 => col(m.alias)
      }
    }: _*)
}
