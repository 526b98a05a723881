package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Deterministic dataset splitting / sampling — the train/val/test
  * primitive of a training-data pipeline.
  *
  * Assignment is a pure function of the key column (never `rand()`):
  * re-running the pipeline, adding columns, or re-partitioning can never
  * move a document between splits — the property that keeps eval sets
  * uncontaminated across pipeline versions. Two hash modes:
  *
  *   - `xxhash64` (default): codegen'd, uniform, the production path.
  *   - portable md5-prefix mode: the first 8 hex chars of md5(key) are
  *     uniform in [0, 2^32), and lowercase-hex STRING comparison equals
  *     numeric comparison ('0'<'9'<'a'<'f' in ASCII) — so fraction
  *     thresholds become plain string literals any engine evaluates
  *     identically (the DuckDB oracle twin for q43 uses this).
  *
  * Scale: a narrow map — no shuffle, no sampling pass, no driver state.
  */
object Splits {

  /** Bucket in [0, buckets) from xxhash64 of the key (production mode). */
  def hashBucket(key: Column, buckets: Int, seed: Int = 42): Column =
    pmod(xxhash64(key, lit(seed)), lit(buckets))

  /** First 8 hex chars of md5(key) — the portable uniform draw. */
  def md5Prefix(key: Column): Column =
    substring(md5(key.cast("string")), 1, 8)

  /** 8-char lowercase-hex threshold for a cumulative fraction in [0,1]. */
  def hexThreshold(fraction: Double): String =
    f"${math.min((fraction * 4294967296.0).toLong, 4294967295L)}%08x"

  /** Deterministic training order: a seeded pseudo-random permutation of
    * the corpus plus a round-robin shard assignment over it — the "global
    * shuffle" every training run needs, as a pure plan (no rand(): the
    * same seed gives the same order on any cluster size, any retry). The
    * draw key is the portable md5 prefix salted with the seed so distinct
    * seeds give independent permutations; position comes from a
    * shard-keyed window AFTER the shard split, so no global sort ranks
    * the full corpus through one task — each shard orders its own slice
    * (the property that matters when "the corpus" is 100 TB and shards
    * feed 1000 data-loader workers). Within-shard order is by draw;
    * global position is recoverable as pos_in_shard * nShards + shard. */
  def trainingOrder(df: DataFrame, keyCol: String, nShards: Int,
      seed: Int = 42, out: String = "shard"): DataFrame = {
    require(nShards > 0, "nShards must be positive")
    val draw = md5(concat(lit(seed.toString), lit(":"), col(keyCol).cast("string")))
    // shard from an md5 hex slice DISJOINT from the ordering prefix —
    // portable (DuckDB: ('0x'||substring(md5,9,4))::BIGINT), and shard ⊥
    // within-shard order because md5 bytes are independent
    val withShard = df.withColumn("__draw", draw)
      .withColumn(out,
        pmod(conv(substring(col("__draw"), 9, 4), 16, 10).cast("long"),
          lit(nShards)).cast("int"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col(out)).orderBy(col("__draw"), col(keyCol))
    withShard
      .withColumn("pos_in_shard", row_number().over(w) - 1)
      .drop("__draw")
  }

  /** Assign a split label by weight list, e.g. Seq(("train",8),("val",1),
    * ("test",1)) — weights are shares of their sum. */
  def assign(df: DataFrame, keyCol: String, weights: Seq[(String, Int)],
      out: String = "split", portable: Boolean = false): DataFrame = {
    require(weights.nonEmpty && weights.forall(_._2 > 0), "weights must be positive")
    val total = weights.map(_._2).sum.toDouble
    val cum = weights.scanLeft(0) { case (acc, (_, w)) => acc + w }.tail
    val label =
      if (portable) {
        val draw = md5Prefix(col(keyCol))
        weights.zip(cum).init.foldRight(lit(weights.last._1): Column) {
          case (((name, _), c), otherwise) =>
            when(draw < lit(hexThreshold(c / total)), lit(name)).otherwise(otherwise)
        }
      } else {
        val bucket = hashBucket(col(keyCol), weights.map(_._2).sum)
        weights.zip(cum).init.foldRight(lit(weights.last._1): Column) {
          case (((name, _), c), otherwise) =>
            when(bucket < c, lit(name)).otherwise(otherwise)
        }
      }
    df.withColumn(out, label)
  }

  /** Deterministic fraction sample — the no-shuffle, re-runnable corpus
    * sampler (portable mode shares the md5 draw with [[assign]]). */
  def sampleByKey(df: DataFrame, keyCol: String, frac: Double,
      portable: Boolean = false): DataFrame =
    if (portable) df.filter(md5Prefix(col(keyCol)) < lit(hexThreshold(frac)))
    else df.filter(hashBucket(col(keyCol), 1000000) < (frac * 1000000).toLong)

  /** Token-budget corpus mixing: within each stratum, take documents in
    * deterministic hash order until the stratum's size budget is reached —
    * the "mix 30% code, 5% wiki, hit exactly N tokens" primitive, where
    * targets are *token counts*, not row fractions ([[stratifiedSample]]
    * is the row-fraction form).
    *
    * A doc is kept iff it *starts* inside the budget (running total of
    * preceding docs < budget), so each stratum overshoots by at most one
    * document — the standard greedy cut. Strata absent from `budgets` are
    * dropped. Determinism: the hash draw orders docs (key as tie-break),
    * so re-runs and re-partitions keep the identical set.
    *
    * Scale: the running total is [[PrefixSum.exclusive]] — `shards > 0`
    * runs the two-level scan (parallelism = shards, never one task per
    * stratum; language-grade strata are few and fat), 0 the plain
    * per-stratum window. No collect, no second pass either way. */
  def budgetSample(df: DataFrame, strataCol: String, keyCol: String,
      sizeCol: String, budgets: Map[String, Long],
      portable: Boolean = false, shards: Int = 0): DataFrame = {
    require(budgets.nonEmpty, "budgets must be non-empty")
    val draw = if (portable) md5Prefix(col(keyCol))
      else hex(xxhash64(col(keyCol), lit(42)))
    val budget = budgets.toSeq.sortBy(_._1)
      .foldRight(lit(null).cast("long")) { case ((stratum, b), otherwise) =>
        when(col(strataCol) === lit(stratum), lit(b)).otherwise(otherwise)
      }
    PrefixSum.exclusive(
        df.filter(budget.isNotNull).withColumn("__draw", draw),
        strataCol, Seq("__draw", keyCol), sizeCol, "__before", shards)
      .filter(col("__before") < budget)
      .drop("__draw", "__before")
  }

  /** Temperature-scaled source mixing — the GPT-3/PaLM-style data-mix
    * op: sampling share of source s ∝ n_s^τ (τ < 1 flattens the natural
    * distribution toward uniform, upweighting small high-quality sources;
    * τ = 1 is proportional, τ = 0 uniform). Targets apportion a fixed
    * total by the largest-remainder method (Hamilton) so they sum to
    * EXACTLY `total`, then each source keeps its `target` smallest
    * md5-draw docs — a pure function of the corpus, no rand().
    *
    * Scale shape: the share/target table is k source rows (one tiny
    * aggregate + a k-row window); per-source selection ranks by the draw
    * through [[PrefixSum.exclusive]]'s two-level scan — `shards > 0`
    * avoids the one-task-per-source window when sources are few and fat
    * (the 100 TB case). Float discipline: shares and remainders are
    * rounded to 6 places before any comparison so rank order is
    * engine-stable (the documented log/exp rounding rule).
    *
    * Output: the selected (strataCol, keyCol) rows. */
  def temperatureMix(df: DataFrame, strataCol: String, keyCol: String,
      total: Long, tau: Double, shards: Int = 0): DataFrame = {
    val counts = df.groupBy(col(strataCol)).agg(count(lit(1)).as("__n"))
    val wSrc = Window.orderBy(col(strataCol))
    // k-row plan: weights, shares, floor targets, largest-remainder top-up
    val targets = counts
      .withColumn("__w", pow(col("__n").cast("double"), lit(tau)))
      .withColumn("__p", col("__w") / sum(col("__w")).over(
        wSrc.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)))
      .withColumn("__x", round(col("__p") * total, 6))
      .withColumn("__base", floor(col("__x")))
      .withColumn("__rem", round(col("__x") - col("__base"), 6))
      .withColumn("__rr", row_number().over(
        Window.orderBy(col("__rem").desc, col(strataCol))))
      .withColumn("__short", (lit(total) - sum(col("__base")).over(
        wSrc.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)))
        .cast("long"))
      .select(col(strataCol),
        (col("__base") + when(col("__rr") <= col("__short"), 1L).otherwise(0L))
          .cast("long").as("__target"))
    // A source smaller than its (τ-upweighted) target contributes all
    // its docs — undershoot, never replacement; epoch-style upsampling
    // is the caller's loop, not a hidden row duplication here.
    val ranked = PrefixSum.exclusive(
      df.select(col(strataCol), col(keyCol))
        .withColumn("__draw", md5Prefix(col(keyCol)))
        .withColumn("__one", lit(1L)),
      strataCol, Seq("__draw", keyCol), "__one", "__rank", shards)
    ranked.join(broadcast(targets), Seq(strataCol))
      .filter(col("__rank") < col("__target"))
      .select(col(strataCol), col(keyCol))
  }

  /** Stratified deterministic sample: a per-stratum fraction, as a pure
    * function of the key (same md5/xxhash draw as [[sampleByKey]] — still a
    * narrow map, no shuffle, no per-stratum second pass). Strata absent
    * from `fractions` are dropped; this is the "rebalance the language mix"
    * / "downsample the dominant source" primitive. */
  def stratifiedSample(df: DataFrame, strataCol: String, keyCol: String,
      fractions: Map[String, Double], portable: Boolean = false): DataFrame = {
    require(fractions.nonEmpty, "fractions must be non-empty")
    val keep = fractions.toSeq.sortBy(_._1).map { case (stratum, frac) =>
      val inStratum = col(strataCol) === lit(stratum)
      if (portable) inStratum && md5Prefix(col(keyCol)) < lit(hexThreshold(frac))
      else inStratum && hashBucket(col(keyCol), 1000000) < (frac * 1000000).toLong
    }.reduce(_ || _)
    df.filter(keep)
  }
}
