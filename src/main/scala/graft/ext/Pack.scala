package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Sequence packing — lay documents end-to-end and cut fixed-size token
  * sequences, the step that turns a cleaned corpus into training batches.
  * Two formulations, matching the two packing disciplines in use:
  *
  *  1. [[chunkAssign]] — concat-and-cut (GPT-style pretraining): the
  *     group's token stream is cut every `capacity` tokens and a document
  *     may span a sequence boundary. Pure per-group window cumsum — one
  *     shuffle on the group key, arbitrarily large groups, no collected
  *     state. This is the 100 TB path.
  *  2. [[packGreedy]] — greedy no-split bin packing (SFT-style: examples
  *     must not be cut): first-fit-in-order via a per-group
  *     `aggregate` fold over the collected doc list. The fold is a true
  *     sequential recurrence (each bin boundary depends on every prior
  *     size), so the group IS the unit of parallelism: groups must be
  *     bounded output shards (e.g. hash-sharded upstream), which is how
  *     packing runs in practice — per output file, not per corpus.
  */
object Pack {

  /** Per-doc sequence-span assignment. Adds to each row:
    *  - `tok_start`: 0-based offset of the doc in its group's token stream
    *  - `seq_first` / `seq_last`: ids of the capacity-token sequences the
    *    doc's first/last token land in (equal unless the doc spans a cut).
    *
    * Rows with `sizeCol` ≤ 0 must be filtered upstream (an empty doc has
    * no tokens to land anywhere). `orderCol` must be unique per group for
    * a deterministic stream.
    *
    * `shards`: groups here are few and fat (languages, sources), so the
    * running total goes through [[PrefixSum.exclusive]]'s two-level scan —
    * parallelism = shards, not #groups; 0 falls back to the plain
    * per-group window (identical values either way). */
  def chunkAssign(df: DataFrame, groupCol: String, orderCol: String,
      sizeCol: String, capacity: Long, shards: Int = 0): DataFrame = {
    require(capacity > 0, "capacity must be positive")
    PrefixSum.exclusive(df, groupCol, Seq(orderCol), sizeCol, "tok_start", shards)
      .withColumn("seq_first", floor(col("tok_start") / capacity))
      .withColumn("seq_last",
        floor((col("tok_start") + col(sizeCol) - 1) / capacity))
  }

  /** Greedy no-split packing: docs in `orderCol` order go into the current
    * bin while they fit; a doc that would overflow starts the next bin. A
    * doc larger than `capacity` gets a bin of its own (bins never split a
    * doc). Output: (groupCol, orderCol, sizeCol, bin) — bin ids dense from
    * 0 within each group. */
  def packGreedy(df: DataFrame, groupCol: String, orderCol: String,
      sizeCol: String, capacity: Long): DataFrame = {
    require(capacity > 0, "capacity must be positive")
    val items = df.groupBy(col(groupCol))
      .agg(sort_array(collect_list(struct(
        col(orderCol).as("ord"), col(sizeCol).cast("long").as("sz")))).as("__items"))
    // Fold state: (current bin, its fill, bin id per doc so far). The
    // state array grows to the group size — the documented shard bound.
    val init: Column = struct(lit(0L).as("bin"), lit(0L).as("fill"),
      array().cast("array<bigint>").as("out"))
    val folded = items.withColumn("__st",
      aggregate(col("__items"), init, (st, e) => {
        val overflow = st.getField("fill") > 0 &&
          st.getField("fill") + e.getField("sz") > capacity
        val bin = when(overflow, st.getField("bin") + 1L).otherwise(st.getField("bin"))
        val fill = when(overflow, e.getField("sz"))
          .otherwise(st.getField("fill") + e.getField("sz"))
        struct(bin.as("bin"), fill.as("fill"),
          concat(st.getField("out"), array(bin)).as("out"))
      }))
    folded.select(col(groupCol), posexplode(col("__items")).as(Seq("__i", "__e")),
        col("__st").getField("out").as("__bins"))
      .select(col(groupCol), col("__e").getField("ord").as(orderCol),
        col("__e").getField("sz").as(sizeCol),
        element_at(col("__bins"), col("__i") + 1).as("bin"))
  }
}
