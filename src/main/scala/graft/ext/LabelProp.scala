package graft.ext

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Label-propagation community detection (Raghavan, Albert & Kumara
  * 2007) — the community operator beside [[Clustering]]'s connected
  * components: CC answers "is there any path", LPA answers "which
  * DENSELY-linked region does this node sit in", splitting a connected
  * graph into its communities. In a training-data pipeline this is the
  * site/domain-cluster primitive (mirror farms and template families
  * form tight link communities long before they are literal duplicates)
  * and the basket-segmentation view of the purchase graph.
  *
  * == Determinism (the q195 discipline) ==
  *
  * Classic LPA is run-order-dependent (asynchronous updates, random tie
  * breaks) — useless for a hash-gated engine. This is the SYNCHRONOUS
  * variant with a total tie order: every node starts labeled by its own
  * id; each round every node adopts the label with the highest neighbor
  * count, ties to the SMALLEST label; a node with no in-neighbors keeps
  * its label. Pure integer/label arithmetic, no floats, no randomness:
  * the assignment after R rounds is a pure function of the edge set, so
  * the DuckDB twin (unrolled CTE, one block per round) reproduces it
  * bit-for-bit. Synchronous LPA can two-cycle on bipartite-ish regions —
  * standard for the variant; a FIXED round count R is part of the
  * declared semantics (the oracle unrolls exactly R blocks).
  *
  * == 100 TB design ==
  *
  * Each round is the PageRank exchange pattern: the N-row label table
  * hashes to the edge partitioning for the src join, the (dst, label)
  * counts partial-aggregate map-side before one slim exchange, and the
  * per-dst argmax is `max_by(label, (count, -label))` — an aggregate,
  * not a window, so no extra sort; both aggregations hash on the same
  * dst key. Per-round lazy localCheckpoint truncates lineage. Hub skew
  * concentrates one dst key; partial aggregation absorbs the (dst,
  * label)-count fan-in map-side. Driver state: zero rows.
  */
object LabelProp {

  /** Community label per node of the directed edge list after `rounds`
    * synchronous updates (run an undirected graph as both directions).
    * Output: (id, community). */
  def run(edges: DataFrame, srcCol: String, dstCol: String,
      rounds: Int, broadcastNodeLimit: Long = 20000000L): DataFrame = {
    require(rounds >= 1, "rounds must be >= 1")
    // Materialize the caller's edge plan ONCE (the r18 PageRank fix): the
    // nodes checkpoint and the edge working set used to execute the
    // upstream graph build independently — two full runs of an arbitrarily
    // expensive plan. Derive both from one cached copy.
    val edgesRaw = edges.select(col(srcCol).as("src"), col(dstCol).as("dst"))
      .localCheckpoint()
    val nodes = edgesRaw.select(col("src").as("id"))
      .union(edgesRaw.select(col("dst").as("id")))
      .distinct()
      .localCheckpoint()

    var labels = nodes.withColumn("lab", col("id"))
    // Broadcast the N-row label side of both per-round joins when the
    // node set is bounded (the PageRank/kCore broadcastNodeLimit pattern,
    // r18): the checkpointed edge table then never crosses an exchange —
    // it was being RE-EXCHANGED every round (~124 MB per gate query).
    // Label arithmetic is exact integers; partitioning cannot change it.
    val bcast = nodes.count() <= broadcastNodeLimit
    def side(df: DataFrame) = if (bcast) broadcast(df) else df
    // In the broadcast regime, store the edge blocks HASH-PARTITIONED BY
    // dst (r19, VERDICT r18 #4): the broadcast src-join preserves the
    // stored partitioning, and HashPartitioning(dst) satisfies BOTH
    // downstream aggregations' distributions — the (dst, lab) count AND
    // the per-dst argmax — so every per-round exchange disappears. The
    // (dst, label) pair stream is near-unique (neighbor-label combos ≈
    // edge count), which defeated the partial agg and shuffled ~19 MB per
    // round. Cost: one edge-sized exchange at the head, amortized over
    // all rounds. repartitionCheckpoint (not plain localCheckpoint):
    // Spark 4.x checkpoints drop the partitioning to Unknown, which would
    // silently re-insert the per-round exchange. In the shuffle regime
    // the per-round src join re-exchanges the edges anyway, so the head
    // repartition buys nothing and is skipped.
    val edgesW = if (bcast)
      org.apache.spark.sql.graft.CheckpointOps
        .repartitionCheckpoint(edgesRaw, "dst")
    else edgesRaw
    for (_ <- 1 to rounds) {
      val mode = edgesW
        .join(side(labels.select(col("id").as("src"), col("lab"))), "src")
        .groupBy(col("dst"), col("lab"))
        .agg(count(lit(1)).as("c"))
        // argmax by (count DESC, label ASC): maximize (c, -lab)
        .groupBy(col("dst"))
        .agg(max_by(col("lab"), struct(col("c"), (-col("lab")).as("nl")))
          .as("nlab"))
        .withColumnRenamed("dst", "id")
      labels = labels.join(side(mode), Seq("id"), "left")
        .select(col("id"), coalesce(col("nlab"), col("lab")).as("lab"))
        .localCheckpoint(eager = false)
    }
    labels.select(col("id"), col("lab").as("community"))
  }
}
