package graft.ext

import java.nio.charset.StandardCharsets.UTF_8
import java.security.MessageDigest
import java.util.concurrent.ConcurrentHashMap

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Shard-parallel HNSW — the graph-based ANN family (Malkov & Yashunin
  * 2016, "Efficient and robust approximate nearest neighbor search using
  * Hierarchical Navigable Small World graphs") the engine's index
  * inventory lacked: LSH (N2/N11) buckets, IVF (N8) partitions, PQ (N9)
  * compresses — HNSW navigates, and it is the recall/latency frontier
  * every serving stack (FAISS/Vespa/Milvus) reaches for first.
  *
  * == Why shards, and why this is the honest 100 TB shape ==
  *
  * HNSW construction is inherently sequential (every insert greedily
  * descends the graph built so far) and the graph lives in memory — it
  * CANNOT be a corpus-wide Spark dataflow. Production vector stores
  * solve this exactly one way: partition the corpus into shards, build
  * an independent in-memory graph per shard, scatter each query to all
  * shards and gather per-shard top-k into a global top-k. That topology
  * maps 1:1 onto Spark: shard = `pmod(id, S)`, per-shard build inside
  * `mapPartitions` (the justified per-partition-imperative class — same
  * charter as the BPE/Viterbi/Misra–Gries encoders), graph rows to a
  * parquet table clustered by shard (IndexStore kind=hnsw), search =
  * per-shard beam searches + one slim (probe, id, sim) stream into a
  * global top-k window. Per-task memory is one shard's graph+vectors —
  * bounded by the shard size the partitioner chose, never by the corpus.
  *
  * == Determinism (what makes the gate hash-stable) ==
  *
  * Every stochastic choice is a portable md5 draw: node level =
  * floor(−ln(U)·mL) with U = (md5_32("hnsw:" + id) + 0.5)/2³², inserts
  * in ascending id order, all heaps tie-break on id — the graph, and
  * therefore every search result, is a pure function of (corpus, shards,
  * params) on any cluster and any partitioning.
  *
  * Distances are cosine (1 − cos), matching the rest of the ANN family;
  * candidate quality is gated by the same [[Similarity.recallContract]]
  * as q30/q177/q187.
  */
object Hnsw {

  /** M = max neighbors per node per level (2M at level 0, the paper's
    * Mmax0 convention); efC/efS = construction/search beam widths. */
  final case class Params(m: Int = 8, efConstruction: Int = 64,
      efSearch: Int = 32)

  private def md5U32(s: String): Long = {
    val d = MessageDigest.getInstance("MD5").digest(s.getBytes(UTF_8))
    ((d(0) & 0xffL) << 24) | ((d(1) & 0xffL) << 16) |
      ((d(2) & 0xffL) << 8) | (d(3) & 0xffL)
  }

  /** Deterministic HNSW level for a node id: floor(−ln(U)·mL). */
  private[ext] def levelOf(id: Long, m: Int): Int = {
    val u = (md5U32("hnsw:" + id) + 0.5) / 4294967296.0
    val mL = 1.0 / math.log(m.toDouble)
    math.floor(-math.log(u) * mL).toInt
  }

  private def cosSim(a: Array[Float], b: Array[Float]): Double = {
    var dot = 0.0; var na = 0.0; var nb = 0.0; var i = 0
    while (i < a.length) {
      dot += a(i).toDouble * b(i); na += a(i).toDouble * a(i)
      nb += b(i).toDouble * b(i); i += 1
    }
    if (na == 0 || nb == 0) 0.0 else dot / math.sqrt(na * nb)
  }

  /** One shard's graph under construction / being searched. Node arrays
    * are indexed by insertion slot; `levels(slot)(l)` = neighbor slots at
    * level l, kept in CANONICAL id-ascending order at every mutation —
    * beam exploration admits/rejects against an evolving result heap, so
    * neighbor ITERATION order is observable under distance ties
    * (duplicate vectors, the normal dedup-corpus shape); id-sorted lists
    * everywhere make every traversal a pure function of the adjacency
    * sets, which is what lets an append into a stored (id-sorted) graph
    * reproduce a from-scratch build bit-for-bit even with ties. */
  private final class ShardGraph(params: Params) {
    val ids = scala.collection.mutable.ArrayBuffer.empty[Long]
    val vecs = scala.collection.mutable.ArrayBuffer.empty[Array[Float]]
    val levels = scala.collection.mutable.ArrayBuffer
      .empty[Array[scala.collection.mutable.ArrayBuffer[Int]]]
    var entry: Int = -1 // slot of the current entry point
    var entryLevel: Int = -1

    private def dist(slot: Int, q: Array[Float]): Double =
      1.0 - cosSim(vecs(slot), q)

    /** Insert `slot` into `buf` keeping id-ascending order (lists are
      * ≤ 2M long — linear shift is nothing). */
    private def insSorted(
        buf: scala.collection.mutable.ArrayBuffer[Int], slot: Int): Unit = {
      var i = buf.length
      while (i > 0 && ids(buf(i - 1)) > ids(slot)) i -= 1
      buf.insert(i, slot)
    }

    /** Beam search at one level; returns (dist, slot) ascending, ≤ ef. */
    def searchLayer(q: Array[Float], eps: Seq[Int], ef: Int, level: Int):
        Seq[(Double, Int)] = {
      // tie-break on id so the result is a pure function of the graph
      implicit val ord: Ordering[(Double, Int)] =
        Ordering.by { case (d, s) => (d, ids(s)) }
      val visited = scala.collection.mutable.HashSet.empty[Int]
      val cand = scala.collection.mutable.PriorityQueue // min-heap by dist
        .empty[(Double, Int)](ord.reverse)
      val res = scala.collection.mutable.PriorityQueue // max-heap by dist
        .empty[(Double, Int)](ord)
      eps.foreach { ep =>
        if (visited.add(ep)) { val d = dist(ep, q); cand.enqueue((d, ep)); res.enqueue((d, ep)) }
      }
      while (cand.nonEmpty) {
        val (dc, c) = cand.dequeue()
        if (res.nonEmpty && dc > res.head._1 && res.size >= ef) {
          cand.clear() // every remaining candidate is farther: done
        } else {
          val nbrs = levels(c)
          if (level < nbrs.length) nbrs(level).foreach { n =>
            if (visited.add(n)) {
              val dn = dist(n, q)
              if (res.size < ef || dn < res.head._1 ||
                  (dn == res.head._1 && ids(n) < ids(res.head._2))) {
                cand.enqueue((dn, n))
                res.enqueue((dn, n))
                if (res.size > ef) res.dequeue()
              }
            }
          }
        }
      }
      res.toSeq.sorted
    }

    /** Insert in ascending-id order; deterministic level from the id. */
    def insert(id: Long, vec: Array[Float], params: Params): Unit = {
      val slot = ids.length
      val l = levelOf(id, params.m)
      ids += id
      vecs += vec
      levels += Array.fill(l + 1)(scala.collection.mutable.ArrayBuffer.empty[Int])
      if (entry < 0) { entry = slot; entryLevel = l; return }
      var eps = Seq(entry)
      // greedy 1-NN descent through the levels above the new node's
      var lc = entryLevel
      while (lc > l) {
        eps = Seq(searchLayer(vec, eps, 1, lc).head._2)
        lc -= 1
      }
      // beam + connect from min(l, entryLevel) down to 0
      lc = math.min(l, entryLevel)
      while (lc >= 0) {
        val w = searchLayer(vec, eps, params.efConstruction, lc)
        val mMax = if (lc == 0) 2 * params.m else params.m
        val selected = w.take(params.m).map(_._2)
        selected.foreach { n =>
          insSorted(levels(slot)(lc), n)
          insSorted(levels(n)(lc), slot)
          if (levels(n)(lc).length > mMax) {
            // shrink to the mMax closest (simple heuristic, paper §4 alg 3),
            // then back to canonical id order
            val kept = levels(n)(lc)
              .map(s => (dist(s, vecs(n)), s))
              .sorted(Ordering.by[(Double, Int), (Double, Long)] {
                case (d, s) => (d, ids(s)) })
              .take(mMax).map(_._2)
              .sorted(Ordering.by[Int, Long](ids(_)))
            levels(n)(lc).clear()
            levels(n)(lc) ++= kept
          }
        }
        eps = w.map(_._2)
        lc -= 1
      }
      if (l > entryLevel) { entry = slot; entryLevel = l }
    }

    /** Top-k (cosine-similarity desc, id asc) for one probe, excluding
      * `exclude`. */
    def topK(q: Array[Float], k: Int, exclude: Long): Seq[(Long, Double)] = {
      if (entry < 0) return Nil
      var eps = Seq(entry)
      var lc = entryLevel
      while (lc > 0) { eps = Seq(searchLayer(q, eps, 1, lc).head._2); lc -= 1 }
      searchLayer(q, eps, math.max(params.efSearch, k + 1), 0)
        .iterator.map { case (d, s) => (ids(s), 1.0 - d) }
        .filter(_._1 != exclude)
        .toSeq.sortBy { case (id, sim) => (-sim, id) }
        .take(k)
    }
  }

  private val graphSchema = StructType(Seq(
    StructField("shard_id", IntegerType, nullable = false),
    StructField("id", LongType, nullable = false),
    StructField("vec", ArrayType(FloatType, containsNull = false), nullable = false),
    StructField("levels", ArrayType(ArrayType(LongType, containsNull = false),
      containsNull = false), nullable = false)))

  /** Stored-row payload: (id, vec, per-level neighbor ids). */
  private type StoredNode = (Long, Array[Float], Array[Array[Long]])

  /** Emit one shard's graph as [[graphSchema]] rows — LAZILY: the caller
    * chains these per-shard iterators, so task memory holds one shard's
    * graph while its rows stream out, never the partition's whole
    * output (the round-9 advisor item: the previous ArrayBuffer
    * accumulation made per-task memory O(partition), not O(shard)). */
  private def emitRows(shard: Int, g: ShardGraph): Iterator[Row] =
    Iterator.range(0, g.ids.length).map { s =>
      Row(shard, g.ids(s), g.vecs(s).toIndexedSeq,
        g.levels(s).map(_.map(n => g.ids(n)).toIndexedSeq.sorted).toIndexedSeq)
    }

  /** Rebuild one shard's in-memory graph EXACTLY as stored: slots in row
    * order (id order for stored rows), neighbor ids remapped to slots,
    * entry = first max-level slot — derived, not stored. */
  private def rebuildShard(batch: collection.IndexedSeq[StoredNode],
      params: Params): ShardGraph = {
    val slotOf = batch.iterator.map(_._1).zipWithIndex.toMap
    val g = new ShardGraph(params)
    batch.foreach { case (id, v, _) =>
      g.ids += id; g.vecs += v; g.levels += Array.empty
    }
    var s = 0
    while (s < batch.length) {
      g.levels(s) = batch(s)._3.map(ns =>
        scala.collection.mutable.ArrayBuffer(ns.map(slotOf): _*))
      s += 1
    }
    if (batch.nonEmpty) {
      var best = 0
      s = 1
      while (s < batch.length) {
        if (g.levels(s).length > g.levels(best).length) best = s
        s += 1
      }
      g.entry = best
      g.entryLevel = g.levels(best).length - 1
    }
    g
  }

  /** Build the per-shard graphs: one corpus pass, shard = pmod(id, S),
    * each shard constructed independently inside its partition (shards
    * hash across exactly `shards` tasks — no cap; a task that receives
    * several shards still holds ONE at a time, because each shard's rows
    * stream out through [[emitRows]] before the next shard's input is
    * read). Output rows (shard_id, id, vec, levels) — `levels(l)` =
    * neighbor IDS at level l — are the durable index
    * ([[IndexStore.writeHnsw]]). */
  def build(corpus: DataFrame, idCol: String, vecCol: String,
      shards: Int, params: Params = Params()): DataFrame = {
    require(shards >= 1, "shards must be >= 1")
    val spark = corpus.sparkSession
    val prepped = corpus
      .select(pmod(col(idCol), lit(shards.toLong)).cast("int").as("shard_id"),
        col(idCol).cast("long").as("id"),
        col(vecCol).cast("array<float>").as("vec"))
      .repartition(shards, col("shard_id"))
      .sortWithinPartitions("shard_id", "id")
    val rows = prepped.queryExecution.toRdd.mapPartitions { iter =>
      val it = iter.buffered
      new Iterator[Iterator[Row]] {
        def hasNext: Boolean = it.hasNext
        def next(): Iterator[Row] = {
          val shard = it.head.getInt(0)
          val g = new ShardGraph(params)
          while (it.hasNext && it.head.getInt(0) == shard) {
            val ir = it.next()
            g.insert(ir.getLong(1), ir.getArray(2).toFloatArray(), params)
          }
          emitRows(shard, g)
        }
      }.flatten
    }
    spark.createDataFrame(rows, graphSchema)
  }

  /** Incremental insert into a stored graph — the serving lifecycle's
    * append path (the D14/q190 move applied to HNSW: never rebuild the
    * corpus index to admit an increment). Each new vector routes to its
    * shard (`pmod(id, S)` — S must equal the build-time shard count),
    * the shard's stored graph is rebuilt in one task exactly as
    * [[search]] rebuilds it (slots in id order, entry = first max-level
    * slot), and the increment inserts through the SAME deterministic
    * [[ShardGraph.insert]] the builder uses, old rows first, new rows in
    * ascending id order. Because every traversal decision is a function
    * of the adjacency SETS with id tie-breaks (never of in-memory
    * neighbor order), an APPEND-STYLE increment (all new ids greater
    * than every stored id — the natural ingest case) yields the
    * bit-identical graph a from-scratch [[build]] of the union would —
    * HnswInsertSpec pins that row-for-row. Non-monotonic ids insert
    * after the stored set (a different, still-valid HNSW; the recall
    * contract is the gate either way).
    *
    * Cost: one pass over stored-graph rows + increment — per-task memory
    * one shard, no corpus re-scan, no driver state. Output: the full
    * updated graph in [[build]]'s row layout, ready for
    * `IndexStore.writeHnsw`. */
  def insert(graph: DataFrame, increment: DataFrame, idCol: String,
      vecCol: String, shards: Int, params: Params = Params()): DataFrame = {
    require(shards >= 1, "shards must be >= 1")
    val spark = graph.sparkSession
    val emptyLevels = expr("CAST(array() AS array<array<bigint>>)")
    val oldRows = graph
      .select(col("shard_id").cast("int").as("shard_id"),
        col("id").cast("long").as("id"), col("vec"), col("levels"),
        lit(false).as("is_new"))
    val newRows = increment
      .select(pmod(col(idCol), lit(shards.toLong)).cast("int").as("shard_id"),
        col(idCol).cast("long").as("id"),
        col(vecCol).cast("array<float>").as("vec"))
      .withColumn("levels", emptyLevels)
      .withColumn("is_new", lit(true))
    val all = oldRows.unionByName(newRows)
      .repartition(shards, col("shard_id"))
      .sortWithinPartitions("shard_id", "is_new", "id")
    val rows = all.queryExecution.toRdd.mapPartitions { iter =>
      val it = iter.buffered
      new Iterator[Iterator[Row]] {
        def hasNext: Boolean = it.hasNext
        def next(): Iterator[Row] = {
          val shard = it.head.getInt(0)
          val stored = scala.collection.mutable.ArrayBuffer.empty[StoredNode]
          val fresh = scala.collection.mutable.ArrayBuffer.empty[(Long, Array[Float])]
          while (it.hasNext && it.head.getInt(0) == shard) {
            val ir = it.next()
            if (ir.getBoolean(4)) {
              fresh += ((ir.getLong(1), ir.getArray(2).toFloatArray()))
            } else {
              val lv = ir.getArray(3)
              val levelArr = (0 until lv.numElements()).map(i =>
                lv.getArray(i).toLongArray()).toArray
              stored += ((ir.getLong(1), ir.getArray(2).toFloatArray(), levelArr))
            }
          }
          val g = rebuildShard(stored, params)
          fresh.foreach { case (id, v) => g.insert(id, v, params) }
          emitRows(shard, g)
        }
      }.flatten
    }
    spark.createDataFrame(rows, graphSchema)
  }

  /** Resident shard graphs, keyed by (serving key, shard), PER JVM —
    * on a cluster every executor holds its own map with only the shards
    * its tasks have served; a task landing on a cold executor falls back
    * to the decode path and warms it. Bounded LRU (`graft.hnsw
    * .residentMax` system property, default 64 shard graphs): entries
    * under retired keys — key MUST change whenever the index content
    * changes — age out under access pressure instead of accumulating
    * heap for the JVM lifetime, which is what makes per-content keying
    * safe without a cluster-wide release primitive. */
  private val residentMax: Int =
    sys.props.get("graft.hnsw.residentMax").map(_.toInt).getOrElse(64)
  private val resident =
    java.util.Collections.synchronizedMap(
      new java.util.LinkedHashMap[(String, Int), ShardGraph](16, 0.75f, true) {
        override def removeEldestEntry(
            e: java.util.Map.Entry[(String, Int), ShardGraph]): Boolean =
          size() > residentMax
      })

  /** Release every resident shard graph registered under `key` in THIS
    * JVM — a local-mode/test helper (and driver-side no-op on a
    * cluster, where executor maps release via the LRU bound; stale keys
    * are never READ again because content keys never repeat). */
  def clearResident(key: String): Unit = resident.synchronized {
    val it = resident.keySet().iterator()
    while (it.hasNext) if (it.next()._1 == key) it.remove()
  }

  /** Cluster a loaded graph for serving: every shard's rows contiguous
    * and id-sorted in one partition. Persist + materialize the RESULT
    * once per serving session and pass it to [[search]] with
    * `prepared = true` — steady-state queries then read cached blocks
    * with no per-query shuffle (the shuffle this method performs is the
    * one-time serving setup, not a per-query cost). */
  def prepareServing(graph: DataFrame): DataFrame =
    graph
      .select(col("shard_id"), col("id"), col("vec"), col("levels"))
      .repartition(col("shard_id"))
      .sortWithinPartitions("shard_id", "id")

  /** Scatter-gather search: probes are a bounded retrieved/query set by
    * contract (the Mmr/probe-side class), collected and shipped in the
    * task binary; every shard beam-searches its local graph and emits
    * ≤ k rows per probe; one global per-probe top-k window finishes.
    * Output: (probeIdCol, idCol, cos_sim round 6) — the q30 shape.
    *
    * `prepared = true` asserts the input is already shard-clustered
    * ([[prepareServing]], typically persisted) and skips the internal
    * repartition — the per-query shuffle of the whole graph table, the
    * dominant steady-state cost. `residentKey` additionally pins each
    * decoded shard graph in executor heap (bounded LRU — see
    * [[clearResident]]), so warm queries skip per-row array decoding +
    * adjacency rebuild; the cached-block scan itself remains, as the
    * fault-tolerance floor (any task can rebuild its shard from the
    * rows it scans). Task memory: one shard's graph at a time on the
    * cold path, plus what the LRU has pinned — sized by the shards this
    * executor serves, capped at `residentMax`. */
  def search(graph: DataFrame, probes: DataFrame, probeIdCol: String,
      probeVecCol: String, k: Int, params: Params = Params(),
      outIdCol: String = "vec_id", residentKey: Option[String] = None,
      prepared: Boolean = false): DataFrame = {
    val spark = graph.sparkSession
    import spark.implicits._
    val probeList = probes
      .select(col(probeIdCol).cast("long"), col(probeVecCol).cast("array<float>"))
      .collect()
      .map(r => (r.getLong(0), r.getSeq[Float](1).toArray))
      .sortBy(_._1)
    val served =
      if (prepared) graph.select(col("shard_id"), col("id"), col("vec"), col("levels"))
      else prepareServing(graph)
    val key = residentKey
    val perShard = served.queryExecution.toRdd.mapPartitions { iter =>
      val it = iter.buffered
      new Iterator[Iterator[(Long, Long, Double)]] {
        def hasNext: Boolean = it.hasNext
        def next(): Iterator[(Long, Long, Double)] = {
          val shard = it.head.getInt(0)
          val warm = key.flatMap(kk => Option(resident.get((kk, shard))))
          val g = warm.getOrElse {
            val batch = scala.collection.mutable.ArrayBuffer.empty[StoredNode]
            while (it.hasNext && it.head.getInt(0) == shard) {
              val ir = it.next()
              val lv = ir.getArray(3)
              batch += ((ir.getLong(1), ir.getArray(2).toFloatArray(),
                (0 until lv.numElements()).map(i =>
                  lv.getArray(i).toLongArray()).toArray))
            }
            val built = rebuildShard(batch, params)
            key.foreach(kk => resident.put((kk, shard), built))
            built
          }
          if (warm.isDefined) {
            // drain this shard's remaining rows: skips the per-row array
            // decode + adjacency rebuild (the dominant cold cost), NOT
            // the scan itself — the persisted serving table's cached
            // blocks are still read, which is the fault-tolerance price
            // (any task can rebuild a shard from the rows it scans)
            while (it.hasNext && it.head.getInt(0) == shard) it.next()
          }
          probeList.iterator.flatMap { case (pid, pv) =>
            g.topK(pv, k, pid).iterator.map { case (id, sim) => (pid, id, sim) }
          }
        }
      }.flatten
    }
    val local = perShard.toDF(probeIdCol, outIdCol, "__sim")
      .select(col(probeIdCol), col(outIdCol),
        round(col("__sim"), 6).as("cos_sim"))
    val w = Window.partitionBy(col(probeIdCol))
      .orderBy(col("cos_sim").desc, col(outIdCol))
    local.withColumn("rn", row_number().over(w)).filter(col("rn") <= k)
      .select(col(probeIdCol), col(outIdCol), col("cos_sim"))
  }

  private val cache =
    new Memo[DataFrame](df => { df.unpersist(false); () })

  /** Serving memo (the q78/q177 semantics); bounded LRU, eviction
    * unpersists the prepared serving table ([[Memo]] — the executor-
    * pinned decoded shards have their own LRU, `resident`). */
  def cached(key: String)(buildGraph: => DataFrame): DataFrame =
    cache(key)(buildGraph)
}
