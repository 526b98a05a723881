package graft.ext

import scala.collection.mutable

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Exact heavy hitters (φ-frequent items) at stream scale: a per-partition
  * Misra–Gries candidate sketch followed by an exact recount of the
  * candidate set — the classic two-pass scheme that returns the EXACT
  * answer (vocabulary heads, hot keys, trending event types) without ever
  * shuffling the full item-frequency table.
  *
  * == Why not plain groupBy-count ==
  *
  * `groupBy(item).count().filter(cnt·k > n)` shuffles one row per DISTINCT
  * item — at corpus scale the distinct-token table is itself huge, and all
  * of it crosses the exchange to find the handful of frequent survivors.
  * Here pass 1 reduces each partition to ≤ k candidate items with NO
  * exchange at all (mapPartitions, bounded k-entry map), and pass 2
  * recounts only the ≤ k·P candidate set — the exchange carries candidate
  * rows only, map-side pre-aggregated.
  *
  * == Exactness ==
  *
  * Misra–Gries with k counters: every decrement event discards k+1
  * occurrences, so at most n_p/(k+1) decrements happen in a partition of
  * n_p items, and any item with partition count > n_p/(k+1) survives.
  * If an item's GLOBAL count exceeds n/k then by pigeonhole some
  * partition holds count_p > n_p/k > n_p/(k+1) — so the union of
  * per-partition survivors is a SUPERSET of every global φ=1/k-frequent
  * item. Pass 2 recounts candidates exactly; the final filter
  * `cnt·k > n` is integer arithmetic on true counts — the output is the
  * exact frequent-item set, a pure function of the data, independent of
  * partitioning and stream order (the sketch only ever affects which
  * infrequent candidates get recounted and discarded).
  */
object HeavyHitters {

  /** All items whose count strictly exceeds total/k, with their EXACT
    * counts. Output: (item, cnt), ordered (cnt desc, item). Nulls are not
    * items and drop out. `items` is scanned twice (both map-only) —
    * callers looping over many k values should persist it. */
  def frequentItems(items: DataFrame, itemCol: String, k: Int): DataFrame = {
    require(k >= 2, "k must be >= 2")
    val spark = items.sparkSession
    import spark.implicits._

    val stream = items.select(col(itemCol).cast("string").as("item"))
      .where(col("item").isNotNull)

    val candidates = stream.as[String].mapPartitions { it =>
      val counters = mutable.HashMap.empty[String, Long]
      it.foreach { x =>
        counters.get(x) match {
          case Some(c) => counters.update(x, c + 1)
          case None if counters.size < k => counters.update(x, 1L)
          case None =>
            // Decrement-all: discards one occurrence of k+1 distinct items.
            val dead = mutable.ArrayBuffer.empty[String]
            counters.foreach { case (key, c) =>
              if (c == 1L) dead += key else counters.update(key, c - 1)
            }
            dead.foreach(counters.remove)
        }
      }
      counters.keysIterator
    }.toDF("item").distinct()

    val total = stream.agg(count(lit(1)).as("__n"))
    stream.join(broadcast(candidates), Seq("item"))
      .groupBy("item").agg(count(lit(1)).as("cnt"))
      .crossJoin(broadcast(total))
      .where(col("cnt") * k > col("__n"))
      .select(col("item"), col("cnt"))
      .orderBy(col("cnt").desc, col("item"))
  }
}
