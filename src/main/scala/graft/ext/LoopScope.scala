package graft.ext

import org.apache.spark.sql.SparkSession

/** Execution scope for BOUNDED-TABLE iterative loops (r19).
  *
  * The tokenizer merge loops run dozens of sequential, tiny queries over
  * the Zipf-bounded word-frequency table (vocabulary-sized at ANY corpus
  * scale — the table is counts per distinct word-shape, not corpus rows).
  * Under AQE each such query costs one JOB PER QUERY STAGE (~5 jobs per
  * merge round measured on q189) plus the adaptive re-planning between
  * them — pure scheduling overhead when every stage is a few thousand
  * rows. Inside this scope AQE is off and the shuffle width is pinned to
  * the stored word-table partitioning, so one round = one job with
  * appropriately narrow stages.
  *
  * This is NOT a local-only tuning: the width follows the bounded
  * table's own stored partition count, which is what it should be on any
  * cluster — a vocabulary-sized table never wants hundreds of reduce
  * partitions. Corpus-sized work (the word-table build, the encode pass)
  * stays OUTSIDE the scope with AQE on. Conf is restored on exit even on
  * failure; loops are driver-sequential, so the session-level conf swap
  * cannot race another query of the same session.
  */
object LoopScope {

  def bounded[T](spark: SparkSession, width: Int)(body: => T): T = {
    val conf = spark.conf
    val aqe = conf.get("spark.sql.adaptive.enabled", "true")
    val parts = conf.get("spark.sql.shuffle.partitions", "200")
    conf.set("spark.sql.adaptive.enabled", "false")
    conf.set("spark.sql.shuffle.partitions", math.max(1, width).toString)
    try body
    finally {
      conf.set("spark.sql.adaptive.enabled", aqe)
      conf.set("spark.sql.shuffle.partitions", parts)
    }
  }
}
