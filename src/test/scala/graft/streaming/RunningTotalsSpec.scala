package graft.streaming

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

import graft.SparkSpec

/** transformWithState (ST11): running totals accumulate across batches,
  * only changed users emit per batch, state survives between batches. */
class RunningTotalsSpec extends SparkSpec {
  import spark.implicits._
  import RunningTotals._

  test("running totals accumulate per user across micro-batches (update emission)") {
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val prevProvider = spark.conf.getOption("spark.sql.streaming.stateStore.providerClass")
    spark.conf.set("spark.sql.streaming.stateStore.providerClass",
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    try {
      val in = MemoryStream[Event]
      val q = totals(in.toDS()).writeStream.format("memory")
        .queryName("tws_totals").outputMode("update").start()
      try {
        in.addData(Event(1L, 10.0), Event(1L, 2.5), Event(2L, 7.0))
        q.processAllAvailable()
        in.addData(Event(1L, 0.5)) // only u1 changes this batch
        q.processAllAvailable()
      } finally q.stop()

      val rows = spark.table("tws_totals").as[Totals].collect().toSeq
      // batch 1 emitted both users' totals; batch 2 only u1's new total
      assert(rows.toSet === Set(
        Totals(1L, 2L, 12.5), Totals(2L, 1L, 7.0), Totals(1L, 3L, 13.0)))
      // u2 emitted exactly once — unchanged users stay silent
      assert(rows.count(_.user_id == 2L) === 1)
    } finally prevProvider match {
      case Some(v) => spark.conf.set("spark.sql.streaming.stateStore.providerClass", v)
      case None => spark.conf.unset("spark.sql.streaming.stateStore.providerClass")
    }
  }
}
