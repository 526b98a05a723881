package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Read-only probe (r19): does a localCheckpoint preserve the child's
  * HashPartitioning, and does a downstream aggregation reuse it without
  * a new Exchange? Decides the LabelProp dst-partitioned-edge design. */
object PartProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._
    val df = (1 to 100000).map(i => (i % 1000, i)).toDF("dst", "lab")
    val n = spark.sparkContext.defaultParallelism
    val ck = df.repartition(n, col("dst")).localCheckpoint()
    println("== checkpoint logical ==")
    println(ck.queryExecution.optimizedPlan.toString.take(400))
    println("== checkpoint physical outputPartitioning ==")
    println(ck.queryExecution.executedPlan.outputPartitioning)
    val agg = ck.groupBy(col("dst"), col("lab")).agg(count(lit(1)).as("c"))
      .groupBy(col("dst")).agg(max_by(col("lab"), col("c")).as("m"))
    println("== agg plan ==")
    println(agg.queryExecution.executedPlan.toString.take(2000))
    spark.stop()
  }
}
