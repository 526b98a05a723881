package graft
import org.apache.spark.sql.SparkSession

/** Benchmark main (driver contract): run every declared query on
  * SPARK_GRAFT_SF_DIR, print ONE JSON line with per-query seconds.
  *
  * Each query is forced through a `noop` sink — full plan execution with
  * all output columns materialized — rather than `count()`, which would let
  * Catalyst prune the plan down to a row count. */
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // Warm-up: compile a REPRESENTATIVE join+agg+window plan, not just
    // sum(range) — the first heavy whole-stage-codegen compile otherwise
    // lands on whatever query sorts first alphabetically (q09 absorbed ~8 s
    // of compile cost in round 1's bench).
    locally {
      import org.apache.spark.sql.expressions.Window
      import org.apache.spark.sql.functions._
      val fact = spark.range(200000).select(col("id"),
        (col("id") % 100).as("k"), (col("id") % 7).cast("decimal(18,2)").as("v"))
      val dim = spark.range(100).select(col("id").as("k"), (col("id") % 5).as("g"))
      fact.join(dim, "k").groupBy("g")
        .agg(round(sum(col("v") * (lit(1) - col("v"))).cast("double"), 2).as("m"),
          count(lit(1)).as("c"))
        .withColumn("rs", sum(col("c")).over(
          Window.partitionBy(col("g")).orderBy(col("m"))
            .rowsBetween(Window.unboundedPreceding, Window.currentRow)))
        .orderBy("g")
        .write.format("noop").mode("overwrite").save()
    }
    // Two passes over the suite; report the per-query minimum. A single pass
    // is hostage to whatever the host is doing during the first minute (cold
    // page cache on the parquet files, a concurrent job on the same box,
    // first-touch JIT) — round 2's driver run showed q04–q17 uniformly 2–4×
    // slower than steady state while q18+ ran at normal speed. The minimum of
    // two passes measures the engine, not the neighbor. Failures are flagged
    // in-band with a negative time so the driver artifact can't report a
    // broken suite as healthy.
    val named = SparkEntry.queries.toSeq.sortBy(_._1)
    def onePass(): Seq[(String, Double)] = named.map { case (name, fn) =>
      val t0 = System.nanoTime()
      val ok =
        try { fn(spark, sfDir).write.format("noop").mode("overwrite").save(); true }
        catch { case e: Throwable => System.err.println(s"[bench] $name failed: $e"); false }
      val secs = (System.nanoTime() - t0) / 1e9
      name -> (if (ok) secs else -secs)
    }
    val p1 = onePass().toMap
    val p2 = onePass().toMap
    val results = named.map { case (name, _) =>
      val (a, b) = (p1(name), p2(name))
      name -> (if (a >= 0 && b >= 0) math.min(a, b) else -math.max(math.abs(a), math.abs(b)))
    }
    val qs = results.map { case (k, v) => "\"" + k + f"""":$v%.3f""" }
      .mkString("{", ",", "}")
    val errs = results.filter(_._2 < 0).map { case (k, _) => "\"" + k + "\"" }
      .mkString("[", ",", "]")
    val total = results.map(v => math.abs(v._2)).sum
    println(f"""{"metric":"total","value":$total%.3f,"unit":"sec","queries":$qs,"errors":$errs,"sf":"$sfDir"}""")
    spark.stop()
  }
}
