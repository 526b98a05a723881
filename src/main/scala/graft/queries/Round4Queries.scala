package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.Tables

/** Declared queries Q90+: the round-4 tier. Opens with the canonical
  * TPC-H-form relational workloads (pricing summary, shipping priority,
  * local-supplier volume) over the driver's TPC-H-ish tables — the
  * reference stack's bread-and-butter warehouse queries
  * (`/root/reference/README.md:49-62` runs exactly this shape of SQL
  * through Trino), expressed as declarative Spark plans that broadcast
  * every dimension and keep one shuffle per aggregation. Float discipline
  * follows q09: DECIMAL(18,2) internal sums (exact, order-independent),
  * `round(CAST(. AS DOUBLE), 2)` at the output edge.
  */
object Round4Queries {

  private def t(s: SparkSession, d: String, n: String): DataFrame = Tables.load(s, d, n)

  /** Exact order-independent revenue term: Σ price·(1-discount) in
    * DECIMAL(18,2) — the q09 pattern. */
  private def revenueDec =
    sum(col("l_extendedprice").cast("decimal(18,2)")
      * (lit(1) - col("l_discount").cast("decimal(18,2)")))

  /** Q90 (TPC-H Q1 form, pricing summary): full-scan aggregate over
    * lineitem with the classic derived measures. One partial-agg shuffle
    * into 4 groups; every sum is DECIMAL internally so the merge order
    * across 32 (or 1000) partitions cannot change the answer; averages
    * are emitted as sum/count of the exact sums, not engine-native `avg`
    * (whose internal DECIMAL division scale differs across engines). */
  val q90 = GQuery("q90_pricing_summary", (s, d) => {
    val qty   = col("l_quantity").cast("decimal(18,2)")
    val price = col("l_extendedprice").cast("decimal(18,2)")
    val disc  = col("l_discount").cast("decimal(18,2)")
    val tax   = col("l_tax").cast("decimal(18,2)")
    t(s, d, "lineitem")
      .filter(col("l_shipdate") <= lit("2001-09-01").cast("date"))
      .groupBy(col("l_returnflag"), col("l_linestatus"))
      .agg(
        round(sum(qty).cast("double"), 2).as("sum_qty"),
        round(sum(price).cast("double"), 2).as("sum_base_price"),
        round(sum(price * (lit(1) - disc)).cast("double"), 2).as("sum_disc_price"),
        round(sum(price * (lit(1) - disc) * (lit(1) + tax)).cast("double"), 2).as("sum_charge"),
        round(sum(qty).cast("double") / count(lit(1)), 6).as("avg_qty"),
        round(sum(price).cast("double") / count(lit(1)), 6).as("avg_price"),
        round(sum(disc).cast("double") / count(lit(1)), 6).as("avg_disc"),
        count(lit(1)).as("count_order"))
      .orderBy("l_returnflag", "l_linestatus")
  },
    Some("""SELECT l_returnflag, l_linestatus,
           |  round(CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE), 2) AS sum_qty,
           |  round(CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE), 2) AS sum_base_price,
           |  round(CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2)) * (1 - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE), 2) AS sum_disc_price,
           |  round(CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2)) * (1 - CAST(l_discount AS DECIMAL(18,2))) * (1 + CAST(l_tax AS DECIMAL(18,2)))) AS DOUBLE), 2) AS sum_charge,
           |  round(CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) / count(*), 6) AS avg_qty,
           |  round(CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) / count(*), 6) AS avg_price,
           |  round(CAST(sum(CAST(l_discount AS DECIMAL(18,2))) AS DOUBLE) / count(*), 6) AS avg_disc,
           |  count(*) AS count_order
           |FROM lineitem WHERE l_shipdate <= DATE '2001-09-01'
           |GROUP BY l_returnflag, l_linestatus
           |ORDER BY l_returnflag, l_linestatus""".stripMargin))

  /** Q91 (TPC-H Q3 form, shipping priority): BUILDING-segment orders not
    * yet shipped at the cutoff, top 10 by open revenue. The two dim-side
    * filters (segment, order date) prune before their broadcast; lineitem
    * never shuffles — both joins are broadcast-hash — and the top-10
    * fuses to TakeOrderedAndProject, so the only wide operation is the
    * o_orderkey partial agg. */
  val q91 = GQuery("q91_shipping_priority", (s, d) => {
    val cutoff = lit("2000-06-30").cast("date")
    val cust = t(s, d, "customer")
      .filter(col("c_mktsegment") === "BUILDING").select("c_custkey")
    val ords = t(s, d, "orders")
      .filter(col("o_orderdate") < cutoff)
      .select("o_orderkey", "o_custkey", "o_orderdate")
    t(s, d, "lineitem")
      .filter(col("l_shipdate") > cutoff)
      .join(broadcast(ords), col("l_orderkey") === col("o_orderkey"))
      .join(broadcast(cust), col("o_custkey") === col("c_custkey"))
      .groupBy(col("l_orderkey"), col("o_orderdate"))
      .agg(round(revenueDec.cast("double"), 2).as("revenue"))
      .orderBy(col("revenue").desc, col("l_orderkey"))
      .limit(10)
  },
    Some("""SELECT l_orderkey, o_orderdate,
           |  round(CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2)) * (1 - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE), 2) AS revenue
           |FROM lineitem
           |JOIN orders ON l_orderkey = o_orderkey
           |JOIN customer ON o_custkey = c_custkey
           |WHERE c_mktsegment = 'BUILDING'
           |  AND o_orderdate < DATE '2000-06-30'
           |  AND l_shipdate > DATE '2000-06-30'
           |GROUP BY l_orderkey, o_orderdate
           |ORDER BY revenue DESC, l_orderkey LIMIT 10""".stripMargin))

  /** Q92 (TPC-H Q5 form, local-supplier volume): 6-way snowflake —
    * lineitem ⋈ orders ⋈ customer ⋈ supplier ⋈ nation ⋈ region, with the
    * "local" constraint c_nationkey = s_nationkey, ASIA-1997 filters,
    * revenue per nation. Every non-fact side broadcasts (the largest,
    * orders, only after its date filter); the fact table is scanned once,
    * 3 columns, and shuffles only for the final 5-group agg. */
  val q92 = GQuery("q92_local_volume", (s, d) => {
    val asiaNations = t(s, d, "nation")
      .join(broadcast(t(s, d, "region").filter(col("r_name") === "ASIA")),
        col("n_regionkey") === col("r_regionkey"))
      .select("n_nationkey", "n_name")
    val ords = t(s, d, "orders")
      .filter(col("o_orderdate") >= lit("1997-01-01").cast("date") &&
        col("o_orderdate") < lit("1998-01-01").cast("date"))
      .select("o_orderkey", "o_custkey")
    t(s, d, "lineitem")
      .select("l_orderkey", "l_suppkey", "l_extendedprice", "l_discount")
      .join(broadcast(ords), col("l_orderkey") === col("o_orderkey"))
      .join(broadcast(t(s, d, "supplier").select("s_suppkey", "s_nationkey")),
        col("l_suppkey") === col("s_suppkey"))
      .join(broadcast(t(s, d, "customer").select("c_custkey", "c_nationkey")),
        col("o_custkey") === col("c_custkey") &&
          col("c_nationkey") === col("s_nationkey"))
      .join(broadcast(asiaNations), col("s_nationkey") === col("n_nationkey"))
      .groupBy(col("n_name"))
      .agg(round(revenueDec.cast("double"), 2).as("revenue"))
      .orderBy(col("revenue").desc, col("n_name"))
  },
    Some("""SELECT n_name,
           |  round(CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2)) * (1 - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE), 2) AS revenue
           |FROM lineitem
           |JOIN orders ON l_orderkey = o_orderkey
           |JOIN supplier ON l_suppkey = s_suppkey
           |JOIN customer ON o_custkey = c_custkey AND c_nationkey = s_nationkey
           |JOIN nation ON s_nationkey = n_nationkey
           |JOIN region ON n_regionkey = r_regionkey
           |WHERE r_name = 'ASIA'
           |  AND o_orderdate >= DATE '1997-01-01' AND o_orderdate < DATE '1998-01-01'
           |GROUP BY n_name ORDER BY revenue DESC, n_name""".stripMargin))

  val all: Seq[GQuery] = Seq(q90, q91, q92)
}
