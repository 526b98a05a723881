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

  /** Q93 (TPC-H Q4 form, order priority): orders placed in 1997Q3 having
    * at least one lineitem shipped more than 90 days after the order date
    * (the data has no commit/receipt dates; ship-lag is the equivalent
    * late-delivery predicate), counted per priority. The EXISTS lowers to
    * a LEFT SEMI join keyed on the order key with the date comparison as
    * a residual — lineitem ships only (l_orderkey, l_shipdate), orders
    * are quarter-pruned before the shuffle, and the semi join emits each
    * order at most once (no distinct needed). */
  val q93 = GQuery("q93_order_priority", (s, d) => {
    val ords = t(s, d, "orders")
      .filter(col("o_orderdate") >= lit("1997-07-01").cast("date") &&
        col("o_orderdate") < lit("1997-10-01").cast("date"))
      .select("o_orderkey", "o_orderdate", "o_orderpriority")
    val late = t(s, d, "lineitem").select("l_orderkey", "l_shipdate")
    ords.join(late,
        col("o_orderkey") === col("l_orderkey") &&
          col("l_shipdate") > col("o_orderdate") + expr("INTERVAL 90 DAY"),
        "left_semi")
      .groupBy(col("o_orderpriority"))
      .agg(count(lit(1)).as("order_count"))
      .orderBy("o_orderpriority")
  },
    Some("""SELECT o_orderpriority, count(*) AS order_count
           |FROM orders
           |WHERE o_orderdate >= DATE '1997-07-01' AND o_orderdate < DATE '1997-10-01'
           |  AND EXISTS (SELECT 1 FROM lineitem
           |              WHERE l_orderkey = o_orderkey
           |                AND l_shipdate > o_orderdate + INTERVAL 90 DAY)
           |GROUP BY o_orderpriority ORDER BY o_orderpriority""".stripMargin))

  /** Q94 (TPC-H Q14 form, promo revenue): share of September-1997 revenue
    * from PROMO-type parts. Part is slim-projected and broadcast; the
    * month filter prunes lineitem at the scan; the whole query is one
    * map-side join plus a single 1-row aggregate — no wide shuffle at
    * all. Conditional aggregation via CASE inside the sum. */
  val q94 = GQuery("q94_promo_revenue", (s, d) => {
    val price = col("l_extendedprice").cast("decimal(18,2)")
    val disc  = col("l_discount").cast("decimal(18,2)")
    val rev   = price * (lit(1) - disc)
    t(s, d, "lineitem")
      .filter(col("l_shipdate") >= lit("1997-09-01").cast("date") &&
        col("l_shipdate") < lit("1997-10-01").cast("date"))
      .join(broadcast(t(s, d, "part").select("p_partkey", "p_type")),
        col("l_partkey") === col("p_partkey"))
      .agg(
        round((sum(when(col("p_type") === "PROMO", rev).otherwise(lit(0).cast("decimal(18,2)")))
          * lit(100)).cast("double") / sum(rev).cast("double"), 6).as("promo_pct"),
        round(sum(rev).cast("double"), 2).as("total_revenue"))
  },
    Some("""SELECT
           |  round(CAST(sum(CASE WHEN p_type = 'PROMO'
           |                      THEN CAST(l_extendedprice AS DECIMAL(18,2)) * (1 - CAST(l_discount AS DECIMAL(18,2)))
           |                      ELSE CAST(0 AS DECIMAL(18,2)) END) * 100 AS DOUBLE)
           |    / CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2)) * (1 - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE), 6) AS promo_pct,
           |  round(CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2)) * (1 - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE), 2) AS total_revenue
           |FROM lineitem JOIN part ON l_partkey = p_partkey
           |WHERE l_shipdate >= DATE '1997-09-01' AND l_shipdate < DATE '1997-10-01'""".stripMargin))

  /** Q95 (TPC-H Q18 form, large-volume orders): orders whose total line
    * quantity exceeds 190, with customer attribution, top 20 by order
    * price. The quantity HAVING runs as lineitem's own partial-agg'd
    * groupBy BEFORE any join — the filtered survivor set (a fraction of
    * orders) is what joins back to orders/customer, so the expensive side
    * shrinks first. Top-20 fuses to TakeOrderedAndProject. */
  val q95 = GQuery("q95_large_orders", (s, d) => {
    val big = t(s, d, "lineitem")
      .groupBy(col("l_orderkey"))
      .agg(sum(col("l_quantity").cast("decimal(18,2)")).as("sum_qty_dec"))
      .filter(col("sum_qty_dec") > 190)
    big.join(t(s, d, "orders").select("o_orderkey", "o_custkey", "o_orderdate", "o_totalprice"),
        col("l_orderkey") === col("o_orderkey"))
      .join(broadcast(t(s, d, "customer").select("c_custkey", "c_name")),
        col("o_custkey") === col("c_custkey"))
      .select(col("c_name"), col("o_orderkey"), col("o_orderdate"),
        col("o_totalprice"),
        round(col("sum_qty_dec").cast("double"), 2).as("sum_qty"))
      .orderBy(col("o_totalprice").desc, col("o_orderkey"))
      .limit(20)
  },
    Some("""SELECT c_name, o_orderkey, o_orderdate, o_totalprice,
           |  round(CAST(sum_qty_dec AS DOUBLE), 2) AS sum_qty
           |FROM (SELECT l_orderkey, sum(CAST(l_quantity AS DECIMAL(18,2))) AS sum_qty_dec
           |      FROM lineitem GROUP BY l_orderkey
           |      HAVING sum(CAST(l_quantity AS DECIMAL(18,2))) > 190) big
           |JOIN orders ON l_orderkey = o_orderkey
           |JOIN customer ON o_custkey = c_custkey
           |ORDER BY o_totalprice DESC, o_orderkey LIMIT 20""".stripMargin))

  /** Q96 (TPC-H Q11 form, nation balance share): nations whose suppliers
    * hold more than 8% of global supplier account balance. The global
    * total is a 1-row aggregate broadcast-cross-joined into the per-nation
    * rows — never a partition-less window (the Chart-compiler lesson from
    * round 1). All comparisons stay in exact DECIMAL so the 8% threshold
    * cannot flip on summation order. */
  val q96 = GQuery("q96_nation_balance_share", (s, d) => {
    val bal = col("s_acctbal").cast("decimal(18,2)")
    val perNation = t(s, d, "supplier")
      .groupBy(col("s_nationkey"))
      .agg(sum(bal).as("nation_bal"))
    val total = t(s, d, "supplier").agg(sum(bal).as("total_bal"))
    perNation.crossJoin(broadcast(total))
      .filter(col("nation_bal") * 100 > col("total_bal") * 8)
      .join(broadcast(t(s, d, "nation").select("n_nationkey", "n_name")),
        col("s_nationkey") === col("n_nationkey"))
      .select(col("n_name"),
        round(col("nation_bal").cast("double"), 2).as("nation_bal"),
        round((col("nation_bal") * 100).cast("double") / col("total_bal").cast("double"), 6).as("share_pct"))
      .orderBy(col("nation_bal").desc, col("n_name"))
  },
    Some("""WITH per_nation AS (
           |  SELECT s_nationkey, sum(CAST(s_acctbal AS DECIMAL(18,2))) AS nation_bal
           |  FROM supplier GROUP BY s_nationkey),
           |tot AS (SELECT sum(CAST(s_acctbal AS DECIMAL(18,2))) AS total_bal FROM supplier)
           |SELECT n_name,
           |  round(CAST(nation_bal AS DOUBLE), 2) AS nation_bal,
           |  round(CAST(nation_bal * 100 AS DOUBLE) / CAST(total_bal AS DOUBLE), 6) AS share_pct
           |FROM per_nation, tot
           |JOIN nation ON s_nationkey = n_nationkey
           |WHERE nation_bal * 100 > total_bal * 8
           |ORDER BY nation_bal DESC, n_name""".stripMargin))

  /** Q97 (TPC-H Q15 form, top supplier): the supplier(s) with maximum
    * revenue over 1997H1. The max is a 1-row aggregate off the already-
    * aggregated per-supplier revenue (ReuseExchange shares the scan),
    * broadcast back as an equality filter — the revenue stays DECIMAL end
    * to end so `= max` is exact on both engines. */
  val q97 = GQuery("q97_top_supplier", (s, d) => {
    val rev = t(s, d, "lineitem")
      .filter(col("l_shipdate") >= lit("1997-01-01").cast("date") &&
        col("l_shipdate") < lit("1997-07-01").cast("date"))
      .groupBy(col("l_suppkey"))
      .agg(revenueDec.as("total_rev"))
    val mx = rev.agg(max(col("total_rev")).as("max_rev"))
    rev.crossJoin(broadcast(mx))
      .filter(col("total_rev") === col("max_rev"))
      .join(broadcast(t(s, d, "supplier").select("s_suppkey", "s_name")),
        col("l_suppkey") === col("s_suppkey"))
      .select(col("s_suppkey"), col("s_name"),
        round(col("total_rev").cast("double"), 2).as("total_rev"))
      .orderBy("s_suppkey")
  },
    Some("""WITH rev AS (
           |  SELECT l_suppkey, sum(CAST(l_extendedprice AS DECIMAL(18,2)) * (1 - CAST(l_discount AS DECIMAL(18,2)))) AS total_rev
           |  FROM lineitem
           |  WHERE l_shipdate >= DATE '1997-01-01' AND l_shipdate < DATE '1997-07-01'
           |  GROUP BY l_suppkey)
           |SELECT s_suppkey, s_name, round(CAST(total_rev AS DOUBLE), 2) AS total_rev
           |FROM rev JOIN supplier ON l_suppkey = s_suppkey
           |WHERE total_rev = (SELECT max(total_rev) FROM rev)
           |ORDER BY s_suppkey""".stripMargin))

  /** Q98 (TPC-H Q10 form, returned items): revenue lost to returns per
    * customer in 1997Q4, top 20. Orders are quarter-pruned then broadcast;
    * the R-flag filter reaches the lineitem scan (PushedFilters); customer
    * and nation broadcast; one groupBy shuffle on c_custkey, then the
    * top-20 fuses to TakeOrderedAndProject. */
  val q98 = GQuery("q98_returned_items", (s, d) => {
    val ords = t(s, d, "orders")
      .filter(col("o_orderdate") >= lit("1997-10-01").cast("date") &&
        col("o_orderdate") < lit("1998-01-01").cast("date"))
      .select("o_orderkey", "o_custkey")
    t(s, d, "lineitem")
      .filter(col("l_returnflag") === "R")
      .select("l_orderkey", "l_extendedprice", "l_discount")
      .join(broadcast(ords), col("l_orderkey") === col("o_orderkey"))
      .join(broadcast(t(s, d, "customer")
          .select("c_custkey", "c_name", "c_acctbal", "c_nationkey")),
        col("o_custkey") === col("c_custkey"))
      .join(broadcast(t(s, d, "nation").select("n_nationkey", "n_name")),
        col("c_nationkey") === col("n_nationkey"))
      .groupBy(col("c_custkey"), col("c_name"), col("c_acctbal"), col("n_name"))
      .agg(round(revenueDec.cast("double"), 2).as("revenue"))
      .orderBy(col("revenue").desc, col("c_custkey"))
      .limit(20)
  },
    Some("""SELECT c_custkey, c_name, c_acctbal, n_name,
           |  round(CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2)) * (1 - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE), 2) AS revenue
           |FROM lineitem
           |JOIN orders ON l_orderkey = o_orderkey
           |JOIN customer ON o_custkey = c_custkey
           |JOIN nation ON c_nationkey = n_nationkey
           |WHERE l_returnflag = 'R'
           |  AND o_orderdate >= DATE '1997-10-01' AND o_orderdate < DATE '1998-01-01'
           |GROUP BY c_custkey, c_name, c_acctbal, n_name
           |ORDER BY revenue DESC, c_custkey LIMIT 20""".stripMargin))

  /** Q99 (TPC-H Q2 form, min-cost supplier): for each STANDARD-type part
    * of size 25, the supplier offering the lowest observed unit price
    * (min l_extendedprice/l_quantity over its lineitems — the data has no
    * partsupp table, so observed price history is the cost relation).
    * Part is filtered then broadcast; the per-(part,supplier) min is one
    * partial-agg'd shuffle; the per-part argmin is a row_number over a
    * properly keyed window (partitioned by part — never global). IEEE
    * double division is deterministic, so the min, the tie-broken argmin,
    * and the emitted cost agree bitwise across engines — the cost is
    * deliberately NOT rounded (a quotient can land on a round-half
    * boundary where the engines' rounding modes disagree; the raw double
    * cannot). */
  val q99 = GQuery("q99_min_cost_supplier", (s, d) => {
    val parts = t(s, d, "part")
      .filter(col("p_type") === "STANDARD" && col("p_size").isin(5, 15, 25, 35, 45))
      .select("p_partkey", "p_name")
    val costs = t(s, d, "lineitem")
      .select("l_partkey", "l_suppkey", "l_extendedprice", "l_quantity")
      .join(broadcast(parts), col("l_partkey") === col("p_partkey"))
      .groupBy(col("p_partkey"), col("p_name"), col("l_suppkey"))
      .agg(min(col("l_extendedprice") / col("l_quantity")).as("unit_cost"))
    val w = Window.partitionBy(col("p_partkey"))
      .orderBy(col("unit_cost").asc, col("l_suppkey").asc)
    costs.withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1)
      .join(broadcast(t(s, d, "supplier").select("s_suppkey", "s_name")),
        col("l_suppkey") === col("s_suppkey"))
      .select(col("p_partkey"), col("p_name"), col("s_name"), col("unit_cost"))
      .orderBy("p_partkey")
  },
    Some("""WITH costs AS (
           |  SELECT p_partkey, p_name, l_suppkey,
           |         min(l_extendedprice / l_quantity) AS unit_cost
           |  FROM lineitem JOIN part ON l_partkey = p_partkey
           |  WHERE p_type = 'STANDARD' AND p_size IN (5, 15, 25, 35, 45)
           |  GROUP BY p_partkey, p_name, l_suppkey),
           |ranked AS (
           |  SELECT *, row_number() OVER (PARTITION BY p_partkey
           |                               ORDER BY unit_cost ASC, l_suppkey ASC) AS rn
           |  FROM costs)
           |SELECT p_partkey, p_name, s_name, unit_cost
           |FROM ranked JOIN supplier ON l_suppkey = s_suppkey
           |WHERE rn = 1 ORDER BY p_partkey""".stripMargin))

  /** Q100 (TPC-H Q12 form, priority by line status): 1997 shipments
    * classified urgent/non-urgent per line status (the data has no
    * l_shipmode; l_linestatus is the grouping axis). Orders ships only
    * (key, priority) into its broadcast; conditional counts are CASE
    * sums inside one partial-agg'd groupBy — 2 output rows. */
  val q100 = GQuery("q100_priority_linestatus", (s, d) => {
    val urgent = col("o_orderpriority") === "1-URGENT" || col("o_orderpriority") === "2-HIGH"
    t(s, d, "lineitem")
      .filter(col("l_shipdate") >= lit("1997-01-01").cast("date") &&
        col("l_shipdate") < lit("1998-01-01").cast("date"))
      .select("l_orderkey", "l_linestatus")
      .join(broadcast(t(s, d, "orders").select("o_orderkey", "o_orderpriority")),
        col("l_orderkey") === col("o_orderkey"))
      .groupBy(col("l_linestatus"))
      .agg(
        sum(when(urgent, 1L).otherwise(0L)).as("high_line_count"),
        sum(when(urgent, 0L).otherwise(1L)).as("low_line_count"))
      .orderBy("l_linestatus")
  },
    Some("""SELECT l_linestatus,
           |  CAST(sum(CASE WHEN o_orderpriority IN ('1-URGENT','2-HIGH') THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
           |  CAST(sum(CASE WHEN o_orderpriority IN ('1-URGENT','2-HIGH') THEN 0 ELSE 1 END) AS BIGINT) AS low_line_count
           |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
           |WHERE l_shipdate >= DATE '1997-01-01' AND l_shipdate < DATE '1998-01-01'
           |GROUP BY l_linestatus ORDER BY l_linestatus""".stripMargin))

  /** Q101 (TPC-H Q22 form, idle rich customers): customers with no orders
    * since 1999 whose balance exceeds the positive-balance average,
    * summarized per market segment. The average threshold is compared
    * multiplied-through (bal·N > S) in exact DECIMAL — no double division
    * on the comparison path, so the boundary cannot flip on summation
    * order. The anti join ships only the date-pruned o_custkey column;
    * the scalar (S, N) broadcast. */
  val q101 = GQuery("q101_idle_rich_customers", (s, d) => {
    val bal = col("c_acctbal").cast("decimal(18,2)")
    val stats = t(s, d, "customer")
      .filter(col("c_acctbal") > 0)
      .agg(sum(bal).as("s_total"), count(lit(1)).as("n_total"))
    val recent = t(s, d, "orders")
      .filter(col("o_orderdate") >= lit("1999-01-01").cast("date"))
      .select("o_custkey")
    t(s, d, "customer")
      .crossJoin(broadcast(stats))
      .filter(bal * col("n_total") > col("s_total"))
      .join(recent, col("c_custkey") === col("o_custkey"), "left_anti")
      .groupBy(col("c_mktsegment"))
      .agg(count(lit(1)).as("numcust"),
        round(sum(bal).cast("double"), 2).as("totacctbal"))
      .orderBy("c_mktsegment")
  },
    Some("""WITH stats AS (
           |  SELECT sum(CAST(c_acctbal AS DECIMAL(18,2))) AS s_total, count(*) AS n_total
           |  FROM customer WHERE c_acctbal > 0)
           |SELECT c_mktsegment, count(*) AS numcust,
           |  round(CAST(sum(CAST(c_acctbal AS DECIMAL(18,2))) AS DOUBLE), 2) AS totacctbal
           |FROM customer, stats
           |WHERE CAST(c_acctbal AS DECIMAL(18,2)) * n_total > s_total
           |  AND NOT EXISTS (SELECT 1 FROM orders
           |                  WHERE o_custkey = c_custkey
           |                    AND o_orderdate >= DATE '1999-01-01')
           |GROUP BY c_mktsegment ORDER BY c_mktsegment""".stripMargin))

  /** Q102 (TPC-H Q19 form, OR-of-ANDs discounted revenue): revenue from
    * three (brand, size-range, quantity-range) bands. The part-only
    * conjuncts (brand, size) are pre-filtered into the broadcast build
    * side as their OR'd union, the full tri-band predicate evaluates as
    * the join residual, and lineitem carries 4 columns. One 1-row agg. */
  val q102 = GQuery("q102_band_revenue", (s, d) => {
    val partPred =
      (col("p_brand") === "Brand#4"  && col("p_size").between(1, 15)) ||
      (col("p_brand") === "Brand#19" && col("p_size").between(10, 30)) ||
      (col("p_brand") === "Brand#16" && col("p_size").between(20, 50))
    val bandPred =
      (col("p_brand") === "Brand#4"  && col("p_size").between(1, 15)  && col("l_quantity").between(1, 20))  ||
      (col("p_brand") === "Brand#19" && col("p_size").between(10, 30) && col("l_quantity").between(10, 30)) ||
      (col("p_brand") === "Brand#16" && col("p_size").between(20, 50) && col("l_quantity").between(20, 40))
    t(s, d, "lineitem")
      .select("l_partkey", "l_quantity", "l_extendedprice", "l_discount")
      .join(broadcast(t(s, d, "part").filter(partPred)
          .select("p_partkey", "p_brand", "p_size")),
        col("l_partkey") === col("p_partkey"))
      .filter(bandPred)
      .agg(round(revenueDec.cast("double"), 2).as("revenue"),
        count(lit(1)).as("n_lines"))
  },
    Some("""SELECT
           |  round(CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2)) * (1 - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE), 2) AS revenue,
           |  count(*) AS n_lines
           |FROM lineitem JOIN part ON l_partkey = p_partkey
           |WHERE (p_brand = 'Brand#4'  AND p_size BETWEEN 1 AND 15  AND l_quantity BETWEEN 1 AND 20)
           |   OR (p_brand = 'Brand#19' AND p_size BETWEEN 10 AND 30 AND l_quantity BETWEEN 10 AND 30)
           |   OR (p_brand = 'Brand#16' AND p_size BETWEEN 20 AND 50 AND l_quantity BETWEEN 20 AND 40)""".stripMargin))

  /** Q111 (native session windows): Spark's built-in `session_window`
    * (merge-on-overlap: a session extends while consecutive events are
    * strictly closer than the gap) — the engine-native counterpart of the
    * custom q44 sessionizer, and the same operator that runs stateful in
    * streaming mode. One user-keyed exchange; window merge is
    * in-partition. Oracle: lag/cumsum session assembly with the matching
    * strict boundary (break at diff >= gap). */
  val q111 = GQuery("q111_session_window", (s, d) => {
    t(s, d, "events")
      .groupBy(session_window(col("ts"), "30 minutes"), col("user_id"))
      .agg(count(lit(1)).as("n_events"))
      .select(col("user_id"),
        col("session_window.start").as("session_start"),
        col("n_events"))
      .orderBy("user_id", "session_start")
  },
    Some("""WITH e AS (SELECT user_id, CAST(ts AS TIMESTAMP) AS ts FROM events),
           |b AS (SELECT user_id, ts,
           |        CASE WHEN ts - lag(ts) OVER (PARTITION BY user_id ORDER BY ts)
           |                  >= INTERVAL 30 MINUTE
           |             OR lag(ts) OVER (PARTITION BY user_id ORDER BY ts) IS NULL
           |             THEN 1 ELSE 0 END AS brk
           |      FROM e),
           |ses AS (SELECT user_id, ts,
           |          sum(brk) OVER (PARTITION BY user_id ORDER BY ts
           |                         ROWS UNBOUNDED PRECEDING) AS sid
           |        FROM b)
           |SELECT user_id, min(ts) AS session_start, count(*) AS n_events
           |FROM ses GROUP BY user_id, sid
           |ORDER BY user_id, session_start""".stripMargin))

  /** Q112 (unpivot/melt): wide per-flag measures to long (measure, value)
    * form — the `df.unpivot` lowering (Expand, one pass, no join), the
    * inverse of q60's pivot. Values are rounded doubles of exact DECIMAL
    * sums; the oracle is the engine-agnostic UNION ALL twin. */
  val q112 = GQuery("q112_unpivot", (s, d) => {
    val qty   = col("l_quantity").cast("decimal(18,2)")
    val price = col("l_extendedprice").cast("decimal(18,2)")
    t(s, d, "lineitem")
      .groupBy(col("l_returnflag"))
      .agg(
        round(sum(qty).cast("double"), 2).as("sum_qty"),
        round(sum(price).cast("double"), 2).as("sum_base_price"))
      .unpivot(
        ids = Array(col("l_returnflag")),
        values = Array(col("sum_qty"), col("sum_base_price")),
        variableColumnName = "measure",
        valueColumnName = "value")
      .orderBy("l_returnflag", "measure")
  },
    Some("""WITH w AS (
           |  SELECT l_returnflag,
           |    round(CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE), 2) AS sum_qty,
           |    round(CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE), 2) AS sum_base_price
           |  FROM lineitem GROUP BY l_returnflag)
           |SELECT l_returnflag, 'sum_qty' AS measure, sum_qty AS value FROM w
           |UNION ALL
           |SELECT l_returnflag, 'sum_base_price' AS measure, sum_base_price AS value FROM w
           |ORDER BY l_returnflag, measure""".stripMargin))

  /** Q113 (recursive CTE): hierarchy walk over the synthetic supplier tree
    * parent(s) = floor(s/10) — depth and root per node via WITH RECURSIVE,
    * Spark 4's UnionLoop execution (each iteration a distributed batch;
    * rounds = tree depth, same bound as ext.Clustering's label
    * propagation). The oracle runs the IDENTICAL statement. */
  val q113 = GQuery("q113_recursive_cte", (s, d) => {
    t(s, d, "supplier").createOrReplaceTempView("rc_supplier")
    s.sql("""WITH RECURSIVE chain AS (
            |  SELECT s_suppkey, 0 AS depth, s_suppkey AS root
            |  FROM rc_supplier WHERE s_suppkey < 10
            |  UNION ALL
            |  SELECT s.s_suppkey, c.depth + 1, c.root
            |  FROM rc_supplier s JOIN chain c
            |    ON CAST(floor(s.s_suppkey / 10.0) AS BIGINT) = c.s_suppkey
            |  WHERE s.s_suppkey >= 10)
            |SELECT s_suppkey, depth, root FROM chain ORDER BY s_suppkey""".stripMargin)
  },
    Some("""WITH RECURSIVE chain AS (
           |  SELECT s_suppkey, 0 AS depth, s_suppkey AS root
           |  FROM supplier WHERE s_suppkey < 10
           |  UNION ALL
           |  SELECT s.s_suppkey, c.depth + 1, c.root
           |  FROM supplier s JOIN chain c
           |    ON CAST(floor(s.s_suppkey / 10.0) AS BIGINT) = c.s_suppkey
           |  WHERE s.s_suppkey >= 10)
           |SELECT s_suppkey, depth, root FROM chain ORDER BY s_suppkey""".stripMargin))

  /** Q114 (TPC-H Q6 form, forecast revenue change): pure filter-scan
    * aggregate — every predicate (date range, discount band, quantity cap)
    * reaches the parquet scan as a pushed data filter, the scan reads 4
    * columns, and the whole query is one partial-agg'd 1-row aggregate.
    * The purest demonstration that the declarative plan lets the format
    * do the skipping: at 100 TB with zorder'd (l_shipdate, l_quantity)
    * files this touches a fraction of the row groups. */
  val q114 = GQuery("q114_forecast_revenue", (s, d) => {
    t(s, d, "lineitem")
      .filter(
        col("l_shipdate") >= lit("1997-01-01").cast("date") &&
        col("l_shipdate") < lit("1998-01-01").cast("date") &&
        col("l_discount").between(0.05, 0.07) &&
        col("l_quantity") < 24)
      .agg(
        round(sum(col("l_extendedprice").cast("decimal(18,2)")
          * col("l_discount").cast("decimal(18,4)")).cast("double"), 2).as("revenue"),
        count(lit(1)).as("n_lines"))
  },
    Some("""SELECT
           |  round(CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2)) * CAST(l_discount AS DECIMAL(18,4))) AS DOUBLE), 2) AS revenue,
           |  count(*) AS n_lines
           |FROM lineitem
           |WHERE l_shipdate >= DATE '1997-01-01' AND l_shipdate < DATE '1998-01-01'
           |  AND l_discount BETWEEN 0.05 AND 0.07 AND l_quantity < 24""".stripMargin))

  /** Q117 (TPC-H Q13 form, customer distribution): histogram of customers
    * by order count, zeros included — the two-level aggregation: a left
    * join keeps orderless customers, count per customer, then count per
    * count. The first agg's exchange is the only fact-sized shuffle; the
    * histogram agg runs on per-customer rows. */
  val q117 = GQuery("q117_customer_distribution", (s, d) => {
    t(s, d, "customer").select("c_custkey")
      .join(t(s, d, "orders").select("o_custkey"),
        col("c_custkey") === col("o_custkey"), "left")
      .groupBy(col("c_custkey"))
      .agg(count(col("o_custkey")).as("c_count")) // count(col) skips nulls
      .groupBy(col("c_count"))
      .agg(count(lit(1)).as("custdist"))
      .orderBy(col("custdist").desc, col("c_count").desc)
  },
    Some("""SELECT c_count, count(*) AS custdist
           |FROM (SELECT c_custkey, count(o_custkey) AS c_count
           |      FROM customer LEFT JOIN orders ON c_custkey = o_custkey
           |      GROUP BY c_custkey) per_cust
           |GROUP BY c_count
           |ORDER BY custdist DESC, c_count DESC""".stripMargin))

  /** Q118 (TPC-H Q17 form, small-quantity revenue): lineitems under half
    * their part's average quantity, for one brand. The correlated
    * `avg(l_quantity) WHERE same part` decorrelates into a per-part
    * aggregate joined back — the per-part avg is exact DECIMAL sum/count
    * compared multiplied-through (2·N·qty < S·2... qty·2·cnt < sum·1) so
    * no division sits on the comparison path. */
  val q118 = GQuery("q118_small_quantity", (s, d) => {
    val qtyDec = col("l_quantity").cast("decimal(18,2)")
    val parts = t(s, d, "part")
      .filter(col("p_brand") === "Brand#4").select("p_partkey")
    val line = t(s, d, "lineitem")
      .select(col("l_partkey"), col("l_quantity"), col("l_extendedprice"))
      .join(broadcast(parts), col("l_partkey") === col("p_partkey"))
    val perPart = line.groupBy(col("p_partkey").as("ag_partkey"))
      .agg(sum(qtyDec).as("qty_sum"), count(lit(1)).as("qty_cnt"))
    line.join(perPart, col("l_partkey") === col("ag_partkey"))
      .filter(qtyDec * 2 * col("qty_cnt") < col("qty_sum"))
      .agg(
        round(sum(col("l_extendedprice").cast("decimal(18,2)")).cast("double") / 7.0, 2)
          .as("avg_yearly"),
        count(lit(1)).as("n_lines"))
  },
    Some("""WITH line AS (
           |  SELECT l_partkey, l_quantity, l_extendedprice
           |  FROM lineitem JOIN part ON l_partkey = p_partkey
           |  WHERE p_brand = 'Brand#4'),
           |per_part AS (
           |  SELECT l_partkey AS ag_partkey,
           |         sum(CAST(l_quantity AS DECIMAL(18,2))) AS qty_sum,
           |         count(*) AS qty_cnt
           |  FROM line GROUP BY l_partkey)
           |SELECT
           |  round(CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) / 7.0, 2) AS avg_yearly,
           |  count(*) AS n_lines
           |FROM line JOIN per_part ON l_partkey = ag_partkey
           |WHERE CAST(l_quantity AS DECIMAL(18,2)) * 2 * qty_cnt < qty_sum""".stripMargin))

  /** Q119 (TPC-H Q21 form, sole late supplier): suppliers whose lineitem
    * arrived late in an order where EVERY other supplier shipped on time —
    * the EXISTS + NOT EXISTS pair over the same fact table. Both
    * subqueries decorrelate into one semi and one anti join keyed on the
    * order; the late-threshold is ship-lag > 60 days (no receipt dates in
    * this schema). Top 20 by count. */
  val q119 = GQuery("q119_sole_late_supplier", (s, d) => {
    val line = t(s, d, "lineitem")
      .join(broadcast(t(s, d, "orders")
          .filter(col("o_orderstatus") === "F")
          .select("o_orderkey", "o_orderdate")),
        col("l_orderkey") === col("o_orderkey"))
      .withColumn("late",
        col("l_shipdate") > col("o_orderdate") + expr("INTERVAL 60 DAY"))
      .select("l_orderkey", "l_suppkey", "late")
    val l1 = line.filter(col("late"))
      .select(col("l_orderkey").as("k1"), col("l_suppkey").as("s1")).distinct()
    // another supplier in the same order (late or not)
    val other = line.select(col("l_orderkey").as("k2"), col("l_suppkey").as("s2")).distinct()
    // another supplier in the same order that was ALSO late
    val otherLate = l1.select(col("k1").as("k3"), col("s1").as("s3"))
    val candidates = l1
      .join(other, col("k1") === col("k2") && col("s1") =!= col("s2"), "left_semi")
    val sole = candidates
      .join(otherLate, col("k1") === col("k3") && col("s1") =!= col("s3"), "left_anti")
    sole.join(broadcast(t(s, d, "supplier").select("s_suppkey", "s_name")),
        col("s1") === col("s_suppkey"))
      .groupBy(col("s_name"))
      .agg(count(lit(1)).as("numwait"))
      .orderBy(col("numwait").desc, col("s_name"))
      .limit(20)
  },
    Some("""WITH line AS (
           |  SELECT l_orderkey, l_suppkey,
           |         l_shipdate > o_orderdate + INTERVAL 60 DAY AS late
           |  FROM lineitem JOIN orders ON l_orderkey = o_orderkey
           |  WHERE o_orderstatus = 'F'),
           |l1 AS (SELECT DISTINCT l_orderkey, l_suppkey FROM line WHERE late)
           |SELECT s_name, count(*) AS numwait
           |FROM l1 JOIN supplier ON l_suppkey = s_suppkey
           |WHERE EXISTS (SELECT 1 FROM line l2
           |              WHERE l2.l_orderkey = l1.l_orderkey
           |                AND l2.l_suppkey <> l1.l_suppkey)
           |  AND NOT EXISTS (SELECT 1 FROM line l3
           |                  WHERE l3.l_orderkey = l1.l_orderkey
           |                    AND l3.l_suppkey <> l1.l_suppkey AND l3.late)
           |GROUP BY s_name
           |ORDER BY numwait DESC, s_name LIMIT 20""".stripMargin))

  /** Q120 (TPC-H Q7 form, volume shipping): revenue between two nations (the synthetic data names them NATION_7/NATION_12),
    * both directions, by year — the OR'd nation-pair residual on a
    * supplier⋈customer bridge. All dims broadcast; lineitem shuffles once
    * for the (from, to, year) agg. */
  val q120 = GQuery("q120_volume_shipping", (s, d) => {
    val nations = t(s, d, "nation").select("n_nationkey", "n_name")
    val supp = t(s, d, "supplier").select("s_suppkey", "s_nationkey")
      .join(broadcast(nations), col("s_nationkey") === col("n_nationkey"))
      .select(col("s_suppkey"), col("n_name").as("supp_nation"))
    val cust = t(s, d, "customer").select("c_custkey", "c_nationkey")
      .join(broadcast(nations), col("c_nationkey") === col("n_nationkey"))
      .select(col("c_custkey"), col("n_name").as("cust_nation"))
    val pair = (col("supp_nation") === "NATION_7" && col("cust_nation") === "NATION_12") ||
      (col("supp_nation") === "NATION_12" && col("cust_nation") === "NATION_7")
    t(s, d, "lineitem")
      .select("l_orderkey", "l_suppkey", "l_shipdate", "l_extendedprice", "l_discount")
      .join(broadcast(t(s, d, "orders").select("o_orderkey", "o_custkey")),
        col("l_orderkey") === col("o_orderkey"))
      .join(broadcast(supp), col("l_suppkey") === col("s_suppkey"))
      .join(broadcast(cust), col("o_custkey") === col("c_custkey"))
      .filter(pair)
      .groupBy(col("supp_nation"), col("cust_nation"),
        year(col("l_shipdate")).as("l_year"))
      .agg(round(revenueDec.cast("double"), 2).as("revenue"))
      .orderBy("supp_nation", "cust_nation", "l_year")
  },
    Some("""SELECT sn.n_name AS supp_nation, cn.n_name AS cust_nation,
           |  CAST(year(l_shipdate) AS INT) AS l_year,
           |  round(CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2)) * (1 - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE), 2) AS revenue
           |FROM lineitem
           |JOIN orders ON l_orderkey = o_orderkey
           |JOIN supplier ON l_suppkey = s_suppkey
           |JOIN customer ON o_custkey = c_custkey
           |JOIN nation sn ON s_nationkey = sn.n_nationkey
           |JOIN nation cn ON c_nationkey = cn.n_nationkey
           |WHERE (sn.n_name = 'NATION_7' AND cn.n_name = 'NATION_12')
           |   OR (sn.n_name = 'NATION_12' AND cn.n_name = 'NATION_7')
           |GROUP BY sn.n_name, cn.n_name, year(l_shipdate)
           |ORDER BY supp_nation, cust_nation, l_year""".stripMargin))

  /** Q121 (TPC-H Q8 form, market share): one nation's (NATION_7) share of ASIA
    * revenue per year — conditional DECIMAL sum over total, division only
    * at the rounded output edge. Same broadcast snowflake as q92 plus the
    * two-sided nation attribution. */
  val q121 = GQuery("q121_market_share", (s, d) => {
    val asiaCust = t(s, d, "customer").select("c_custkey", "c_nationkey")
      .join(broadcast(t(s, d, "nation")
          .join(broadcast(t(s, d, "region").filter(col("r_name") === "ASIA")),
            col("n_regionkey") === col("r_regionkey"))
          .select("n_nationkey")),
        col("c_nationkey") === col("n_nationkey"))
      .select("c_custkey")
    val suppNation = t(s, d, "supplier").select("s_suppkey", "s_nationkey")
      .join(broadcast(t(s, d, "nation").select("n_nationkey", "n_name")),
        col("s_nationkey") === col("n_nationkey"))
      .select(col("s_suppkey"), col("n_name").as("supp_nation"))
    val rev = col("l_extendedprice").cast("decimal(18,2)") *
      (lit(1) - col("l_discount").cast("decimal(18,2)"))
    t(s, d, "lineitem")
      .select("l_orderkey", "l_suppkey", "l_extendedprice", "l_discount")
      .join(broadcast(t(s, d, "orders").select("o_orderkey", "o_custkey", "o_orderdate")),
        col("l_orderkey") === col("o_orderkey"))
      .join(broadcast(asiaCust), col("o_custkey") === col("c_custkey"), "left_semi")
      .join(broadcast(suppNation), col("l_suppkey") === col("s_suppkey"))
      .groupBy(year(col("o_orderdate")).as("o_year"))
      .agg(
        round((sum(when(col("supp_nation") === "NATION_7", rev)
            .otherwise(lit(0).cast("decimal(18,2)"))) * 100).cast("double")
          / sum(rev).cast("double"), 6).as("mkt_share_pct"),
        round(sum(rev).cast("double"), 2).as("total_revenue"))
      .orderBy("o_year")
  },
    Some("""WITH asia_cust AS (
           |  SELECT c_custkey FROM customer
           |  JOIN nation ON c_nationkey = n_nationkey
           |  JOIN region ON n_regionkey = r_regionkey
           |  WHERE r_name = 'ASIA')
           |SELECT CAST(year(o_orderdate) AS INT) AS o_year,
           |  round(CAST(sum(CASE WHEN n_name = 'NATION_7'
           |                 THEN CAST(l_extendedprice AS DECIMAL(18,2)) * (1 - CAST(l_discount AS DECIMAL(18,2)))
           |                 ELSE CAST(0 AS DECIMAL(18,2)) END) * 100 AS DOUBLE)
           |    / CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2)) * (1 - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE), 6) AS mkt_share_pct,
           |  round(CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2)) * (1 - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE), 2) AS total_revenue
           |FROM lineitem
           |JOIN orders ON l_orderkey = o_orderkey
           |JOIN supplier ON l_suppkey = s_suppkey
           |JOIN nation ON s_nationkey = n_nationkey
           |WHERE o_custkey IN (SELECT c_custkey FROM asia_cust)
           |GROUP BY year(o_orderdate) ORDER BY o_year""".stripMargin))

  /** Q135 (TPC-H Q16 form, supplier count by part attributes): how many
    * distinct suppliers can deliver each surviving (brand, type, size)
    * combination. No partsupp table in this schema — the (part, supplier)
    * relation comes from shipped lineitems, reduced to DISTINCT pairs
    * BEFORE the dimension join. "Complaint" suppliers (negative balance —
    * this schema's stand-in) leave via a broadcast anti join; the part
    * attribute cuts ride the broadcast build side. One distinct shuffle on
    * the slim pair relation, one count-distinct agg — the fact table never
    * shuffles full-width. */
  val q135 = GQuery("q135_supplier_part_types", (s, d) => {
    val parts = t(s, d, "part")
      .filter(col("p_brand") =!= "Brand#3" &&
        !col("p_type").startsWith("ECONOMY") &&
        col("p_size").isin(1, 5, 9, 14, 23, 36, 45))
      .select("p_partkey", "p_brand", "p_type", "p_size")
    val complaints = t(s, d, "supplier")
      .filter(col("s_acctbal") < 0).select("s_suppkey")
    // the selective part cut (7 of 50 sizes + brand/type) applies BEFORE
    // the distinct, so the pair-dedup shuffle carries ~14% of the pairs
    val pairs = t(s, d, "lineitem").select("l_partkey", "l_suppkey")
      .join(broadcast(parts), col("l_partkey") === col("p_partkey"))
      .distinct()
    pairs
      .join(broadcast(complaints), col("l_suppkey") === col("s_suppkey"), "left_anti")
      .groupBy("p_brand", "p_type", "p_size")
      .agg(countDistinct(col("l_suppkey")).as("supplier_cnt"))
      .orderBy(col("supplier_cnt").desc, col("p_brand"), col("p_type"), col("p_size"))
  },
    Some("""SELECT p_brand, p_type, p_size, count(DISTINCT l_suppkey) AS supplier_cnt
           |FROM (SELECT DISTINCT l_partkey, l_suppkey FROM lineitem)
           |JOIN part ON p_partkey = l_partkey
           |WHERE p_brand <> 'Brand#3' AND p_type NOT LIKE 'ECONOMY%'
           |  AND p_size IN (1, 5, 9, 14, 23, 36, 45)
           |  AND l_suppkey NOT IN (SELECT s_suppkey FROM supplier WHERE s_acctbal < 0)
           |GROUP BY p_brand, p_type, p_size
           |ORDER BY supplier_cnt DESC, p_brand, p_type, p_size""".stripMargin))

  /** Q136 (TPC-H Q20 form, heavy-shipper promotion): suppliers who moved
    * more than 50 units of any red part during 1996 — the nested
    * semi-join chain (part filter → per-(supplier, part) quantity
    * aggregate → threshold → supplier semi join). The aggregate runs on a
    * 2-column slice with the part cut applied as a broadcast semi join
    * BEFORE the shuffle; the HAVING kills most groups; supplier
    * membership is a broadcast semi join of the tiny survivor set. */
  val q136 = GQuery("q136_heavy_shippers", (s, d) => {
    val redParts = t(s, d, "part")
      .filter(col("p_name").contains("red")).select("p_partkey")
    val heavy = t(s, d, "lineitem")
      .filter(col("l_shipdate") >= "1996-01-01" && col("l_shipdate") < "1997-01-01")
      .select("l_partkey", "l_suppkey", "l_quantity")
      .join(broadcast(redParts), col("l_partkey") === col("p_partkey"), "left_semi")
      .groupBy("l_suppkey", "l_partkey")
      .agg(sum(col("l_quantity").cast("decimal(18,2)")).as("qty"))
      .filter(col("qty") > 50)
      .select("l_suppkey").distinct()
    t(s, d, "supplier")
      .join(broadcast(heavy), col("s_suppkey") === col("l_suppkey"), "left_semi")
      .select("s_suppkey", "s_name")
      .orderBy("s_suppkey")
  },
    Some("""SELECT s_suppkey, s_name FROM supplier
           |WHERE s_suppkey IN (
           |  SELECT l_suppkey FROM lineitem
           |  WHERE l_shipdate >= DATE '1996-01-01' AND l_shipdate < DATE '1997-01-01'
           |    AND l_partkey IN (SELECT p_partkey FROM part WHERE p_name LIKE '%red%')
           |  GROUP BY l_suppkey, l_partkey
           |  HAVING sum(CAST(l_quantity AS DECIMAL(18,2))) > 50)
           |ORDER BY s_suppkey""".stripMargin))

  /** Q137 (TPC-H Q9 form, product-type profit): per-(nation, year) profit
    * on bolt parts — revenue minus cost, where cost substitutes
    * 10% of part retail price × quantity (no partsupp/supplycost in this
    * schema; the substitution is identical on both engines so the check
    * stays exact). All three dimensions broadcast; the fact is cut to
    * bolt parts by a broadcast semi join at the scan edge; one 2-key agg
    * shuffle. Profit accumulates in DECIMAL and surfaces rounded. */
  val q137 = GQuery("q137_nation_profit", (s, d) => {
    val boltParts = t(s, d, "part")
      .filter(col("p_name").contains("bolt"))
      .select("p_partkey", "p_retailprice")
    val suppNation = t(s, d, "supplier").select("s_suppkey", "s_nationkey")
      .join(broadcast(t(s, d, "nation").select("n_nationkey", "n_name")),
        col("s_nationkey") === col("n_nationkey"))
      .select(col("s_suppkey"), col("n_name").as("nation"))
    val profit =
      col("l_extendedprice").cast("decimal(18,2)") *
        (lit(1) - col("l_discount").cast("decimal(18,2)")) -
        (col("p_retailprice").cast("decimal(18,2)") *
          col("l_quantity").cast("decimal(18,2)") * lit(0.1).cast("decimal(3,1)"))
    t(s, d, "lineitem")
      .select("l_partkey", "l_suppkey", "l_shipdate",
        "l_extendedprice", "l_discount", "l_quantity")
      .join(broadcast(boltParts), col("l_partkey") === col("p_partkey"))
      .join(broadcast(suppNation), col("l_suppkey") === col("s_suppkey"))
      .groupBy(col("nation"), year(col("l_shipdate")).as("o_year"))
      .agg(round(sum(profit).cast("double"), 2).as("profit"))
      .orderBy(col("nation"), col("o_year").desc)
  },
    Some("""SELECT n_name AS nation, CAST(year(l_shipdate) AS INT) AS o_year,
           |  round(CAST(sum(
           |    CAST(l_extendedprice AS DECIMAL(18,2)) * (1 - CAST(l_discount AS DECIMAL(18,2)))
           |    - CAST(p_retailprice AS DECIMAL(18,2)) * CAST(l_quantity AS DECIMAL(18,2))
           |      * CAST(0.1 AS DECIMAL(3,1))) AS DOUBLE), 2) AS profit
           |FROM lineitem
           |JOIN part ON p_partkey = l_partkey
           |JOIN supplier ON s_suppkey = l_suppkey
           |JOIN nation ON n_nationkey = s_nationkey
           |WHERE p_name LIKE '%bolt%'
           |GROUP BY n_name, year(l_shipdate)
           |ORDER BY nation, o_year DESC""".stripMargin))

  val all: Seq[GQuery] = Seq(q90, q91, q92, q93, q94, q95, q96, q97, q98,
    q99, q100, q101, q102, q111, q112, q113, q114, q117, q118, q119, q120,
    q121, q135, q136, q137)
}
