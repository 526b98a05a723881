package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{LongType, StringType, StructField, StructType}

import graft.Tables

/** Declared queries Q126+: the scalar/collection function surface tier —
  * array higher-order functions, positional UNNEST, schema'd JSON parse,
  * mergeable distinct sketches, FILTER-clause aggregates, forward fill.
  *
  * These are the everyday Trino functions a user of the reference stack
  * reaches for in SQL Lab (`/root/reference/README.md:42-46` exposes ad-hoc
  * SQL through Superset; Trino ships `transform`/`filter`/`reduce`,
  * `UNNEST WITH ORDINALITY`, `json_extract` + casts, `approx_distinct`,
  * `count(x) FILTER (WHERE ...)` as first-class SQL). Each is re-expressed
  * as the Spark-native equivalent — codegen'd HOF expressions, `posexplode`,
  * `from_json` with an explicit schema (never schema inference), DataSketches
  * HLL aggregates, `when`-guarded aggregates — and oracle-checked against
  * DuckDB's own spelling of the same semantics.
  */
object SurfaceQueries {

  private def t(s: SparkSession, d: String, n: String): DataFrame = Tables.load(s, d, n)

  /** DuckDB twin of the Spark-side whitespace tokenizer (see CorpusQueries). */
  private val tokensSql = "string_split_regex(lower(trim(text)), '\\s+')"

  /** Q126 (F11, array higher-order functions): per-document token-length
    * profile computed entirely inside array expressions — `transform` to
    * lengths, `filter` for long tokens, `aggregate` (fold) for the total —
    * with zero explodes and zero shuffles before the display sort. This is
    * the Trino `transform`/`filter`/`reduce` lambda surface; in Spark these
    * lower to codegen'd HigherOrderFunction expressions over the in-row
    * array, so a 100 TB corpus pays one narrow map, never a row-multiplying
    * explode→groupBy round trip. */
  val q126 = GQuery("q126_array_hofs", (s, d) => {
    val words = split(lower(trim(col("text"))), "\\s+")
    val lens  = transform(words, w => length(w))
    t(s, d, "documents")
      .select(col("doc_id"),
        size(words).as("n_tokens"),
        size(filter(lens, l => l >= 8)).as("n_long"),
        aggregate(lens, lit(0L), (acc, l) => acc + l.cast(LongType)).as("total_chars"),
        array_max(lens).cast(LongType).as("max_len"))
      .orderBy("doc_id")
  },
    Some(s"""SELECT doc_id,
            |  CAST(len(w) AS INT) AS n_tokens,
            |  CAST(len(list_filter(list_transform(w, x -> len(x)), l -> l >= 8)) AS INT) AS n_long,
            |  CAST(list_sum(list_transform(w, x -> len(x))) AS BIGINT) AS total_chars,
            |  CAST(list_max(list_transform(w, x -> len(x))) AS BIGINT) AS max_len
            |FROM (SELECT doc_id, $tokensSql AS w FROM documents)
            |ORDER BY doc_id""".stripMargin))

  /** Q127 (F12, positional UNNEST): `posexplode` — Trino's
    * `UNNEST ... WITH ORDINALITY` — emitting (doc_id, pos, token) with the
    * element's 0-based position. Restricted to short documents so the
    * oracle row count stays bounded; the position comes from the explode
    * generator itself (exact, order-defined), never from a window over an
    * exploded set (which would add a sort exchange for something the
    * generator already knows). */
  val q127 = GQuery("q127_unnest_ordinality", (s, d) => {
    val words = split(lower(trim(col("text"))), "\\s+")
    t(s, d, "documents")
      .where(col("doc_id") < 50)
      .select(col("doc_id"), posexplode(words).as(Seq("pos", "token")))
      .select(col("doc_id"), col("pos").cast(LongType).as("pos"), col("token"))
      .orderBy("doc_id", "pos")
  },
    Some(s"""SELECT doc_id, CAST(g.i AS BIGINT) AS pos, w[g.i + 1] AS token
            |FROM (SELECT doc_id, $tokensSql AS w FROM documents WHERE doc_id < 50),
            |     LATERAL (SELECT unnest(range(len(w))) AS i) g
            |ORDER BY doc_id, pos""".stripMargin))

  /** Q128 (F13, schema'd JSON parse): `from_json` with an explicit struct
    * schema — the declared-schema discipline (§1.3): at 100 TB, schema
    * inference is a full extra pass, so the schema is always stated. The
    * struct field is read typed (BIGINT, no string round-trip) and a field
    * absent from the document reads as NULL, which the aggregate witnesses:
    * `missing_nulls` counts rows whose absent field correctly parsed to
    * NULL. Contrast with q22's `get_json_object` path extraction — this is
    * the typed half of the JSON surface (Trino `json_value` / CAST over
    * `json_parse`). */
  val q128 = GQuery("q128_json_typed", (s, d) => {
    val schema = StructType(Seq(
      StructField("k", LongType), StructField("absent", StringType)))
    t(s, d, "events")
      .select(col("event_type"), from_json(col("props"), schema).as("j"))
      .groupBy("event_type")
      .agg(count(lit(1)).as("cnt"),
        sum(col("j.k")).as("sum_k"),
        count(when(col("j.absent").isNull, 1)).as("missing_nulls"))
      .orderBy("event_type")
  },
    Some("""SELECT event_type, count(*) AS cnt,
           |  CAST(SUM(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS BIGINT) AS sum_k,
           |  count(*) FILTER (WHERE json_extract_string(props, '$.absent') IS NULL) AS missing_nulls
           |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin))

  /** Q129 (A15, mergeable distinct sketches): Apache DataSketches HLL via
    * `hll_sketch_agg` / `hll_union_agg` — the Trino `approx_distinct` /
    * Superset "approx distinct" counterpart, and the mechanism behind
    * mergeable rollup tables: per-nation sketches built in one pass merge
    * into the global sketch WITHOUT rescanning the fact (the partial-agg
    * property materialized views need). The gate is a recall-style
    * contract (the q30 pattern): both the direct global estimate and the
    * merged-from-parts estimate must land within 5% of the exact distinct
    * count, which DuckDB recomputes exactly. A sketch regression flips
    * either boolean red. */
  val q129 = GQuery("q129_hll_mergeable", (s, d) => {
    val cust = t(s, d, "orders").select(col("o_custkey"), col("o_orderstatus"))
    val perStatus = cust.groupBy(col("o_orderstatus"))
      .agg(hll_sketch_agg(col("o_custkey")).as("sk"))
    val merged = perStatus.agg(
      hll_sketch_estimate(hll_union_agg(col("sk"))).as("merged_est"))
    val direct = cust.agg(
      hll_sketch_estimate(hll_sketch_agg(col("o_custkey"))).as("direct_est"),
      countDistinct(col("o_custkey")).as("exact_cnt"))
    direct.crossJoin(merged)
      .select(col("exact_cnt"),
        (abs(col("direct_est") - col("exact_cnt")) <= col("exact_cnt") * 0.05)
          .as("direct_ok"),
        (abs(col("merged_est") - col("exact_cnt")) <= col("exact_cnt") * 0.05)
          .as("merged_ok"))
  },
    Some("""SELECT count(DISTINCT o_custkey) AS exact_cnt,
           |  true AS direct_ok, true AS merged_ok
           |FROM orders""".stripMargin))

  /** Q130 (A16, FILTER-clause aggregates): conditional aggregation through
    * the SQL surface — `count/sum FILTER (WHERE ...)` per nation, the
    * idiom Trino users write for multi-measure one-pass rollups (one scan,
    * one shuffle, N measures; never N self-joining subqueries). Spark
    * lowers FILTER to the same `when`-guarded partial aggregate the
    * DataFrame `sum(when(...))` form produces. Sums stay DECIMAL
    * internally (order-independent) and surface rounded. */
  val q130 = GQuery("q130_filtered_agg", (s, d) => {
    t(s, d, "orders").createOrReplaceTempView("fa_orders")
    t(s, d, "customer").createOrReplaceTempView("fa_customer")
    s.sql("""SELECT c_nationkey,
            |  count(*) AS n_orders,
            |  count(*) FILTER (WHERE o_orderstatus = 'F') AS n_filled,
            |  round(CAST(sum(CAST(o_totalprice AS DECIMAL(18,2)))
            |        FILTER (WHERE o_orderpriority = '1-URGENT') AS DOUBLE), 2) AS urgent_total,
            |  count(DISTINCT o_custkey) FILTER (WHERE o_totalprice > 100000) AS big_spenders
            |FROM fa_orders JOIN fa_customer ON o_custkey = c_custkey
            |GROUP BY c_nationkey ORDER BY c_nationkey""".stripMargin)
  },
    Some("""SELECT c_nationkey,
           |  count(*) AS n_orders,
           |  count(*) FILTER (WHERE o_orderstatus = 'F') AS n_filled,
           |  round(CAST(sum(CAST(o_totalprice AS DECIMAL(18,2)))
           |        FILTER (WHERE o_orderpriority = '1-URGENT') AS DOUBLE), 2) AS urgent_total,
           |  count(DISTINCT o_custkey) FILTER (WHERE o_totalprice > 100000) AS big_spenders
           |FROM orders JOIN customer ON o_custkey = c_custkey
           |GROUP BY c_nationkey ORDER BY c_nationkey""".stripMargin))

  /** Q131 (W9, forward fill): carry the last observed purchase value
    * forward over each user's event timeline — `last(..., ignoreNulls)`
    * over a running frame, Trino's `last_value(x IGNORE NULLS)`. The gap-
    * filling idiom for sparse measurements (sensor readings, prices,
    * checkpoint metrics). The window is user-partitioned with a total
    * (ts, event_id) order, so state per partition is one value and no
    * global sort or single-partition window exists anywhere in the plan. */
  val q131 = GQuery("q131_forward_fill", (s, d) => {
    val w = Window.partitionBy(col("user_id"))
      .orderBy(col("ts"), col("event_id"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val purchase = when(col("event_type") === "purchase", col("value"))
    t(s, d, "events")
      .select(col("user_id"), col("event_id"),
        // Rows before the user's first purchase have nothing to carry:
        // surface those as -1 (a value outside the domain) so the gate
        // compares a total function, not NULL-vs-NULL floats.
        round(coalesce(last(purchase, ignoreNulls = true).over(w), lit(-1d)), 2)
          .as("last_purchase"))
      .orderBy("user_id", "event_id")
  },
    Some("""SELECT user_id, event_id,
           |  round(coalesce(last_value(CASE WHEN event_type = 'purchase' THEN value END IGNORE NULLS)
           |    OVER (PARTITION BY user_id ORDER BY ts, event_id
           |          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), -1), 2) AS last_purchase
           |FROM events ORDER BY user_id, event_id""".stripMargin))

  /** Q132 (B1⁗, chart contribution mode): Superset's "contribution"
    * postprocessing — each series' metric becomes its share of the
    * per-timestamp total, the stacked-percentage timeseries chart. The
    * share window partitions by the grain timestamp (one partition per
    * day, bounded by series count) — higher grain cardinality means more
    * parallelism, never a global window (plan-locked in ChartCompilerSpec).
    * Shares are ratios of two double sums, stable to 1e-15; rounded to 6. */
  val q132 = GQuery("q132_chart_contribution", (s, d) => {
    graft.bi.ChartCompiler.compile(s,
      graft.bi.ChartSpec(datasource = "events", queryMode = "aggregate",
        groupby = Seq("event_type"),
        metrics = Seq(graft.bi.Metric("sum", Some("value"), "total_value")),
        timeColumn = Some("ts"), timeGrain = Some("day"),
        contribution = true,
        orderBy = Seq(("__timestamp", true), ("event_type", true)),
        rowLimit = 1000),
      n => t(s, d, n))
      .select(col("__timestamp"), col("event_type"),
        round(col("contrib_total_value"), 6).as("contrib"))
      .orderBy("__timestamp", "event_type")
  },
    Some("""SELECT date_trunc('day', CAST(ts AS TIMESTAMP)) AS __timestamp, event_type,
           |  round(sum(value) / sum(sum(value))
           |    OVER (PARTITION BY date_trunc('day', CAST(ts AS TIMESTAMP))), 6) AS contrib
           |FROM events GROUP BY 1, 2 ORDER BY __timestamp, event_type LIMIT 1000""".stripMargin))

  /** Q133 (L7, hidden partition transforms): write events under the
    * Iceberg `days(ts)` transform, then answer a timestamp-range query
    * through the transform-aware reader — the predicate is stated on the
    * SOURCE column, widened to whole-day partition pruning
    * (PartitionFilters in the plan, locked in LayoutSpec), with the exact
    * residual on the survivors. At 100 TB this is the difference between
    * scanning 7 partition directories and scanning the table. */
  val q133 = GQuery("q133_partition_pruning", (s, d) => {
    val dir = java.nio.file.Files.createTempDirectory("graft_days").toString
    graft.engine.Layout.writeDaysTransform(t(s, d, "events"), "ts", dir)
    graft.engine.Layout
      .readDaysTransform(s, dir, "ts", "2024-01-05 12:00:00", "2024-01-12 00:00:00")
      .groupBy("event_type")
      .agg(count(lit(1)).as("cnt"),
        round(sum(col("value")), 2).as("sum_value"))
      .orderBy("event_type")
  },
    Some("""SELECT event_type, count(*) AS cnt, round(sum(value), 2) AS sum_value
           |FROM events
           |WHERE CAST(ts AS TIMESTAMP) >= TIMESTAMP '2024-01-05 12:00:00'
           |  AND CAST(ts AS TIMESTAMP) <  TIMESTAMP '2024-01-12 00:00:00'
           |GROUP BY event_type ORDER BY event_type""".stripMargin))

  /** Q134 (L8, metadata tables): the `$partitions` inspection surface over
    * a `days(ts)`-partitioned table — per-partition record counts read
    * from parquet FOOTERS only (distributed footer reads, zero data
    * pages; see MetaTables). The oracle recomputes the per-day counts
    * from the raw rows, so a footer-stats bug cannot hide. */
  val q134 = GQuery("q134_partitions_metadata", (s, d) => {
    val dir = java.nio.file.Files.createTempDirectory("graft_meta").toString
    graft.engine.Layout.writeDaysTransform(t(s, d, "events"), "ts", dir)
    graft.engine.MetaTables.partitionsMetadata(s, dir)
      .select(regexp_extract(col("partition"), "p_day=(.*)", 1).as("day"),
        col("record_count"))
      .orderBy("day")
  },
    Some("""SELECT strftime(CAST(ts AS TIMESTAMP), '%Y-%m-%d') AS day,
           |  count(*) AS record_count
           |FROM events GROUP BY 1 ORDER BY day""".stripMargin))

  /** Q138 (A17, count-min sketch frequencies): CMS point-frequency
    * estimation — Trino `approx_most_frequent`'s underlying sketch — with
    * the estimates gated by CMS's own guarantee (est ≥ exact, and
    * est ≤ exact + ε·N at the sketch's confidence), which DuckDB states
    * from exact counts (the q129 contract pattern). The sketch build is
    * one distributed aggregate; only the bounded top-20 key list and the
    * kilobyte-sized sketch ever touch the driver (a metadata-sized
    * collect, not a data loop). Deterministic seed → reproducible gate. */
  val q138 = GQuery("q138_cms_frequency", (s, d) => {
    val events = t(s, d, "events")
    val eps = 0.001
    val total = events.count()
    val sketch = events.stat.countMinSketch(col("user_id"), eps, 0.99, 42)
    val top = events.groupBy("user_id").agg(count(lit(1)).as("exact_cnt"))
      .orderBy(col("exact_cnt").desc, col("user_id")).limit(20).collect()
    val rows = top.toSeq.map { r =>
      val uid = r.getLong(0); val exact = r.getLong(1)
      val est = sketch.estimateCount(uid)
      (uid, exact, est >= exact && est <= exact + math.ceil(eps * total).toLong)
    }
    import s.implicits._
    rows.toDF("user_id", "exact_cnt", "within_bounds")
      .orderBy(col("exact_cnt").desc, col("user_id"))
  },
    Some("""SELECT user_id, count(*) AS exact_cnt, true AS within_bounds
           |FROM events GROUP BY user_id
           |ORDER BY exact_cnt DESC, user_id LIMIT 20""".stripMargin))

  /** Q139 (F15, string-function breadth): the everyday Trino string surface
    * in one pass — case mapping, padding, reverse, global regexp replace,
    * substring position, repetition, delimiter concat — as a pure narrow
    * projection (zero shuffles before the display sort; every function is
    * a codegen'd built-in). DuckDB twin note: its `regexp_replace` needs
    * the explicit 'g' flag to match Spark's replace-all semantics. */
  val q139 = GQuery("q139_string_breadth", (s, d) => {
    t(s, d, "part")
      .filter(col("p_partkey") < 500)
      .select(col("p_partkey"),
        upper(col("p_name")).as("up_name"),
        lpad(col("p_brand"), 10, "*").as("brand_pad"),
        reverse(col("p_type")).as("type_rev"),
        regexp_replace(col("p_name"), "[aeiou]", "").as("no_vowels"),
        instr(col("p_name"), "e").cast(LongType).as("first_e"),
        concat_ws("|", col("p_brand"), col("p_type")).as("brand_type"),
        repeat(substring(col("p_name"), 1, 3), 2).as("prefix_x2"),
        length(col("p_name")).cast(LongType).as("name_len"))
      .orderBy("p_partkey")
  },
    Some("""SELECT p_partkey,
           |  upper(p_name) AS up_name,
           |  lpad(p_brand, 10, '*') AS brand_pad,
           |  reverse(p_type) AS type_rev,
           |  regexp_replace(p_name, '[aeiou]', '', 'g') AS no_vowels,
           |  CAST(strpos(p_name, 'e') AS BIGINT) AS first_e,
           |  concat_ws('|', p_brand, p_type) AS brand_type,
           |  repeat(p_name[1:3], 2) AS prefix_x2,
           |  CAST(len(p_name) AS BIGINT) AS name_len
           |FROM part WHERE p_partkey < 500 ORDER BY p_partkey""".stripMargin))

  /** Q140 (F16, datetime-function breadth): the calendar arithmetic surface
    * — month truncation, end-of-month, month offsets, day differences,
    * quarter/ISO-week/weekday extraction — again one narrow projection of
    * codegen'd built-ins. Weekday is normalized to ISO (1=Monday) since
    * engines disagree on week-start conventions. */
  val q140 = GQuery("q140_datetime_breadth", (s, d) => {
    val dt = to_date(col("o_orderdate"))
    t(s, d, "orders")
      .filter(col("o_orderkey") < 5000)
      .select(col("o_orderkey"),
        date_trunc("month", col("o_orderdate")).cast("date").as("month_start"),
        last_day(dt).as("eom"),
        add_months(dt, 3).as("plus3m"),
        datediff(lit("2000-01-01").cast("date"), dt).cast(LongType).as("days_to_y2k"),
        quarter(dt).cast(LongType).as("qtr"),
        weekofyear(dt).cast(LongType).as("iso_week"),
        dayofweek(dt).cast(LongType).as("dow_sun1"))
      .orderBy("o_orderkey")
  },
    Some("""SELECT o_orderkey,
           |  CAST(date_trunc('month', o_orderdate) AS DATE) AS month_start,
           |  last_day(CAST(o_orderdate AS DATE)) AS eom,
           |  CAST(CAST(o_orderdate AS DATE) + INTERVAL 3 MONTH AS DATE) AS plus3m,
           |  date_diff('day', CAST(o_orderdate AS DATE), DATE '2000-01-01') AS days_to_y2k,
           |  CAST(quarter(o_orderdate) AS BIGINT) AS qtr,
           |  CAST(weekofyear(CAST(o_orderdate AS DATE)) AS BIGINT) AS iso_week,
           |  CAST(dayofweek(CAST(o_orderdate AS DATE)) + 1 AS BIGINT) AS dow_sun1
           |FROM orders WHERE o_orderkey < 5000 ORDER BY o_orderkey""".stripMargin))

  /** Q141 (A18, sliding-window distinct / WAU): 7-day rolling distinct
    * users per day — exact AND via mergeable HLL sketches, side by side.
    * Exact path: per-(day, user) dedup (one slim shuffle) → each pair
    * contributes to the 7 windows ending day..day+6 (a 7× explode of the
    * ALREADY-DEDUPED pairs, not raw events) → per-window distinct.
    * Sketch path: ONE sketch per day (30 rows), the same 7× explode over
    * sketch rows only, `hll_union_agg` per window — this is why sketches
    * matter at 100 TB: the nightly rollup stores 30 kilobyte-sized
    * sketches, and ANY window size re-aggregates from them without
    * touching raw data. Gate: exact counts hash-checked; sketch estimate
    * within 5% of exact on every window (contract column). */
  val q141 = GQuery("q141_sliding_wau", (s, d) => {
    val events = t(s, d, "events").select(to_date(col("ts")).as("day"), col("user_id"))
    val offsets = explode(sequence(lit(0), lit(6))).as("k")
    val days = events.select("day").distinct()
    val exact = events.distinct()
      .select(offsets, col("day"), col("user_id"))
      .select(date_add(col("day"), col("k")).as("wend"), col("user_id"))
      .groupBy("wend").agg(countDistinct(col("user_id")).as("wau"))
    val sketched = events
      .groupBy("day").agg(hll_sketch_agg(col("user_id")).as("sk"))
      .select(offsets, col("day"), col("sk"))
      .select(date_add(col("day"), col("k")).as("wend"), col("sk"))
      .groupBy("wend").agg(hll_sketch_estimate(hll_union_agg(col("sk"))).as("est"))
    exact.join(sketched, "wend")
      .join(days, col("wend") === col("day"), "left_semi") // only real days
      .select(col("wend").as("day"), col("wau"),
        (abs(col("est") - col("wau")) <= col("wau") * 0.05).as("hll_ok"))
      .orderBy("day")
  },
    Some("""WITH du AS (SELECT DISTINCT CAST(CAST(ts AS TIMESTAMP) AS DATE) AS day, user_id
           |            FROM events),
           |days AS (SELECT DISTINCT day FROM du)
           |SELECT d.day, count(DISTINCT u.user_id) AS wau, true AS hll_ok
           |FROM days d JOIN du u ON u.day BETWEEN d.day - 6 AND d.day
           |GROUP BY d.day ORDER BY d.day""".stripMargin))

  /** Q142 (B1⁙, chart rolling window): Superset's "rolling mean"
    * postprocessing — each series' metric smoothed over its last 7 grain
    * periods. The frame is a ROWS window over the ALREADY-GROUPED result,
    * partitioned by the series dims (bounded by periods × series — never
    * the raw fact), composing with everything else in the compiler. */
  val q142 = GQuery("q142_chart_rolling", (s, d) => {
    graft.bi.ChartCompiler.compile(s,
      graft.bi.ChartSpec(datasource = "events", queryMode = "aggregate",
        groupby = Seq("event_type"),
        metrics = Seq(graft.bi.Metric("count", None, "cnt")),
        timeColumn = Some("ts"), timeGrain = Some("day"),
        rollingWindow = Some(7), rowLimit = 1000),
      n => t(s, d, n))
      .select(col("__timestamp"), col("event_type"), col("cnt"),
        round(col("cnt__rolling"), 6).as("rolling_cnt"))
      .orderBy("__timestamp", "event_type")
  },
    Some("""SELECT date_trunc('day', CAST(ts AS TIMESTAMP)) AS __timestamp,
           |  event_type, count(*) AS cnt,
           |  round(avg(count(*)) OVER (PARTITION BY event_type
           |    ORDER BY date_trunc('day', CAST(ts AS TIMESTAMP))
           |    ROWS BETWEEN 6 PRECEDING AND CURRENT ROW), 6) AS rolling_cnt
           |FROM events GROUP BY 1, 2 ORDER BY __timestamp, event_type
           |LIMIT 1000""".stripMargin))

  /** Q143 (A19, approximate percentiles): `percentile_approx` (Greenwald-
    * Khanna style quantile summary — Trino `approx_percentile`) gated by a
    * rank-neighborhood contract: the approximate p50/p95 must land between
    * the EXACT p45–p55 / p93–p97, which Spark computes in the same pass
    * and DuckDB states from its own exact quantiles (q129 pattern). The
    * hash-checked value is the exact interpolated median, so the check is
    * bit-for-bit where exactness is possible and contractual where not. */
  val q143 = GQuery("q143_approx_percentile", (s, d) => {
    t(s, d, "events").groupBy("event_type")
      .agg(
        round(expr("percentile(value, 0.5D)"), 6).as("exact_p50"),
        (expr("approx_percentile(value, 0.5D, 10000)")
          .between(expr("percentile(value, 0.45D)"),
            expr("percentile(value, 0.55D)"))).as("ok50"),
        (expr("approx_percentile(value, 0.95D, 10000)")
          .between(expr("percentile(value, 0.93D)"),
            expr("percentile(value, 0.97D)"))).as("ok95"))
      .orderBy("event_type")
  },
    Some("""SELECT event_type, round(quantile_cont(value, 0.5), 6) AS exact_p50,
           |  true AS ok50, true AS ok95
           |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin))

  /** Q144 (D8, SCD Type 2 + point-in-time join): build a slowly-changing
    * dimension from a change log — each user's signup events become
    * validity intervals `[ts, next-signup-ts)` via a user-keyed `lead`
    * window — then join facts (purchases) to the version VALID AT the
    * fact's own time. The join keeps the user equi-key, so the interval
    * predicate is a residual on a hash join, never a blocked cross
    * product; the dimension build is one user-keyed window. This is the
    * canonical warehouse history pattern the as-of join (Q50) special-
    * cases. */
  val q144 = GQuery("q144_scd2_point_in_time", (s, d) => {
    val events = t(s, d, "events")
    val w = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
    val dim = events.filter(col("event_type") === "signup")
      .select(col("user_id").as("d_user"), col("ts").as("valid_from"),
        col("value"))
      .select(col("d_user"), col("valid_from"),
        lead(col("valid_from"), 1).over(
          Window.partitionBy(col("d_user")).orderBy(col("valid_from"))).as("valid_to"),
        when(col("value") < 30, "low").when(col("value") < 70, "mid")
          .otherwise("high").as("tier"))
    val facts = events.filter(col("event_type") === "purchase")
      .select(col("user_id"), col("ts"), col("value"))
    facts.join(dim,
        col("user_id") === col("d_user") &&
          col("ts") >= col("valid_from") &&
          (col("valid_to").isNull || col("ts") < col("valid_to")))
      .groupBy("tier")
      .agg(count(lit(1)).as("purchases"),
        round(sum(col("value")), 2).as("total_value"))
      .orderBy("tier")
  },
    Some("""WITH dim AS (
           |  SELECT user_id AS d_user, CAST(ts AS TIMESTAMP) AS valid_from,
           |    lead(CAST(ts AS TIMESTAMP)) OVER (PARTITION BY user_id
           |      ORDER BY CAST(ts AS TIMESTAMP)) AS valid_to,
           |    CASE WHEN value < 30 THEN 'low' WHEN value < 70 THEN 'mid'
           |         ELSE 'high' END AS tier
           |  FROM events WHERE event_type = 'signup'),
           |facts AS (SELECT user_id, CAST(ts AS TIMESTAMP) AS ts, value
           |          FROM events WHERE event_type = 'purchase')
           |SELECT tier, count(*) AS purchases, round(sum(value), 2) AS total_value
           |FROM facts JOIN dim ON user_id = d_user
           |  AND ts >= valid_from AND (valid_to IS NULL OR ts < valid_to)
           |GROUP BY tier ORDER BY tier""".stripMargin))

  /** Q145 (T11, TF-IDF keyword extraction): top-3 characteristic terms per
    * document — tf·ln(N/df), the classic corpus-keyword op (and the
    * linear-algebra half of BM25, q55's scoring without the length
    * normalization). One explode → (doc, term) count; document frequency
    * is a second, VOCABULARY-sized aggregate broadcast back (at 100 TB
    * vocabulary ≪ corpus, so the broadcast is the right side); top-3 is a
    * doc-keyed rank window with a term tie-break (WindowGroupLimit prunes
    * before the full sort materializes). */
  val q145 = GQuery("q145_tfidf_keywords", (s, d) => {
    val docs = t(s, d, "documents")
    val tf = docs
      .select(col("doc_id"),
        explode(split(lower(trim(col("text"))), "\\s+")).as("term"))
      .groupBy("doc_id", "term").agg(count(lit(1)).as("tf"))
    val docFreq = tf.groupBy("term").agg(count(lit(1)).as("df"))
    val total = docs.agg(count(lit(1)).as("n_docs"))
    val w = Window.partitionBy(col("doc_id"))
      .orderBy(col("score").desc, col("term"))
    tf.join(broadcast(docFreq), "term")
      .crossJoin(broadcast(total))
      .withColumn("score",
        col("tf") * log(col("n_docs").cast("double") / col("df")))
      .withColumn("rk", row_number().over(w))
      .filter(col("rk") <= 3)
      .select(col("doc_id"), col("rk").cast(LongType).as("rk"),
        col("term"), round(col("score"), 6).as("score"))
      .orderBy("doc_id", "rk")
  },
    Some(s"""WITH tok AS (SELECT doc_id, unnest($tokensSql) AS term FROM documents),
            |tf AS (SELECT doc_id, term, count(*) AS tf FROM tok GROUP BY 1, 2),
            |idf AS (SELECT term, count(*) AS df FROM tf GROUP BY 1),
            |n AS (SELECT count(*) AS n_docs FROM documents),
            |scored AS (SELECT doc_id, term,
            |             tf * ln(CAST(n_docs AS DOUBLE) / df) AS score
            |           FROM tf JOIN idf USING (term) CROSS JOIN n),
            |r AS (SELECT doc_id, term, score, row_number() OVER
            |        (PARTITION BY doc_id ORDER BY score DESC, term) AS rk
            |      FROM scored)
            |SELECT doc_id, CAST(rk AS BIGINT) AS rk, term, round(score, 6) AS score
            |FROM r WHERE rk <= 3 ORDER BY doc_id, rk""".stripMargin))

  /** Q146 (B1 composed): the FULL Superset postprocessing stack in one
    * chart — series_limit(3) → percent metrics (of the limited set) →
    * contribution → 7-period rolling mean — verifying the stages compose
    * in Superset's order, not just pass individually. Every stage
    * operates on the grouped result (bounded), and the oracle recomputes
    * the whole pipeline as nested CTEs. */
  val q146 = GQuery("q146_chart_composed", (s, d) => {
    graft.bi.ChartCompiler.compile(s,
      graft.bi.ChartSpec(datasource = "events", queryMode = "aggregate",
        groupby = Seq("event_type"),
        metrics = Seq(graft.bi.Metric("count", None, "cnt")),
        percentMetrics = Seq(graft.bi.Metric("count", None, "cnt")),
        timeColumn = Some("ts"), timeGrain = Some("day"),
        contribution = true, rollingWindow = Some(7),
        seriesLimit = Some(3), rowLimit = 1000),
      n => t(s, d, n))
      .select(col("__timestamp"), col("event_type"), col("cnt"),
        round(col("pct_cnt"), 6).as("pct_cnt"),
        round(col("contrib_cnt"), 6).as("contrib"),
        round(col("cnt__rolling"), 6).as("rolling"))
      .orderBy("__timestamp", "event_type")
  },
    Some("""WITH g AS (SELECT date_trunc('day', CAST(ts AS TIMESTAMP)) AS __timestamp,
           |             event_type, count(*) AS cnt
           |           FROM events GROUP BY 1, 2),
           |top3 AS (SELECT event_type FROM (
           |           SELECT event_type, sum(cnt) AS t FROM g GROUP BY 1
           |           ORDER BY t DESC, event_type LIMIT 3)),
           |l AS (SELECT * FROM g WHERE event_type IN (SELECT event_type FROM top3)),
           |p AS (SELECT *, CAST(cnt AS DOUBLE) / sum(cnt) OVER () AS pct_cnt FROM l),
           |c AS (SELECT *, CAST(cnt AS DOUBLE)
           |        / sum(CAST(cnt AS DOUBLE)) OVER (PARTITION BY __timestamp) AS contrib
           |      FROM p),
           |r AS (SELECT *, avg(CAST(cnt AS DOUBLE)) OVER (PARTITION BY event_type
           |        ORDER BY __timestamp ROWS BETWEEN 6 PRECEDING AND CURRENT ROW) AS roll
           |      FROM c)
           |SELECT __timestamp, event_type, cnt, round(pct_cnt, 6) AS pct_cnt,
           |  round(contrib, 6) AS contrib, round(roll, 6) AS rolling
           |FROM r ORDER BY __timestamp, event_type LIMIT 1000""".stripMargin))

  /** Q147 (L7′, bucket-transform point lookup through the gate): events
    * written under `bucket(8, user_id)`, probed for one user — the
    * predicate is on the SOURCE column; the reader folds its hash to ONE
    * partition directory (1/8 of the table scanned at any scale). The
    * oracle sees only the logical filter, proving transform transparency. */
  val q147 = GQuery("q147_bucket_lookup", (s, d) => {
    val dir = java.nio.file.Files.createTempDirectory("graft_bucket").toString
    graft.engine.Layout.writeBucketTransform(t(s, d, "events"), "user_id", 8, dir)
    graft.engine.Layout.readBucketTransform(s, dir, "user_id", 8, 7L)
      .select(col("event_id"), col("user_id"), col("event_type"),
        round(col("value"), 2).as("value"))
      .orderBy("event_id")
  },
    Some("""SELECT event_id, user_id, event_type, round(value, 2) AS value
           |FROM events WHERE user_id = 7 ORDER BY event_id""".stripMargin))

  /** Q148 (MV2′, incremental MV through the gate): build a summary view
    * over HALF the events, append the other half, refresh — the final MV
    * must equal a full group-by of ALL events, which is exactly what the
    * oracle computes (it never sees the epochs). Measures: additive count
    * (hash-checked) + HLL distinct-user sketch (5% contract). Table names
    * are unique per invocation so reruns in one warehouse don't collide. */
  val q148 = GQuery("q148_mv_estimates", (s, d) => {
    import graft.engine.{Layout, Mview}
    val run = java.util.UUID.randomUUID().toString.replace("-", "").take(8)
    val (src, view) = (s"mvq_src_$run", s"mvq_view_$run")
    val events = t(s, d, "events").select("event_id", "event_type", "user_id")
    val ms = Seq(Mview.Measure("count", None, "n"),
      Mview.Measure("approx_distinct", Some("user_id"), "uniq"))
    events.filter(col("event_id") % 2 === 0).write.saveAsTable(src)
    Mview.create(s, view, src, Seq("event_type"), ms)
    events.filter(col("event_id") % 2 === 1)
      .write.mode("append").saveAsTable(src)
    Mview.refresh(s, view, src, Seq("event_type"), ms)
    val exact = events.groupBy("event_type")
      .agg(countDistinct(col("user_id")).as("__exact_uniq"))
    Mview.read(s, view, Seq("event_type"), ms)
      .join(exact, "event_type")
      .select(col("event_type"), col("n"),
        (abs(col("uniq") - col("__exact_uniq")) <= col("__exact_uniq") * 0.05)
          .as("uniq_ok"))
      .orderBy("event_type")
  },
    Some("""SELECT event_type, count(*) AS n, true AS uniq_ok
           |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin))

  /** Q149 (W10, dense_rank): tie-classes rank consecutively — the gapless
    * twin of q48's `rank` (which skips past ties). Balances bucket to the
    * thousand so ties are guaranteed; ranking by the bucket value makes
    * dense_rank deterministic without a per-row tie-break, and the
    * output aggregates per tie-class so the check is order-free. */
  val q149 = GQuery("q149_dense_rank", (s, d) => {
    val w = Window.partitionBy(col("c_mktsegment")).orderBy(col("bal_k").desc)
    t(s, d, "customer")
      .select(col("c_mktsegment"),
        floor(col("c_acctbal") / 1000).cast(LongType).as("bal_k"))
      .withColumn("dr", dense_rank().over(w))
      .filter(col("dr") <= 2)
      .groupBy("c_mktsegment", "dr", "bal_k")
      .agg(count(lit(1)).as("cnt"))
      .select(col("c_mktsegment"), col("dr").cast(LongType).as("dr"),
        col("bal_k"), col("cnt"))
      .orderBy("c_mktsegment", "dr")
  },
    Some("""WITH b AS (SELECT c_mktsegment,
           |             CAST(floor(c_acctbal / 1000) AS BIGINT) AS bal_k
           |           FROM customer),
           |r AS (SELECT *, dense_rank() OVER (PARTITION BY c_mktsegment
           |        ORDER BY bal_k DESC) AS dr FROM b)
           |SELECT c_mktsegment, CAST(dr AS BIGINT) AS dr, bal_k, count(*) AS cnt
           |FROM r WHERE dr <= 2 GROUP BY 1, 2, 3
           |ORDER BY c_mktsegment, dr""".stripMargin))

  /** Q150 (AN3, rolling z-score anomaly flags): each day's event volume
    * scored against its own trailing 7-day mean/stddev — the standard
    * ops-dashboard anomaly primitive. The frame EXCLUDES the current row
    * (trailing baseline, not self-referential), is partitioned per
    * series, and both engines compute the same sample stddev in IEEE
    * double, so the z-scores compare exactly after rounding. Days whose
    * baseline has <2 points emit a null z (no variance to judge against),
    * surfaced as 0-score non-anomalies. */
  val q150 = GQuery("q150_anomaly_zscore", (s, d) => {
    val daily = t(s, d, "events")
      .groupBy(to_date(col("ts")).as("day"), col("event_type"))
      .agg(count(lit(1)).as("cnt"))
    val w = Window.partitionBy(col("event_type")).orderBy(col("day"))
      .rowsBetween(-7, -1)
    daily
      .withColumn("mu", avg(col("cnt").cast("double")).over(w))
      .withColumn("sd", stddev_samp(col("cnt").cast("double")).over(w))
      // zero/absent variance (constant or <2-point baseline) → z = 0,
      // stated identically on both engines (ANSI division guards)
      .withColumn("z0", when(col("sd").isNull || col("sd") === 0d, lit(0d))
        .otherwise((col("cnt") - col("mu")) / col("sd")))
      .select(col("day"), col("event_type"), col("cnt"),
        round(col("z0"), 6).as("z"), (abs(col("z0")) > 3).as("anomaly"))
      .orderBy("day", "event_type")
  },
    Some("""WITH daily AS (SELECT CAST(CAST(ts AS TIMESTAMP) AS DATE) AS day,
           |                 event_type, count(*) AS cnt
           |               FROM events GROUP BY 1, 2),
           |scored AS (SELECT day, event_type, cnt,
           |  avg(CAST(cnt AS DOUBLE)) OVER trail AS mu,
           |  stddev_samp(CAST(cnt AS DOUBLE)) OVER trail AS sd
           |  FROM daily
           |  WINDOW trail AS (PARTITION BY event_type ORDER BY day
           |                   ROWS BETWEEN 7 PRECEDING AND 1 PRECEDING)),
           |z AS (SELECT day, event_type, cnt,
           |  CASE WHEN sd IS NULL OR sd = 0 THEN 0 ELSE (cnt - mu) / sd END AS z0
           |  FROM scored)
           |SELECT day, event_type, cnt, round(z0, 6) AS z, abs(z0) > 3 AS anomaly
           |FROM z ORDER BY day, event_type""".stripMargin))

  /** Q151 (AN4, market-basket lift): brand pairs bought within the same
    * order, scored by lift = P(ab)/(P(a)·P(b)) — the co-purchase
    * primitive behind "customers also bought". The pair space comes from
    * a SELF-JOIN keyed on the order (never a cross product), deduped to
    * one (order, brand-pair) before counting; marginals are a 25-row
    * broadcast. Support floor keeps noise pairs out. Counting DISTINCT
    * orders per pair makes multiplicities (two parts of one brand in an
    * order) irrelevant — same definition on both engines. */
  val q151 = GQuery("q151_market_basket", (s, d) => {
    val orderBrand = t(s, d, "lineitem").select("l_orderkey", "l_partkey")
      .join(broadcast(t(s, d, "part").select("p_partkey", "p_brand")),
        col("l_partkey") === col("p_partkey"))
      .select(col("l_orderkey"), col("p_brand")).distinct()
    val nOrders = t(s, d, "orders").agg(countDistinct(col("o_orderkey")).as("n"))
    val marg = orderBrand.groupBy("p_brand")
      .agg(count(lit(1)).as("brand_orders"))
    // pair generation is IN-ROW: one order-keyed shuffle builds the sorted
    // brand set (≤ 25 elements), array HOFs emit the C(b,2) ordered pairs
    // — cheaper than the equivalent self-join, which exchanges the pair
    // relation twice and re-hashes every (order, brand) row
    val pairs = orderBrand
      .groupBy("l_orderkey")
      .agg(sort_array(collect_set(col("p_brand"))).as("bs"))
      .select(explode(expr(
        "flatten(transform(bs, (x, i) -> " +
          "transform(slice(bs, i + 2, size(bs)), y -> struct(x AS a, y AS b))))"))
        .as("p"))
      .groupBy(col("p.a").as("brand_a"), col("p.b").as("brand_b"))
      .agg(count(lit(1)).as("pair_orders"))
      .filter(col("pair_orders") >= 50)
    pairs
      .join(broadcast(marg.select(col("p_brand").as("brand_a"),
        col("brand_orders").as("ca"))), "brand_a")
      .join(broadcast(marg.select(col("p_brand").as("brand_b"),
        col("brand_orders").as("cb"))), "brand_b")
      .crossJoin(broadcast(nOrders))
      .select(col("brand_a"), col("brand_b"), col("pair_orders"),
        round(col("pair_orders").cast("double") * col("n")
          / (col("ca") * col("cb")), 6).as("lift"))
      .orderBy(col("lift").desc, col("brand_a"), col("brand_b"))
      .limit(50)
  },
    Some("""WITH ob AS (SELECT DISTINCT l_orderkey, p_brand
           |            FROM lineitem JOIN part ON p_partkey = l_partkey),
           |n AS (SELECT count(DISTINCT o_orderkey) AS n FROM orders),
           |marg AS (SELECT p_brand, count(*) AS brand_orders FROM ob GROUP BY 1),
           |pairs AS (SELECT a.p_brand AS brand_a, b.p_brand AS brand_b,
           |            count(*) AS pair_orders
           |          FROM ob a JOIN ob b ON a.l_orderkey = b.l_orderkey
           |            AND a.p_brand < b.p_brand
           |          GROUP BY 1, 2 HAVING count(*) >= 50)
           |SELECT brand_a, brand_b, pair_orders,
           |  round(CAST(pair_orders AS DOUBLE) * n
           |    / (ma.brand_orders * mb.brand_orders), 6) AS lift
           |FROM pairs
           |JOIN marg ma ON ma.p_brand = brand_a
           |JOIN marg mb ON mb.p_brand = brand_b
           |CROSS JOIN n
           |ORDER BY lift DESC, brand_a, brand_b LIMIT 50""".stripMargin))

  /** Q152 (J6, null-safe equality join): `<=>` — Trino/standard
    * `IS NOT DISTINCT FROM` — where NULL matches NULL as a real key value
    * (the semantics every "join on an optional attribute" query silently
    * needs; a plain `=` drops those rows). Keys are derived with NULLs on
    * error events; the null-safe join routes every error row to the NULL
    * bucket, witnessed by the -1 group in the output. Null-safe equality
    * still hash-partitions (NULL is one key), so the plan is a plain
    * equi-join, not a blocked theta join. */
  val q152 = GQuery("q152_null_safe_join", (s, d) => {
    val k = when(col("event_type") === "error", lit(null).cast(LongType))
      .otherwise(col("user_id") % 10)
    val a = t(s, d, "events")
      .filter(col("event_type").isin("click", "error"))
      .select(col("event_id"), k.as("ka"))
    val b = t(s, d, "events")
      .filter(col("event_type").isin("purchase", "error"))
      .select(k.as("kb")).distinct()
    a.join(b, col("ka") <=> col("kb"))
      .groupBy(coalesce(col("ka"), lit(-1L)).as("k"))
      .agg(count(lit(1)).as("cnt"))
      .orderBy("k")
  },
    Some("""WITH a AS (SELECT event_id,
           |    CASE WHEN event_type = 'error' THEN NULL
           |         ELSE user_id % 10 END AS ka
           |  FROM events WHERE event_type IN ('click', 'error')),
           |b AS (SELECT DISTINCT
           |    CASE WHEN event_type = 'error' THEN NULL
           |         ELSE user_id % 10 END AS kb
           |  FROM events WHERE event_type IN ('purchase', 'error'))
           |SELECT coalesce(ka, -1) AS k, count(*) AS cnt
           |FROM a JOIN b ON a.ka IS NOT DISTINCT FROM b.kb
           |GROUP BY 1 ORDER BY k""".stripMargin))

  /** Q153 (B1⁑, series "Others" rollup): series_limit's contribution-
    * preserving variant — non-top series RELABEL to "Others" and re-merge
    * per timestamp instead of being dropped, so the chart's totals stay
    * whole (the stacked-area "top 3 + Others" every BI tool renders).
    * Re-merge is exact only for additive metrics; the compiler refuses
    * anything else (guarded). */
  val q153 = GQuery("q153_chart_series_others", (s, d) => {
    graft.bi.ChartCompiler.compile(s,
      graft.bi.ChartSpec(datasource = "events", queryMode = "aggregate",
        groupby = Seq("event_type"),
        metrics = Seq(graft.bi.Metric("count", None, "cnt")),
        timeColumn = Some("ts"), timeGrain = Some("day"),
        seriesLimit = Some(2), seriesOthers = true, rowLimit = 1000),
      n => t(s, d, n))
      .select(col("__timestamp"), col("event_type"), col("cnt"))
      .orderBy("__timestamp", "event_type")
  },
    Some("""WITH g AS (SELECT date_trunc('day', CAST(ts AS TIMESTAMP)) AS __timestamp,
           |             event_type, count(*) AS cnt
           |           FROM events GROUP BY 1, 2),
           |top2 AS (SELECT event_type FROM (
           |           SELECT event_type, sum(cnt) AS t FROM g GROUP BY 1
           |           ORDER BY t DESC, event_type LIMIT 2))
           |SELECT __timestamp,
           |  CASE WHEN event_type IN (SELECT event_type FROM top2)
           |       THEN event_type ELSE 'Others' END AS event_type,
           |  CAST(sum(cnt) AS BIGINT) AS cnt
           |FROM g GROUP BY 1, 2 ORDER BY __timestamp, event_type
           |LIMIT 1000""".stripMargin))

  /** Q154 (Q3, GROUP BY ALL): the modern SQL-surface sugar (Spark ≥3.4,
    * DuckDB, Snowflake) — every non-aggregate select item becomes a
    * grouping key; identical statement runs on both engines. */
  val q154 = GQuery("q154_group_by_all", (s, d) => {
    t(s, d, "orders").createOrReplaceTempView("gba_orders")
    s.sql("""SELECT o_orderstatus, o_orderpriority,
            |  count(*) AS n,
            |  round(CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE), 2)
            |    AS total
            |FROM gba_orders
            |GROUP BY ALL
            |ORDER BY o_orderstatus, o_orderpriority""".stripMargin)
  },
    Some("""SELECT o_orderstatus, o_orderpriority,
           |  count(*) AS n,
           |  round(CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE), 2)
           |    AS total
           |FROM orders
           |GROUP BY ALL
           |ORDER BY o_orderstatus, o_orderpriority""".stripMargin))

  /** Q155 (F17, math-function breadth): the scalar math surface in one
    * narrow projection — rounding family, powers/roots/logs, sign/mod,
    * greatest/least — all IEEE-defined, so both engines agree bit-for-bit
    * (rounded to 9 only where transcendentals are involved). */
  val q155 = GQuery("q155_math_breadth", (s, d) => {
    val p = col("o_totalprice")
    t(s, d, "orders")
      .filter(col("o_orderkey") < 5000)
      .select(col("o_orderkey"),
        ceil(p).cast(LongType).as("ceil_p"),
        floor(p).cast(LongType).as("floor_p"),
        round(sqrt(p), 9).as("sqrt_p"),
        // pow over integer cents: squares below 2^53 are exact doubles,
        // so the column is tie-free — round(pow(p/1e4, 2), 9) sat exactly
        // on a decimal half-way for some rows and the two engines'
        // rounding split (observed at sf0.001)
        pow(round(p * 100), 2).cast(LongType).as("pow_p"),
        round(log(p), 9).as("ln_p"),
        round(log10(p), 9).as("log10_p"),
        signum(p - 100000).cast(LongType).as("sign_p"),
        (col("o_orderkey") % 7).as("mod_k"),
        greatest(p, lit(150000d)).as("hi"),
        least(p, lit(150000d)).as("lo"))
      .orderBy("o_orderkey")
  },
    Some("""SELECT o_orderkey,
           |  CAST(ceil(o_totalprice) AS BIGINT) AS ceil_p,
           |  CAST(floor(o_totalprice) AS BIGINT) AS floor_p,
           |  round(sqrt(o_totalprice), 9) AS sqrt_p,
           |  CAST(pow(CAST(round(o_totalprice * 100) AS BIGINT), 2) AS BIGINT) AS pow_p,
           |  round(ln(o_totalprice), 9) AS ln_p,
           |  round(log10(o_totalprice), 9) AS log10_p,
           |  CAST(sign(o_totalprice - 100000) AS BIGINT) AS sign_p,
           |  o_orderkey % 7 AS mod_k,
           |  greatest(o_totalprice, 150000) AS hi,
           |  least(o_totalprice, 150000) AS lo
           |FROM orders WHERE o_orderkey < 5000 ORDER BY o_orderkey""".stripMargin))

  /** Q156 (F18, bitwise breadth): AND/OR/XOR, shifts, popcount — the
    * fingerprint/bucket arithmetic this engine's own sketches run on,
    * exposed as the user-facing SQL surface. Integer-exact everywhere. */
  val q156 = GQuery("q156_bitwise_breadth", (s, d) => {
    val k = col("o_orderkey")
    t(s, d, "orders")
      .filter(k < 5000)
      .select(k.as("o_orderkey"),
        k.bitwiseAND(lit(255L)).as("k_and"),
        k.bitwiseOR(lit(4096L)).as("k_or"),
        k.bitwiseXOR(lit(0x5aL)).as("k_xor"),
        shiftleft(k, 3).as("k_shl"),
        shiftright(k, 2).as("k_shr"),
        bit_count(k).cast(LongType).as("k_pop"))
      .orderBy("o_orderkey")
  },
    Some("""SELECT o_orderkey,
           |  o_orderkey & 255 AS k_and,
           |  o_orderkey | 4096 AS k_or,
           |  xor(o_orderkey, 90) AS k_xor,
           |  o_orderkey << 3 AS k_shl,
           |  o_orderkey >> 2 AS k_shr,
           |  CAST(bit_count(o_orderkey) AS BIGINT) AS k_pop
           |FROM orders WHERE o_orderkey < 5000 ORDER BY o_orderkey""".stripMargin))

  /** Q157 (L13′, branch lifecycle through the gate): fork a branch off a
    * seeded table, append the odd half of events there (main must not see
    * it), fast-forward merge, and read the result — which must equal a
    * plain aggregate of ALL events. The oracle never sees the branch
    * machinery, proving isolation + merge leave exactly the logical
    * content behind. Unique names per invocation (rerun-safe). */
  val q157 = GQuery("q157_branch_merge", (s, d) => {
    import graft.engine.Layout
    val run = java.util.UUID.randomUUID().toString.replace("-", "").take(8)
    val table = s"brq_main_$run"
    val events = t(s, d, "events").select("event_id", "event_type", "value")
    events.filter(col("event_id") % 2 === 0).write.saveAsTable(table)
    val bt = Layout.createBranch(s, table, "etl")
    events.filter(col("event_id") % 2 === 1)
      .write.mode("append").saveAsTable(bt)
    val mainBeforeMerge = s.table(table).count() // branch write invisible
    Layout.mergeBranch(s, table, "etl")
    s.table(table)
      .groupBy("event_type")
      .agg(count(lit(1)).as("cnt"), round(sum(col("value")), 2).as("total"))
      .withColumn("isolated",
        lit(mainBeforeMerge) === events.filter(col("event_id") % 2 === 0).count())
      .orderBy("event_type")
  },
    Some("""SELECT event_type, count(*) AS cnt, round(sum(value), 2) AS total,
           |  true AS isolated
           |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin))

  /** Q158 (AN5, ABC / Pareto classification): parts classed A/B/C by
    * cumulative revenue share (A = the ~80% head). The textbook
    * formulation is a GLOBAL cumulative window — a single-partition
    * scale-killer — so the running total goes through the two-level
    * sharded prefix sum ([[graft.ext.PrefixSum]], 32 shards): a
    * range-repartition, per-shard sums, a shard-count-sized offset
    * window, and a narrow add. Revenue is carried as exact DECIMAL cents
    * (long) so the classification boundary is integer-deterministic. */
  val q158 = GQuery("q158_abc_classification", (s, d) => {
    val rev = sum(col("l_extendedprice").cast("decimal(18,2)")
      * (lit(1) - col("l_discount").cast("decimal(18,2)")))
    val perPart = t(s, d, "lineitem")
      .groupBy("l_partkey")
      .agg((rev * 100).cast(LongType).as("rc"))
      .withColumn("__g", lit(0))
      .withColumn("__negrc", -col("rc"))
    val total = perPart.agg(sum(col("rc")).as("tot"))
    graft.ext.PrefixSum
      .exclusive(perPart, "__g", Seq("__negrc", "l_partkey"), "rc", "__before",
        shards = 32)
      .crossJoin(broadcast(total))
      .withColumn("__cum",
        (col("__before") + col("rc")).cast("double") / col("tot"))
      .withColumn("cls", when(col("__cum") <= 0.8, "A")
        .when(col("__cum") <= 0.95, "B").otherwise("C"))
      .groupBy("cls")
      .agg(count(lit(1)).as("n_parts"),
        round(sum(col("rc")).cast("double") / first(col("tot")), 6).as("rev_share"))
      .orderBy("cls")
  },
    Some("""WITH pp AS (SELECT l_partkey,
           |  CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))
           |       * (1 - CAST(l_discount AS DECIMAL(18,2)))) * 100 AS BIGINT) AS rc
           |  FROM lineitem GROUP BY 1),
           |t AS (SELECT sum(rc) AS tot FROM pp),
           |r AS (SELECT rc, sum(rc) OVER (ORDER BY rc DESC, l_partkey) AS cum FROM pp),
           |c AS (SELECT rc, CASE WHEN CAST(cum AS DOUBLE) / tot <= 0.8 THEN 'A'
           |        WHEN CAST(cum AS DOUBLE) / tot <= 0.95 THEN 'B'
           |        ELSE 'C' END AS cls
           |      FROM r CROSS JOIN t)
           |SELECT cls, count(*) AS n_parts,
           |  round(CAST(sum(rc) AS DOUBLE) / (SELECT tot FROM t), 6) AS rev_share
           |FROM c GROUP BY cls ORDER BY cls""".stripMargin))

  /** Q159 (AN6, new vs returning): each day's active users split by
    * whether the day is their FIRST — the growth-accounting metric every
    * product dashboard leads with. One user-keyed min aggregate joined
    * back (broadcast: users ≪ events), then a per-day distinct count per
    * class. */
  val q159 = GQuery("q159_new_vs_returning", (s, d) => {
    val events = t(s, d, "events").select(col("user_id"), to_date(col("ts")).as("day"))
    val firstDay = events.groupBy("user_id").agg(min(col("day")).as("first_day"))
    events.join(broadcast(firstDay), "user_id")
      .groupBy("day")
      .agg(
        countDistinct(when(col("day") === col("first_day"), col("user_id")))
          .as("new_users"),
        countDistinct(when(col("day") =!= col("first_day"), col("user_id")))
          .as("returning_users"))
      .orderBy("day")
  },
    Some("""WITH e AS (SELECT user_id, CAST(CAST(ts AS TIMESTAMP) AS DATE) AS day
           |           FROM events),
           |f AS (SELECT user_id, min(day) AS first_day FROM e GROUP BY 1)
           |SELECT day,
           |  count(DISTINCT CASE WHEN day = first_day THEN e.user_id END) AS new_users,
           |  count(DISTINCT CASE WHEN day <> first_day THEN e.user_id END) AS returning_users
           |FROM e JOIN f ON e.user_id = f.user_id
           |GROUP BY day ORDER BY day""".stripMargin))

  /** Q160 (AN7, top movers): brand revenue ranks in 1997 vs 1996 and the
    * rank delta — the "movers & shakers" dashboard pattern. Ranks come
    * from a year-partitioned window over the ALREADY-AGGREGATED 25-brand
    * result (bounded input, never raw facts); revenue stays DECIMAL until
    * the displayed edge; (rev desc, brand) makes ranks total. */
  val q160 = GQuery("q160_top_movers", (s, d) => {
    val rev = sum(col("l_extendedprice").cast("decimal(18,2)")
      * (lit(1) - col("l_discount").cast("decimal(18,2)"))).as("rev")
    val byYear = t(s, d, "lineitem")
      .filter(col("l_shipdate") >= "1996-01-01" && col("l_shipdate") < "1998-01-01")
      .join(broadcast(t(s, d, "part").select("p_partkey", "p_brand")),
        col("l_partkey") === col("p_partkey"))
      .groupBy(year(col("l_shipdate")).as("yr"), col("p_brand"))
      .agg(rev)
    val w = Window.partitionBy(col("yr")).orderBy(col("rev").desc, col("p_brand"))
    val ranked = byYear.withColumn("rk", row_number().over(w))
    ranked.filter(col("yr") === 1996)
      .select(col("p_brand"), col("rk").as("rk_1996"))
      .join(ranked.filter(col("yr") === 1997)
        .select(col("p_brand"), col("rk").as("rk_1997")), "p_brand")
      .select(col("p_brand"),
        col("rk_1996").cast(LongType).as("rk_1996"),
        col("rk_1997").cast(LongType).as("rk_1997"),
        (col("rk_1996") - col("rk_1997")).cast(LongType).as("delta"))
      .orderBy(col("delta").desc, col("p_brand"))
  },
    Some("""WITH by_year AS (SELECT CAST(year(l_shipdate) AS INT) AS yr, p_brand,
           |    sum(CAST(l_extendedprice AS DECIMAL(18,2))
           |        * (1 - CAST(l_discount AS DECIMAL(18,2)))) AS rev
           |  FROM lineitem JOIN part ON p_partkey = l_partkey
           |  WHERE l_shipdate >= DATE '1996-01-01' AND l_shipdate < DATE '1998-01-01'
           |  GROUP BY 1, 2),
           |ranked AS (SELECT *, row_number() OVER
           |    (PARTITION BY yr ORDER BY rev DESC, p_brand) AS rk
           |  FROM by_year)
           |SELECT a.p_brand, CAST(a.rk AS BIGINT) AS rk_1996,
           |  CAST(b.rk AS BIGINT) AS rk_1997,
           |  CAST(a.rk - b.rk AS BIGINT) AS delta
           |FROM ranked a JOIN ranked b ON a.p_brand = b.p_brand
           |WHERE a.yr = 1996 AND b.yr = 1997
           |ORDER BY delta DESC, a.p_brand""".stripMargin))

  /** Q161 (P6, weighted sampling without replacement): Efraimidis–Spirakis
    * A-ES — each doc draws a deterministic uniform u from its id's md5 and
    * gets key ln(u)/w (w = doc length); the top-k keys ARE a
    * probability-proportional-to-size sample without replacement. The
    * corpus-sampling op ("sample 10k docs, long docs proportionally more
    * likely") as one narrow map + TakeOrdered — no rand() (replays and
    * retries draw identically, the q43/q109 determinism discipline), no
    * global sort. Both engines parse the same 8 hex chars to the same
    * double, so the sample is bit-identical. */
  val q161 = GQuery("q161_weighted_sample", (s, d) => {
    val u = (conv(substring(md5(col("doc_id").cast("string")), 1, 8), 16, 10)
      .cast("double") + 0.5) / lit(4294967296d)
    val key = log(u) / col("n_chars")
    val w = Window.orderBy(col("key").desc, col("doc_id"))
    t(s, d, "documents")
      .select(col("doc_id"), col("n_chars"), key.as("key"))
      .orderBy(col("key").desc, col("doc_id")).limit(20)
      .withColumn("rk", row_number().over(w))
      .select(col("rk").cast(LongType).as("rk"), col("doc_id"), col("n_chars"))
      .orderBy("rk")
  },
    Some("""WITH keyed AS (SELECT doc_id, n_chars,
           |  ln((CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 8)) AS BIGINT)
           |      + 0.5) / 4294967296.0) / n_chars AS key
           |  FROM documents),
           |top AS (SELECT * FROM keyed ORDER BY key DESC, doc_id LIMIT 20)
           |SELECT CAST(row_number() OVER (ORDER BY key DESC, doc_id) AS BIGINT) AS rk,
           |  doc_id, n_chars
           |FROM top ORDER BY rk""".stripMargin))

  /** Q162 (L13″, Nessie catalog inspection through the gate): the REST
    * catalog surface the reference exposes (Nessie GET /trees → refs,
    * GET /trees/{ref}/history → commit log) over the manifest store.
    * Drives a full ref lifecycle — tag, branch fork, branch append,
    * fast-forward merge, tag expiry — then reads the COMMIT LOG back:
    * seq/parent prove the chain (0←1←2), operations name what happened,
    * per-commit record counts tie each commit to the logical row counts
    * the oracle recomputes from `events` alone. `refs_during_branch`
    * pins the ref inventory while the branch was live (main + branch +
    * tag = 3); `refs_after_expire` pins it after cleanup (main only).
    * All answered from metadata files — zero data I/O in the log read.
    * Unique names per invocation (rerun-safe; seqs start at 0 in the
    * fresh manifest root). */
  val q162 = GQuery("q162_catalog_refs", (s, d) => {
    import graft.engine.Layout
    val run = java.util.UUID.randomUUID().toString.replace("-", "").take(8)
    val table = s"refq_main_$run"
    val events = t(s, d, "events").select("event_id", "event_type", "value")
    events.filter(col("event_id") % 2 === 0).write.saveAsTable(table)
    Layout.snapshot(s, table, "v1")                      // commit 0 (tag v1)
    val bt = Layout.createBranch(s, table, "etl")        // commit 1 (fork tag)
    events.filter(col("event_id") % 2 === 1)
      .write.mode("append").saveAsTable(bt)
    val refsDuringBranch = Layout.listRefs(s, table).count() // main + etl + v1
    Layout.mergeBranch(s, table, "etl")                  // commit 2 (publish)
    Layout.expireSnapshots(s, table, keep = Set.empty)
    val refsAfterExpire = Layout.listRefs(s, table).count()  // main only
    Layout.commitLog(s, table)
      .select(col("seq"), col("parent"), col("operation"), col("record_count"),
        lit(refsDuringBranch).as("refs_during_branch"),
        lit(refsAfterExpire).as("refs_after_expire"))
      .orderBy("seq")
  },
    Some("""WITH c AS (SELECT
           |    count(*) FILTER (WHERE event_id % 2 = 0) AS even_cnt,
           |    count(*) AS total_cnt
           |  FROM events)
           |SELECT CAST(seq AS BIGINT) AS seq, CAST(parent AS BIGINT) AS parent,
           |  operation, CAST(record_count AS BIGINT) AS record_count,
           |  CAST(3 AS BIGINT) AS refs_during_branch,
           |  CAST(1 AS BIGINT) AS refs_after_expire
           |FROM (
           |  SELECT 0 AS seq, -1 AS parent, 'snapshot' AS operation,
           |    even_cnt AS record_count FROM c
           |  UNION ALL SELECT 1, 0, 'snapshot', even_cnt FROM c
           |  UNION ALL SELECT 2, 1, 'merge-branch:etl', total_cnt FROM c
           |) ORDER BY seq""".stripMargin))

  val all: Seq[GQuery] = Seq(q126, q127, q128, q129, q130, q131, q132, q133,
    q134, q138, q139, q140, q141, q142, q143, q144, q145, q146, q147, q148,
    q149, q150, q151, q152, q153, q154, q155, q156, q157, q158, q159, q160,
    q161, q162)
}
