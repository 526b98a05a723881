package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.Tables
import graft.bi.{ChartCompiler, ChartSpec, Metric}
import graft.ext.Similarity

/** Declared queries Q74–Q79: the product-analytics tier (moving averages
  * over true RANGE frames, ordered funnels, cohort retention) plus the
  * remaining pipeline surface (edit-distance verification, Lloyd-trained
  * IVF through the recall gate, corpus-balance entropy). These are the
  * dashboards the reference's Superset layer exists to serve, expressed
  * as engine operators. Same oracle discipline as the rest of the
  * registry.
  */
object AnalyticsQueries {

  private def t(s: SparkSession, d: String, n: String): DataFrame = Tables.load(s, d, n)

  /** Q74 (moving average, RANGE frame): 7-day trailing mean of daily
    * revenue per event_type. RANGE, not ROWS: a day missing from the
    * series must not stretch the window across the gap — the frame is
    * bounded by day-number distance, so it degrades to fewer contributing
    * rows instead. One agg shuffle + one window partitioned by type. */
  val q74 = GQuery("q74_moving_average", (s, d) => {
    val daily = t(s, d, "events")
      .groupBy(col("event_type"), to_date(col("ts")).as("day"))
      .agg(sum(col("value")).as("__rev"))
      .withColumn("__dayn", datediff(col("day"), lit("1970-01-01").cast("date")))
    val w = Window.partitionBy(col("event_type")).orderBy(col("__dayn"))
      .rangeBetween(-6, 0)
    daily
      .withColumn("ma7", round(avg(col("__rev")).over(w), 4))
      .select(col("event_type"), col("day"), round(col("__rev"), 4).as("rev"),
        col("ma7"))
      .orderBy("event_type", "day")
  },
    Some("""WITH daily AS (
           |  SELECT event_type, CAST(CAST(ts AS TIMESTAMP) AS DATE) AS day,
           |    sum(value) AS rev
           |  FROM events GROUP BY 1, 2),
           |d2 AS (SELECT event_type, day, rev,
           |         day - DATE '1970-01-01' AS dayn FROM daily)
           |SELECT event_type, day, round(rev, 4) AS rev,
           |  round(avg(rev) OVER (PARTITION BY event_type ORDER BY dayn
           |    RANGE BETWEEN 6 PRECEDING AND CURRENT ROW), 4) AS ma7
           |FROM d2 ORDER BY event_type, day""".stripMargin))

  /** Q75 (ordered funnel): signup → click-after-signup →
    * purchase-after-that-click, per user, counted once each. ONE shuffle:
    * every stage is a conditional `min` over the same user partition, so
    * the three WindowExecs stack on a single exchange (the chained-join
    * formulation the oracle uses would shuffle three times). */
  val q75 = GQuery("q75_funnel", (s, d) => {
    val w = Window.partitionBy(col("user_id"))
    t(s, d, "events").select(col("user_id"), col("event_type"), col("ts"))
      .withColumn("__t1",
        min(when(col("event_type") === "signup", col("ts"))).over(w))
      .withColumn("__t2",
        min(when(col("event_type") === "click" && col("ts") >= col("__t1"),
          col("ts"))).over(w))
      .withColumn("__t3",
        min(when(col("event_type") === "purchase" && col("ts") >= col("__t2"),
          col("ts"))).over(w))
      .agg(
        count_distinct(when(col("__t1").isNotNull, col("user_id"))).as("signed_up"),
        count_distinct(when(col("__t2").isNotNull, col("user_id"))).as("clicked_after"),
        count_distinct(when(col("__t3").isNotNull, col("user_id"))).as("purchased_after"))
  },
    Some("""WITH e AS (SELECT user_id, event_type, CAST(ts AS TIMESTAMP) AS ts FROM events),
           |s1 AS (SELECT user_id, min(CASE WHEN event_type = 'signup' THEN ts END) AS t1
           |       FROM e GROUP BY 1),
           |s2 AS (SELECT e.user_id, min(e.ts) AS t2 FROM e JOIN s1 USING (user_id)
           |       WHERE e.event_type = 'click' AND e.ts >= s1.t1 GROUP BY 1),
           |s3 AS (SELECT e.user_id, min(e.ts) AS t3 FROM e JOIN s2 USING (user_id)
           |       WHERE e.event_type = 'purchase' AND e.ts >= s2.t2 GROUP BY 1)
           |SELECT (SELECT count(*) FROM s1 WHERE t1 IS NOT NULL) AS signed_up,
           |  (SELECT count(*) FROM s2) AS clicked_after,
           |  (SELECT count(*) FROM s3) AS purchased_after""".stripMargin))

  /** Q76 (cohort retention): users bucketed by first-active ISO week,
    * counted distinct in each subsequent week offset k. The
    * daily-activity distinct collapses the event volume BEFORE the
    * self-join (days per user, not events per user). */
  val q76 = GQuery("q76_cohort_retention", (s, d) => {
    val act = t(s, d, "events")
      .select(col("user_id"), to_date(col("ts")).as("__d")).distinct()
    val firsts = act.groupBy(col("user_id")).agg(min(col("__d")).as("__f"))
    act.join(firsts, "user_id")
      .groupBy(date_trunc("week", col("__f")).cast("date").as("cohort"),
        floor(datediff(col("__d"), col("__f")) / 7).cast("long").as("k"))
      .agg(count_distinct(col("user_id")).as("users"))
      .orderBy("cohort", "k")
  },
    Some("""WITH act AS (SELECT DISTINCT user_id,
           |               CAST(CAST(ts AS TIMESTAMP) AS DATE) AS d FROM events),
           |f AS (SELECT user_id, min(d) AS f FROM act GROUP BY 1)
           |SELECT CAST(date_trunc('week', f.f) AS DATE) AS cohort,
           |  (act.d - f.f) // 7 AS k, count(DISTINCT act.user_id) AS users
           |FROM act JOIN f USING (user_id)
           |GROUP BY 1, 2 ORDER BY cohort, k""".stripMargin))

  /** Q77 (edit distance): Levenshtein over 60-char prefixes of adjacent
    * doc pairs + normalized similarity — the fuzzy-match verifier for
    * candidate pairs where token-set Jaccard is too coarse (ordering
    * matters). O(len²) per pair, so it runs on CANDIDATES, never the
    * cross product. */
  val q77 = GQuery("q77_edit_distance", (s, d) => {
    val docs = t(s, d, "documents")
    val a = docs.select(col("doc_id").as("id_a"),
      substring(col("text"), 1, 60).as("__ta"))
    val b = docs.select(col("doc_id").as("id_b"),
      substring(col("text"), 1, 60).as("__tb"))
    a.where(col("id_a") < 100)
      .join(b, col("id_b") === col("id_a") + 1)
      // stage the O(len²) DP once; lev and sim both read the staged column
      .withColumn("__lev", levenshtein(col("__ta"), col("__tb")))
      .select(col("id_a"), col("id_b"),
        col("__lev").cast("long").as("lev"),
        round(lit(1.0) - col("__lev")
          / greatest(length(col("__ta")), length(col("__tb"))), 6).as("sim"))
      .orderBy("id_a")
  },
    Some("""WITH p AS (SELECT a.doc_id AS id_a, b.doc_id AS id_b,
           |    substring(a.text, 1, 60) AS ta, substring(b.text, 1, 60) AS tb
           |  FROM documents a JOIN documents b ON b.doc_id = a.doc_id + 1
           |  WHERE a.doc_id < 100)
           |SELECT id_a, id_b, CAST(levenshtein(ta, tb) AS BIGINT) AS lev,
           |  round(1.0 - levenshtein(ta, tb)::DOUBLE
           |        / greatest(length(ta), length(tb)), 6) AS sim
           |FROM p ORDER BY id_a""".stripMargin))

  /** Q78 (trained IVF-ANN): the production index build — spherical
    * k-means centroids ([[graft.ext.KMeans]]) instead of q31's random
    * sample — through the same recall contract. Floor 2/10 per probe:
    * trained lists must not fall below the random-init q31 floor. */
  val q78 = GQuery("q78_ann_ivf_trained", (s, d) => {
    val e = t(s, d, "embeddings")
    val probes = e.where(col("vec_id") < 5)
      .select(col("vec_id").as("probe_id"), col("embedding").as("pv"))
    val ann = Similarity.ivfTopKTrained(e, probes, "vec_id", "embedding",
      "probe_id", "pv", k = 10, nCentroids = 8, nprobe = 3, lloydIters = 2)
    val exact = Similarity.bruteForceTopK(e, probes, "vec_id", "embedding",
      "probe_id", "pv", 10)
    Similarity.recallContract(ann, exact, "probe_id", "vec_id", k = 10,
      minHits = 2.0)
  }, Some(PipelineQueries.annContractSql))

  /** Q79 (corpus balance entropy): Shannon entropy of the lang and source
    * mixes — the one-number drift audit for a corpus refresh. The
    * normalizing total joins back as a broadcast 1-row aggregate (never a
    * partition-less window), so the value-distribution side stays
    * distributed even for high-cardinality columns. */
  val q79 = GQuery("q79_mix_entropy", (s, d) => {
    val docs = t(s, d, "documents")
    def entropyOf(c: String): DataFrame = {
      val counts = docs.groupBy(col(c)).agg(count(lit(1)).as("__n"))
      val total = docs.agg(count(lit(1)).as("__t"))
      counts.crossJoin(broadcast(total))
        .select((col("__n") / col("__t")).as("__p"))
        .agg(round(-sum(col("__p") * log2(col("__p"))), 6).as("entropy"))
        .select(lit(c).as("column"), col("entropy"))
    }
    entropyOf("lang").unionByName(entropyOf("source")).orderBy("column")
  },
    Some {
      def one(c: String) =
        s"""SELECT '$c' AS "column",
           |  round(-sum(p * log2(p)), 6) AS entropy
           |FROM (SELECT count(*)::DOUBLE
           |        / (SELECT count(*) FROM documents) AS p
           |      FROM documents GROUP BY $c)""".stripMargin
      Seq("lang", "source").map(one)
        .mkString("SELECT * FROM (\n", "\nUNION ALL\n", "\n) ORDER BY \"column\"")
    })

  /** Q80 (value-picking windows): first/last/nth event type per user in
    * event-time order — the remaining §2.5 window functions, on an
    * explicit full frame (the default frame stops at CURRENT ROW, which
    * makes last_value self-referential; both engines agree once the frame
    * is explicit). */
  val q80 = GQuery("q80_value_windows", (s, d) => {
    val w = Window.partitionBy(col("user_id"))
      .orderBy(col("ts"), col("event_id"))
      .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    t(s, d, "events")
      .select(col("user_id"), col("event_id"),
        first(col("event_type")).over(w).as("first_et"),
        last(col("event_type")).over(w).as("last_et"),
        nth_value(col("event_type"), 2).over(w).as("second_et"))
      .select(col("user_id"), col("event_id"), col("first_et"), col("last_et"),
        coalesce(col("second_et"), lit("-")).as("second_et"))
      .orderBy("user_id", "event_id")
  },
    Some("""SELECT user_id, event_id,
           |  first_value(event_type) OVER w AS first_et,
           |  last_value(event_type) OVER w AS last_et,
           |  coalesce(nth_value(event_type, 2) OVER w, '-') AS second_et
           |FROM (SELECT user_id, event_id, event_type, CAST(ts AS TIMESTAMP) AS ts
           |      FROM events)
           |WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id
           |  ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)
           |ORDER BY user_id, event_id""".stripMargin))

  /** Q81 (GROUPING SETS): the explicit-sets form completing the
    * multi-grouping family next to q59 ROLLUP / q72 CUBE — by-type and
    * by-day marginals in one Expand, through the SQL surface. */
  val q81 = GQuery("q81_grouping_sets", (s, d) => {
    t(s, d, "events").createOrReplaceTempView("ev_gs")
    s.sql("""WITH e AS (SELECT event_type, to_date(ts) AS day FROM ev_gs)
            |SELECT coalesce(event_type, 'ALL') AS event_type,
            |  coalesce(CAST(day AS STRING), 'ALL') AS day,
            |  CAST(grouping_id(event_type, day) AS BIGINT) AS gid,
            |  count(*) AS cnt
            |FROM e GROUP BY GROUPING SETS ((event_type), (day))
            |ORDER BY gid, event_type, day""".stripMargin)
  },
    Some("""WITH e AS (SELECT event_type, CAST(CAST(ts AS TIMESTAMP) AS DATE) AS day
           |           FROM events)
           |SELECT coalesce(event_type, 'ALL') AS event_type,
           |  coalesce(CAST(day AS VARCHAR), 'ALL') AS day,
           |  CAST(grouping(event_type, day) AS BIGINT) AS gid,
           |  count(*) AS cnt
           |FROM e GROUP BY GROUPING SETS ((event_type), (day))
           |ORDER BY gid, event_type, day""".stripMargin))

  /** Q82 (salted skew join through the gate): customers × nation with a
    * deterministic 8-way salt ([[graft.ext.SkewJoin.saltedInner]]) — the
    * salt must be invisible in the result, so the oracle is the PLAIN
    * join's aggregate. Upgrades P2 from spec-only to oracle-checked. */
  val q82 = GQuery("q82_salted_join", (s, d) =>
    graft.ext.SkewJoin.saltedInner(
        t(s, d, "customer"), t(s, d, "nation"),
        "c_nationkey", "n_nationkey", saltSource = "c_custkey", salts = 8)
      .groupBy(col("n_name"))
      .agg(count(lit(1)).as("customers"),
        round(sum(col("c_acctbal")).cast("double"), 2).as("acctbal"))
      .orderBy("n_name"),
    Some("""SELECT n_name, count(*) AS customers,
           |  round(CAST(sum(c_acctbal) AS DOUBLE), 2) AS acctbal
           |FROM customer JOIN nation ON c_nationkey = n_nationkey
           |GROUP BY n_name ORDER BY n_name""".stripMargin))

  /** Q83 (chart time comparison): Superset's `time_compare` — daily counts
    * per event_type with the previous day's value alongside. The compiler
    * lowers it to a left self-join of the grouped result on the shifted
    * grain (B1 extension); -1 sentinels keep no-history rows total. */
  val q83 = GQuery("q83_chart_time_compare", (s, d) =>
    ChartCompiler.compile(s,
      ChartSpec(datasource = "events", queryMode = "aggregate",
        groupby = Seq("event_type"),
        metrics = Seq(Metric("count", None, "cnt")),
        timeColumn = Some("ts"), timeGrain = Some("day"),
        timeCompare = Some("1 day"),
        orderBy = Seq(("__timestamp", true), ("event_type", true)),
        rowLimit = 1000),
      n => t(s, d, n))
      .select(col("__timestamp"), col("event_type"), col("cnt"),
        coalesce(col("cnt__prev"), lit(-1L)).as("cnt_prev")),
    Some("""WITH g AS (SELECT date_trunc('day', CAST(ts AS TIMESTAMP)) AS __timestamp,
           |            event_type, count(*) AS cnt FROM events GROUP BY 1, 2)
           |SELECT g.__timestamp, g.event_type, g.cnt,
           |  coalesce(p.cnt, -1) AS cnt_prev
           |FROM g LEFT JOIN g p ON p.__timestamp + INTERVAL 1 DAY = g.__timestamp
           |  AND p.event_type = g.event_type
           |ORDER BY g.__timestamp, g.event_type LIMIT 1000""".stripMargin))

  /** Q84 (format sniffing): blobs get real magic-byte headers
    * ([[graft.ext.Multimodal.withMagic]]) and the sniffer must recover
    * every declared format from the BYTES alone — the q13-style contract:
    * the oracle recomputes declared counts and states `sniff_ok`; Spark
    * proves it by actually sniffing. */
  val q84 = GQuery("q84_format_sniff", (s, d) => {
    val media = graft.ext.Multimodal.withMagic(
      graft.ext.Multimodal.asMediaTable(t(s, d, "documents"), "doc_id", "text"))
    media
      .withColumn("__sniffed", graft.ext.Multimodal.sniffFormat(col("media")))
      .groupBy(col("format"))
      .agg(count(lit(1)).as("n_media"),
        bool_and(col("__sniffed") === col("format")).as("sniff_ok"))
      .orderBy("format")
  },
    Some("""SELECT CASE doc_id % 4 WHEN 0 THEN 'png' WHEN 1 THEN 'jpeg'
           |         WHEN 2 THEN 'wav' ELSE 'mp4' END AS format,
           |  count(*) AS n_media, true AS sniff_ok
           |FROM documents GROUP BY 1 ORDER BY format""".stripMargin))

  /** Q85 (sliding windows): 24 h windows sliding every 6 h — each event
    * lands in exactly 4 overlapping windows (q25 is the tumbling case).
    * Spark's `window(ts, "1 day", "6 hours")` lowers to an explode over
    * the covering window starts + one agg shuffle; the oracle builds the
    * same 4 starts arithmetically. */
  val q85 = GQuery("q85_sliding_window", (s, d) =>
    t(s, d, "events")
      .groupBy(window(col("ts"), "1 day", "6 hours"), col("event_type"))
      .agg(count(lit(1)).as("cnt"))
      .select(col("window.start").as("win_start"), col("event_type"), col("cnt"))
      .orderBy("win_start", "event_type"),
    Some("""WITH e AS (SELECT CAST(ts AS TIMESTAMP) AS ts, event_type FROM events),
           |w AS (SELECT CAST(to_timestamp(
           |        (epoch(ts)::BIGINT // 21600) * 21600 - k.k * 21600) AS TIMESTAMP) AS win_start,
           |        event_type
           |      FROM e CROSS JOIN (SELECT unnest(range(4)) AS k) k)
           |SELECT win_start, event_type, count(*) AS cnt
           |FROM w GROUP BY 1, 2 ORDER BY win_start, event_type""".stripMargin))

  /** Q86 (correlated subqueries): a correlated scalar subquery + an EXISTS
    * predicate through the SQL surface — Catalyst decorrelates both into
    * aggregate-join plans (no per-row re-execution), the rewrite Trino
    * users lean on constantly. The oracle runs the IDENTICAL SQL. */
  val q86 = GQuery("q86_subqueries", (s, d) => {
    t(s, d, "orders").createOrReplaceTempView("sq_orders")
    t(s, d, "lineitem").createOrReplaceTempView("sq_lineitem")
    s.sql("""SELECT o_orderkey,
            |  coalesce((SELECT max(l_extendedprice) FROM sq_lineitem
            |            WHERE l_orderkey = o_orderkey), -1) AS max_item
            |FROM sq_orders
            |WHERE EXISTS (SELECT 1 FROM sq_lineitem
            |              WHERE l_orderkey = o_orderkey AND l_quantity > 45)
            |  AND o_orderkey < 2000
            |ORDER BY o_orderkey""".stripMargin)
      .withColumn("max_item", round(col("max_item").cast("double"), 2))
  },
    Some("""SELECT o_orderkey,
           |  round(CAST(coalesce((SELECT max(l_extendedprice) FROM lineitem
           |             WHERE l_orderkey = o_orderkey), -1) AS DOUBLE), 2) AS max_item
           |FROM orders
           |WHERE EXISTS (SELECT 1 FROM lineitem
           |              WHERE l_orderkey = o_orderkey AND l_quantity > 45)
           |  AND o_orderkey < 2000
           |ORDER BY o_orderkey""".stripMargin))

  /** Q87 (ordered string aggregation): SQL:2023 `listagg ... WITHIN GROUP`
    * — the deterministic (explicitly ordered, distinct) form; unordered
    * listagg is nondeterministic under distributed merge and can never be
    * oracle-checked. */
  val q87 = GQuery("q87_listagg", (s, d) => {
    t(s, d, "events").createOrReplaceTempView("la_events")
    s.sql("""SELECT event_type,
            |  listagg(DISTINCT CAST(user_id AS STRING), ',')
            |    WITHIN GROUP (ORDER BY CAST(user_id AS STRING)) AS users
            |FROM la_events WHERE user_id < 20
            |GROUP BY event_type ORDER BY event_type""".stripMargin)
  },
    Some("""SELECT event_type,
           |  string_agg(DISTINCT CAST(user_id AS VARCHAR), ','
           |    ORDER BY CAST(user_id AS VARCHAR)) AS users
           |FROM events WHERE user_id < 20
           |GROUP BY event_type ORDER BY event_type""".stripMargin))

  /** Q88 (end-to-end curation — the flagship pipeline): near-dup collapse
    * keeping the highest-quality representative per cluster, then a
    * per-language char budget taken best-quality-first
    * ([[graft.ext.Curate]]). The oracle recomputes the whole pipeline
    * exhaustively: all-pairs Jaccard → recursive-CTE closure → quality
    * formula → window budget cut. */
  val q88 = GQuery("q88_curate_corpus", (s, d) =>
    graft.ext.Curate.curate(t(s, d, "documents"), "doc_id", "text", "lang",
        "n_chars", threshold = 0.8,
        budgets = Map("en" -> 20000L, "de" -> 8000L, "es" -> 8000L, "fr" -> 8000L),
        shards = 8)
      .orderBy("lang", "doc_id"),
    Some(s"""WITH RECURSIVE ${PipelineQueries.duckShingles3},
            |p AS (SELECT a.doc_id AS id_a, b.doc_id AS id_b
            |      FROM s a JOIN s b ON a.doc_id < b.doc_id
            |      WHERE round(len(list_intersect(a.sh, b.sh))::DOUBLE
            |              / len(list_distinct(list_concat(a.sh, b.sh))), 6) >= 0.8),
            |e AS (SELECT id_a AS src, id_b AS dst FROM p
            |      UNION SELECT id_b, id_a FROM p),
            |reach AS (
            |  SELECT src AS node, src AS r FROM e
            |  UNION
            |  SELECT e.dst AS node, reach.r FROM reach JOIN e ON e.src = reach.node),
            |comp AS (SELECT node, min(r) AS component FROM reach GROUP BY node),
            |f AS (SELECT doc_id, lang, n_chars,
            |        length(text) AS nc,
            |        len(string_split_regex(lower(trim(text)), '\\s+')) AS n_tokens,
            |        length(text) - length(regexp_replace(text, '[.,;:!?''"()\\[\\]{}-]', '', 'g')) AS n_punct,
            |        len(list_filter(string_split_regex(lower(trim(text)), '\\s+'),
            |            tok -> list_contains(['the','a','and','of','to','is'], tok))) AS n_stop
            |      FROM documents),
            |q AS (SELECT doc_id, lang, n_chars,
            |        round(greatest(least(least(nc::DOUBLE / 400.0, 1.0)
            |          - least(round(n_punct::DOUBLE / greatest(nc, 1), 6) * 5.0, 1.0) * 0.5
            |          + round(n_stop::DOUBLE / greatest(n_tokens, 1), 6) * 0.2, 1.0), 0.0), 6) AS quality
            |      FROM f),
            |wc AS (SELECT q.*, coalesce(c.component, q.doc_id) AS comp
            |       FROM q LEFT JOIN comp c ON c.node = q.doc_id),
            |reps AS (SELECT doc_id, lang, n_chars, quality FROM (
            |    SELECT *, row_number() OVER (PARTITION BY comp
            |      ORDER BY quality DESC, doc_id) AS rn FROM wc) WHERE rn = 1),
            |cut AS (SELECT *, sum(n_chars) OVER (PARTITION BY lang
            |          ORDER BY quality DESC, doc_id) - n_chars AS pre
            |        FROM reps WHERE lang IN ('de', 'en', 'es', 'fr'))
            |SELECT doc_id, lang, n_chars, quality FROM cut
            |WHERE pre < (CASE lang WHEN 'en' THEN 20000 ELSE 8000 END)
            |ORDER BY lang, doc_id""".stripMargin))

  /** Q89 (data-quality validation): the expectations gate over orders —
    * not-null, unique key, value range, referential integrity against
    * customer ([[graft.engine.Checks]]); one (rule, violations, pass) row
    * each, the Deequ/Great-Expectations shape. */
  val q89 = GQuery("q89_quality_checks", (s, d) =>
    graft.engine.Checks.validate(t(s, d, "orders"), Seq(
        graft.engine.Checks.NotNull("o_orderdate"),
        graft.engine.Checks.UniqueKey("o_orderkey"),
        graft.engine.Checks.InRange("o_totalprice", 0.0, 400000.0),
        graft.engine.Checks.RefIntegrity("o_custkey", "customer",
          t(s, d, "customer"), "c_custkey")))
      .orderBy("rule"),
    Some("""SELECT * FROM (
           |  SELECT 'not_null(o_orderdate)' AS rule,
           |    CAST(sum(CASE WHEN o_orderdate IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS violations,
           |    sum(CASE WHEN o_orderdate IS NULL THEN 1 ELSE 0 END) = 0 AS pass
           |  FROM orders
           |  UNION ALL
           |  SELECT 'unique(o_orderkey)',
           |    count(*) - count(DISTINCT o_orderkey),
           |    count(*) = count(DISTINCT o_orderkey)
           |  FROM orders
           |  UNION ALL
           |  SELECT 'range(o_totalprice,0.0,400000.0)',
           |    CAST(sum(CASE WHEN o_totalprice IS NULL OR o_totalprice < 0
           |          OR o_totalprice > 400000 THEN 1 ELSE 0 END) AS BIGINT),
           |    sum(CASE WHEN o_totalprice IS NULL OR o_totalprice < 0
           |        OR o_totalprice > 400000 THEN 1 ELSE 0 END) = 0
           |  FROM orders
           |  UNION ALL
           |  SELECT 'ref(o_custkey->customer.c_custkey)',
           |    CAST(count(*) FILTER (WHERE c.c_custkey IS NULL) AS BIGINT),
           |    count(*) FILTER (WHERE c.c_custkey IS NULL) = 0
           |  FROM orders o LEFT JOIN customer c ON o.o_custkey = c.c_custkey
           |  WHERE o.o_custkey IS NOT NULL
           |) ORDER BY rule""".stripMargin))

  val all: Seq[GQuery] = Seq(q74, q75, q76, q77, q78, q79, q80, q81, q82, q83,
    q84, q85, q86, q87, q88, q89)
}
