package graft.queries

/** DuckDB-side twin of [[graft.engine.Seed]]: the five demo tables as CTEs
  * over `generate_series`, with the same fixed anchor. Lets every
  * seed-replica query be oracle-checked without external state — the oracle
  * recomputes the seed inline, exactly as the reference's
  * `UNNEST(sequence(1, N))` generators do (/root/reference/compose/seed.sh:75-115).
  */
object SeedSql {

  private val anchor = "TIMESTAMP '2026-01-01 00:00:00'"

  val demoCtes: String =
    s"""demo_events AS (
       |  SELECT n AS id,
       |         $anchor - INTERVAL '1' DAY * (n % 30) AS ts,
       |         CASE (n % 5) WHEN 0 THEN 'click' WHEN 1 THEN 'purchase' WHEN 2 THEN 'view'
       |              WHEN 3 THEN 'login' ELSE 'logout' END AS event_type,
       |         'Event ' || CAST(n AS VARCHAR) AS payload,
       |         (n % 50) + 1 AS user_id,
       |         (n * 10.5) + 100.0 AS amount
       |  FROM generate_series(1, 200) AS t(n)),
       |demo_users AS (
       |  SELECT n AS user_id,
       |         'user' || CAST(n AS VARCHAR) AS username,
       |         'user' || CAST(n AS VARCHAR) || '@example.com' AS email,
       |         $anchor - INTERVAL '1' DAY * (n % 90) AS created_at,
       |         CASE (n % 10) WHEN 0 THEN 'US' WHEN 1 THEN 'UK' WHEN 2 THEN 'DE' WHEN 3 THEN 'FR'
       |              WHEN 4 THEN 'CA' WHEN 5 THEN 'AU' WHEN 6 THEN 'JP' WHEN 7 THEN 'BR'
       |              WHEN 8 THEN 'IN' ELSE 'MX' END AS country,
       |         n % 3 != 0 AS active
       |  FROM generate_series(1, 50) AS t(n)),
       |demo_orders AS (
       |  SELECT n AS order_id,
       |         (n % 50) + 1 AS user_id,
       |         (n % 20) + 1 AS product_id,
       |         CAST((n % 5) + 1 AS INT) AS quantity,
       |         (n * 15.75) + 50.0 AS price,
       |         $anchor - INTERVAL '1' DAY * (n % 60) AS order_date,
       |         CASE (n % 4) WHEN 0 THEN 'completed' WHEN 1 THEN 'pending' WHEN 2 THEN 'shipped'
       |              ELSE 'cancelled' END AS status
       |  FROM generate_series(1, 150) AS t(n)),
       |demo_products AS (
       |  SELECT n AS product_id,
       |         'Product ' || CAST(n AS VARCHAR) AS name,
       |         CASE (n % 5) WHEN 0 THEN 'Electronics' WHEN 1 THEN 'Clothing' WHEN 2 THEN 'Books'
       |              WHEN 3 THEN 'Home' ELSE 'Sports' END AS category,
       |         (n * 25.50) + 10.0 AS price,
       |         CAST((n * 10) + 50 AS INT) AS stock,
       |         $anchor - INTERVAL '1' DAY * n AS created_at
       |  FROM generate_series(1, 20) AS t(n)),
       |demo_transactions AS (
       |  SELECT n AS transaction_id,
       |         (n % 50) + 1 AS user_id,
       |         (n * 12.34) + 5.0 AS amount,
       |         CASE (n % 3) WHEN 0 THEN 'USD' WHEN 1 THEN 'EUR' ELSE 'GBP' END AS currency,
       |         CASE (n % 3) WHEN 0 THEN 'payment' WHEN 1 THEN 'refund' ELSE 'transfer' END AS transaction_type,
       |         $anchor - INTERVAL '1' HOUR * (n % 720) AS "timestamp",
       |         CASE (n % 10) WHEN 0 THEN 'failed' ELSE 'success' END AS status
       |  FROM generate_series(1, 300) AS t(n))""".stripMargin

  /** Wrap a query body with the demo CTEs. */
  def withDemo(body: String): String = s"WITH $demoCtes\n$body"
}
