package graft.engine

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Seed-replica pipeline: Spark-native port of the reference's data seeding
  * (/root/reference/compose/seed.sh:65-118).
  *
  * The reference generates each demo table from a row-number sequence —
  * `UNNEST(sequence(1, N)) AS t(n)` — with arithmetic/CASE expressions per
  * column, anchored at `current_timestamp`. We keep the expressions
  * verbatim but:
  *
  *   - use `spark.range(1, n+1)` as the row generator: it is a distributed,
  *     partitioned source (scales to any N without materializing an array on
  *     one node, unlike a literal `sequence()` which builds the whole array
  *     in a single expression);
  *   - replace `current_timestamp` with a fixed anchor
  *     (`2026-01-01 00:00:00` UTC) so results are deterministic and
  *     oracle-checkable (SURVEY.md §7.3.4);
  *   - `CAST(n AS varchar)` becomes `CAST(n AS STRING)` (dialect,
  *     SURVEY.md §7.3.1).
  *
  * Golden row counts (seed.sh:74-115): events 200, users 50, orders 150,
  * products 20, transactions 300.
  */
object Seed {

  val Anchor = "TIMESTAMP '2026-01-01 00:00:00'"

  /** Distributed row-number source, the Spark-native UNNEST(sequence(1,N)). */
  private def rows(spark: SparkSession, n: Long): DataFrame =
    spark.range(1, n + 1).toDF("n")

  /** seed.sh:75 — 200 events. */
  def events(spark: SparkSession): DataFrame =
    rows(spark, 200).selectExpr(
      "n AS id",
      s"$Anchor - INTERVAL '1' DAY * (n % 30) AS ts",
      "CASE (n % 5) WHEN 0 THEN 'click' WHEN 1 THEN 'purchase' WHEN 2 THEN 'view' " +
        "WHEN 3 THEN 'login' ELSE 'logout' END AS event_type",
      "'Event ' || CAST(n AS STRING) AS payload",
      "(n % 50) + 1 AS user_id",
      "CAST((n * 10.5) + 100.0 AS DOUBLE) AS amount")

  /** seed.sh:85 — 50 users. */
  def users(spark: SparkSession): DataFrame =
    rows(spark, 50).selectExpr(
      "n AS user_id",
      "'user' || CAST(n AS STRING) AS username",
      "'user' || CAST(n AS STRING) || '@example.com' AS email",
      s"$Anchor - INTERVAL '1' DAY * (n % 90) AS created_at",
      "CASE (n % 10) WHEN 0 THEN 'US' WHEN 1 THEN 'UK' WHEN 2 THEN 'DE' WHEN 3 THEN 'FR' " +
        "WHEN 4 THEN 'CA' WHEN 5 THEN 'AU' WHEN 6 THEN 'JP' WHEN 7 THEN 'BR' " +
        "WHEN 8 THEN 'IN' ELSE 'MX' END AS country",
      "n % 3 != 0 AS active")

  /** seed.sh:95 — 150 orders. */
  def orders(spark: SparkSession): DataFrame =
    rows(spark, 150).selectExpr(
      "n AS order_id",
      "(n % 50) + 1 AS user_id",
      "(n % 20) + 1 AS product_id",
      "CAST((n % 5) + 1 AS INT) AS quantity",
      "CAST((n * 15.75) + 50.0 AS DOUBLE) AS price",
      s"$Anchor - INTERVAL '1' DAY * (n % 60) AS order_date",
      "CASE (n % 4) WHEN 0 THEN 'completed' WHEN 1 THEN 'pending' WHEN 2 THEN 'shipped' " +
        "ELSE 'cancelled' END AS status")

  /** seed.sh:105 — 20 products. */
  def products(spark: SparkSession): DataFrame =
    rows(spark, 20).selectExpr(
      "n AS product_id",
      "'Product ' || CAST(n AS STRING) AS name",
      "CASE (n % 5) WHEN 0 THEN 'Electronics' WHEN 1 THEN 'Clothing' WHEN 2 THEN 'Books' " +
        "WHEN 3 THEN 'Home' ELSE 'Sports' END AS category",
      "CAST((n * 25.50) + 10.0 AS DOUBLE) AS price",
      "CAST((n * 10) + 50 AS INT) AS stock",
      s"$Anchor - INTERVAL '1' DAY * n AS created_at")

  /** seed.sh:115 — 300 transactions (note the column literally named
    * `timestamp`, backtick-quoted; SURVEY.md §7.3.3). */
  def transactions(spark: SparkSession): DataFrame =
    rows(spark, 300).selectExpr(
      "n AS transaction_id",
      "(n % 50) + 1 AS user_id",
      "CAST((n * 12.34) + 5.0 AS DOUBLE) AS amount",
      "CASE (n % 3) WHEN 0 THEN 'USD' WHEN 1 THEN 'EUR' ELSE 'GBP' END AS currency",
      "CASE (n % 3) WHEN 0 THEN 'payment' WHEN 1 THEN 'refund' ELSE 'transfer' END AS transaction_type",
      s"$Anchor - INTERVAL '1' HOUR * (n % 720) AS `timestamp`",
      "CASE (n % 10) WHEN 0 THEN 'failed' ELSE 'success' END AS status")

  /** All demo tables in seed order, keyed by reference table name. */
  def all(spark: SparkSession): Seq[(String, DataFrame)] = Seq(
    "events" -> events(spark),
    "users" -> users(spark),
    "orders" -> orders(spark),
    "products" -> products(spark),
    "transactions" -> transactions(spark))

  /** Materialize the demo schema into the session catalog as managed tables
    * — the full seed.sh flow: CREATE SCHEMA (seed.sh:65), DROP TABLE IF
    * EXISTS (seed.sh:69,...), CREATE + INSERT (seed.sh:72-115). Idempotent,
    * like the reference (running twice converges to the same state).
    */
  def seedCatalog(spark: SparkSession, database: String = "demo"): Unit = {
    spark.sql(s"CREATE DATABASE IF NOT EXISTS $database")
    all(spark).foreach { case (name, df) =>
      spark.sql(s"DROP TABLE IF EXISTS $database.$name")
      df.write.saveAsTable(s"$database.$name")
    }
  }
}
