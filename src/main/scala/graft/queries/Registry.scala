package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}

/** One declared query: a Spark implementation plus (when SQL-expressible) an
  * equivalent ANSI SQL text for the DuckDB oracle over the same tables.
  *
  * Contract (driver gate): the oracle result and the Spark result must
  * hash-match after sorting columns by name — so every computed column is
  * aliased identically on both sides, every query has a total ORDER BY, and
  * float aggregations are cast to DECIMAL (exact, order-independent) or
  * rounded.
  */
final case class GQuery(
    name: String,
    run: (SparkSession, String) => DataFrame,
    oracle: Option[String],
    description: String = "",
    /** Untimed fixture phase (round-17 verdict #4: q266/q267/q268 built
      * per-run fixture tables inside the timed body, so their bench
      * entries priced mostly fixture and topped the drift table). When
      * present, the driver contract composes setup+run (one closure,
      * same behavior as before), while [[graft.Bench]] runs setup
      * UNTIMED before each timed rep — the recorded seconds are the
      * query body alone. Setup stashes its table names in [[Fixtures]]
      * for run to read. */
    setup: Option[(SparkSession, String) => Unit] = None)

/** Cross-phase fixture registry: a GQuery's `setup` publishes the
  * per-dataset fixture handle (table names, snapshot seqs) its `run`
  * consumes. Keys are `<query>:<sfDir>` so two datasets never share a
  * fixture. */
object Fixtures {
  private val m = new java.util.concurrent.ConcurrentHashMap[String, AnyRef]()
  def put(key: String, v: AnyRef): Unit = { m.put(key, v); () }
  def has(key: String): Boolean = m.containsKey(key)
  def get[T](key: String): T = {
    val v = m.get(key)
    require(v != null, s"fixture '$key' not prepared — the query's setup runs first")
    v.asInstanceOf[T]
  }
}

object Registry {
  /** Collision-resistant key for deriving per-dataset index dirs and
    * resident-serving keys from a dataset path. `math.abs(s.hashCode)`
    * (the round-10 form) is 31 bits and content-independent — a collision
    * between two dataset paths in one application would silently share an
    * index dir AND executor-pinned resident graphs across datasets, and
    * `math.abs(Int.MinValue)` is negative. md5 over the path has neither
    * defect. */
  def pathKey(s: String): String =
    java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes(java.nio.charset.StandardCharsets.UTF_8))
      .take(8).map(b => f"$b%02x").mkString

  lazy val all: Seq[GQuery] =
    CoreQueries.all ++ ExtQueries.all ++ PipelineQueries.all ++
      AdvancedQueries.all ++ AnalyticsQueries.all ++ Round4Queries.all ++
      CorpusQueries.all ++ SurfaceQueries.all ++ Round5Queries.all ++
      Round6Queries.all ++ Round7Queries.all ++ Round7bQueries.all ++
      Round8Queries.all ++ Round10Queries.all ++ Round11Queries.all ++
      Round12Queries.all ++ Round13Queries.all ++ Round14Queries.all ++
      Round15Queries.all ++ Round16Queries.all ++ Round17Queries.all ++
      Round18Queries.all

  lazy val byName: Map[String, GQuery] = all.map(q => q.name -> q).toMap
}
