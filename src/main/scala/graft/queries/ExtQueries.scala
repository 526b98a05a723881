package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.Tables
import graft.functions.VectorFunctions

/** Extension queries Q21–Q25 (SURVEY.md §2.10 Tier C): the LLM-data-pipeline
  * north-star surface — dedup, text stats, JSON extraction, similarity
  * search, stream-equivalent windowing — over the driver corpora.
  */
object ExtQueries {

  private def t(s: SparkSession, d: String, n: String): DataFrame = Tables.load(s, d, n)

  /** Q21 (dedup): exact duplicate counting per language — the hash-groupBy
    * dedup primitive. At scale this is one shuffle on the group key with
    * partial aggregation; no driver materialization. */
  val q21 = GQuery("q21_dedup_exact", (s, d) =>
    t(s, d, "documents")
      .groupBy("lang")
      .agg(count(lit(1)).as("doc_cnt"),
        countDistinct(col("text")).as("distinct_cnt"),
        (count(lit(1)) - countDistinct(col("text"))).as("dup_cnt"))
      .orderBy("lang"),
    Some("""SELECT lang, count(*) AS doc_cnt, count(DISTINCT text) AS distinct_cnt,
           |  count(*) - count(DISTINCT text) AS dup_cnt
           |FROM documents GROUP BY lang ORDER BY lang""".stripMargin))

  /** Q22 (F7): JSON extraction from events.props + group-by. */
  val q22 = GQuery("q22_json_extract", (s, d) =>
    t(s, d, "events")
      .select((get_json_object(col("props"), "$.k").cast("bigint") % 10).as("k_mod"))
      .groupBy("k_mod").agg(count(lit(1)).as("cnt"))
      .orderBy("k_mod"),
    Some("""SELECT CAST(json_extract_string(props, '$.k') AS BIGINT) % 10 AS k_mod, count(*) AS cnt
           |FROM events GROUP BY 1 ORDER BY k_mod""".stripMargin))

  /** Q23 (F8, text analysis): whitespace token counts per language. Total is
    * an exact integer sum; the average is emitted rounded. */
  val q23 = GQuery("q23_token_stats", (s, d) => {
    val tokens = size(split(trim(col("text")), "\\s+"))
    t(s, d, "documents")
      .select(col("lang"), tokens.as("n_tokens"))
      .groupBy("lang")
      .agg(count(lit(1)).as("doc_cnt"),
        sum(col("n_tokens")).as("total_tokens"),
        round(avg(col("n_tokens")), 6).as("avg_tokens"))
      .orderBy("lang")
  },
    Some("""SELECT lang, count(*) AS doc_cnt,
           |  CAST(SUM(len(string_split_regex(trim(text), '\s+'))) AS BIGINT) AS total_tokens,
           |  round(AVG(len(string_split_regex(trim(text), '\s+'))), 6) AS avg_tokens
           |FROM documents GROUP BY lang ORDER BY lang""".stripMargin))

  /** Q24 (F9, similarity search): brute-force cosine top-k. The probe set is
    * tiny and broadcast; the corpus side streams through one scan — this is
    * the exact-search baseline ANN variants are judged against. Scores are
    * computed in double (strict left fold = oracle-reproducible) and rounded
    * before ranking so ordering is well-defined under ties. */
  val q24 = GQuery("q24_cosine_topk", (s, d) => {
    val e = t(s, d, "embeddings")
      .select(col("vec_id"), col("embedding").cast("array<double>").as("v"))
    val probes = e.filter(col("vec_id") < 5)
      .select(col("vec_id").as("probe_id"), col("v").as("pv"))
    val scored = e.join(broadcast(probes), col("vec_id") =!= col("probe_id"))
      .select(col("probe_id"), col("vec_id"),
        round(VectorFunctions.cosine(col("v"), col("pv")), 6).as("cos_sim"))
    val w = Window.partitionBy(col("probe_id")).orderBy(col("cos_sim").desc, col("vec_id"))
    scored.withColumn("rn", row_number().over(w))
      .filter(col("rn") <= 10)
      .select("probe_id", "vec_id", "cos_sim")
      .orderBy(col("probe_id"), col("cos_sim").desc, col("vec_id"))
  },
    Some("""WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
           |p AS (SELECT vec_id AS probe_id, v AS pv FROM e WHERE vec_id < 5),
           |s AS (SELECT probe_id, vec_id,
           |        round(list_inner_product(v, pv) /
           |              (sqrt(list_inner_product(v, v)) * sqrt(list_inner_product(pv, pv))), 6) AS cos_sim
           |      FROM e, p WHERE vec_id <> probe_id),
           |r AS (SELECT *, row_number() OVER (PARTITION BY probe_id ORDER BY cos_sim DESC, vec_id) AS rn FROM s)
           |SELECT probe_id, vec_id, cos_sim FROM r WHERE rn <= 10
           |ORDER BY probe_id, cos_sim DESC, vec_id""".stripMargin))

  /** Q25 (§2.9): tumbling 1-day window counts per event_type — the batch
    * twin of the streaming pipeline (graft.streaming.EventsStream); epoch-
    * aligned `window()` starts equal `date_trunc('day', ts)`. */
  val q25 = GQuery("q25_tumbling_window", (s, d) =>
    t(s, d, "events")
      .groupBy(window(col("ts"), "1 day"), col("event_type"))
      .agg(count(lit(1)).as("cnt"))
      .select(col("window.start").as("win_start"), col("event_type"), col("cnt"))
      .orderBy("win_start", "event_type"),
    Some("""SELECT date_trunc('day', CAST(ts AS TIMESTAMP)) AS win_start, event_type, count(*) AS cnt
           |FROM events GROUP BY 1, 2 ORDER BY win_start, event_type""".stripMargin))

  val all: Seq[GQuery] = Seq(q21, q22, q23, q24, q25)
}
