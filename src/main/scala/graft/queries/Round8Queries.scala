package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables

/** Round-8 declared queries: compressibility quality signal (LZ78) and
  * shard-parallel graph ANN (HNSW).
  */
object Round8Queries {

  private def t(s: SparkSession, d: String, n: String): DataFrame = Tables.load(s, d, n)

  /** Q218 (T23, LZ78 compressibility filter): per-document incremental-
    * parse phrase count ([[graft.ext.TextAnalysis.lz78Phrases]] — a
    * native codegen'd expression, one map-only projection over the
    * corpus like every TextAnalysis feature). The parse is sequential
    * per string, NOT SQL-expressible — so the gate plants CLOSED-FORM
    * contract rows DuckDB can state (the Lz78Spec families run through
    * the production expression in-plan): `a^5050` parses into exactly
    * 100 phrases (k full phrases cover k(k+1)/2 chars) and 500
    * all-distinct characters into exactly 500; plus the corpus-wide
    * UNIVERSAL BOUND — every non-empty document's phrase count sits in
    * [ceil((√(8n+1)−1)/2), n] (phrase k has length ≤ k, so k phrases
    * cover ≤ k(k+1)/2 chars; and no phrase is empty), empty text parses
    * to 0 — with violations counted in-plan and stated 0. The band
    * keep-flag (ratio ∈ [0.40, 0.55], the Gopher band convention) is
    * plain SQL over the pinned count — a caller filters
    * `lz78Ratio(text).between(0.40, 0.55)` directly; Lz78Spec pins the
    * band's signal DIRECTION (repetition < prose < noise) and the
    * phrase counts character-for-character against an independent trie
    * reference. */
  val q218 = GQuery("q218_lz_compressibility", (s, d) => {
    import graft.ext.TextAnalysis
    val stats = t(s, d, "documents")
      .select(length(col("text")).as("n"),
        TextAnalysis.lz78Phrases(col("text")).as("p"))
      .where(col("n").isNotNull)
    val lower = ceil((sqrt(col("n").cast("double") * 8 + 1) - 1) / 2)
    val violations = stats.agg(
      sum(when(
        when(col("n") === 0, col("p") =!= 0)
          .otherwise(col("p") < lower || col("p") > col("n")),
        1L).otherwise(0L)).as("value"))
      .select(lit("bound_violations").as("kind"), col("value"))
    val nDocs = t(s, d, "documents")
      .agg(count(lit(1)).as("value"))
      .select(lit("corpus_docs").as("kind"), col("value"))
    val closed = s.range(1).select(
        TextAnalysis.lz78Phrases(lit("a" * 5050)).cast("long").as("run"),
        TextAnalysis.lz78Phrases(
          lit((0 until 500).map(i => (0x4e00 + i).toChar).mkString))
          .cast("long").as("distinct"))
    closed.select(lit("closed_form_run").as("kind"), col("run").as("value"))
      .unionByName(closed.select(
        lit("closed_form_distinct").as("kind"), col("distinct").as("value")))
      .unionByName(violations)
      .unionByName(nDocs)
      .orderBy("kind")
  },
    Some("""SELECT 'bound_violations' AS kind, CAST(0 AS BIGINT) AS value
           |UNION ALL SELECT 'closed_form_distinct', CAST(500 AS BIGINT)
           |UNION ALL SELECT 'closed_form_run', CAST(100 AS BIGINT)
           |UNION ALL SELECT 'corpus_docs',
           |  (SELECT CAST(count(*) AS BIGINT) FROM documents)
           |ORDER BY kind""".stripMargin))

  /** Q219 (N14, shard-parallel HNSW): the graph-based ANN family —
    * build per-shard navigable-small-world graphs ([[graft.ext.Hnsw]],
    * Malkov & Yashunin 2016) in one corpus pass, persist through
    * [[graft.ext.IndexStore]] (kind=hnsw, clustered by shard), reload,
    * scatter-gather search. Memoized per (session, dir): rep 1 pays
    * build+write+load, reps 2+ price steady-state serving (the
    * q177/q187 lifecycle). Gate = the q30-family recall contract with
    * floor 7/10 (measured minimum 9/10 at both gate SFs; LSH's floor is
    * 2/10 on the same corpus — the graph family earns its keep). */
  val q219 = GQuery("q219_ann_hnsw", (s, d) => {
    import graft.ext.{Hnsw, IndexStore, Similarity}
    val e = t(s, d, "embeddings")
    val probes = e.where(col("vec_id") < 5)
      .select(col("vec_id").as("probe_id"), col("embedding").as("pv"))
    val params = Hnsw.Params(m = 8, efConstruction = 64, efSearch = 48)
    val dir = sys.props("java.io.tmpdir") +
      s"/graft_idx/hnsw_${Registry.pathKey(d)}"
    // rep 1: build + store + one serving shuffle, persisted; reps 2+
    // price RESIDENT steady-state serving — cached shard-clustered
    // blocks (no per-query shuffle) + executor-pinned decoded graphs
    // (no per-query rebuild). The round-9 memo cached the LAZY loaded
    // DataFrame, so every action re-ran the per-shard rebuild.
    val graph = Hnsw.cached(s.sparkContext.applicationId + ":hnsw:" + d) {
      val n = e.count()
      val shards = math.max(1L, n / 512L).toInt // ≥2 shards past 1k vectors
      val built = Hnsw.build(e, "vec_id", "embedding", shards, params)
      IndexStore.writeHnsw(built, params, dir)
      val prepared = Hnsw.prepareServing(IndexStore.loadHnsw(s, dir)._1)
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      prepared.count()
      prepared
    }
    val ann = Hnsw.search(graph, probes, "probe_id", "pv", k = 10, params,
      residentKey = Some(s.sparkContext.applicationId + ":" + dir),
      prepared = true)
    val exact = Similarity.bruteForceTopK(e, probes, "vec_id", "embedding",
      "probe_id", "pv", 10)
    Similarity.recallContract(ann, exact, "probe_id", "vec_id", k = 10,
      minHits = 7.0)
  }, Some(PipelineQueries.annContractSql))

  /** Q220 (ER2, exact edit-distance similarity join): every customer-name
    * pair within Levenshtein distance 1 via deletion-neighborhood
    * candidate generation + exact verify ([[graft.ext.EditJoin]] —
    * FastSS/SymSpell index family). The cross product never forms: the
    * oracle proves the SCALABLE path (hash-join on 8-byte variant keys)
    * emits the bit-identical pair set the quadratic definition describes
    * — candidate generation is provably lossless, so this gate is
    * hash-exact, not a recall contract. 19,500 pairs at sf0.01. */
  val q220 = GQuery("q220_edit_distance_join", (s, d) => {
    import graft.ext.EditJoin
    EditJoin.join(t(s, d, "customer"), "c_custkey", "c_name", maxDist = 1)
      .orderBy("id_a", "id_b")
  },
    Some("""SELECT a.c_custkey AS id_a, b.c_custkey AS id_b,
           |  CAST(levenshtein(a.c_name, b.c_name) AS BIGINT) AS lev
           |FROM customer a JOIN customer b
           |  ON a.c_custkey < b.c_custkey
           |WHERE levenshtein(a.c_name, b.c_name) <= 1
           |ORDER BY id_a, id_b""".stripMargin))

  /** DuckDB twin of [[graft.ext.LabelProp.run]]: one CTE block per
    * synchronous round — neighbor-label counts, argmax by (count DESC,
    * label ASC) via a nested row_number, no-in-neighbor nodes keep their
    * label (the q195 unrolled-iteration oracle discipline). */
  private def labelPropOracle(rounds: Int): String = {
    val steps = (1 to rounds).map { i =>
      s"""c$i AS (SELECT e.dst, p.lab, count(*) AS c
         |  FROM l${i - 1} p JOIN e ON e.src = p.id GROUP BY e.dst, p.lab),
         |w$i AS (SELECT dst, lab,
         |    row_number() OVER (PARTITION BY dst ORDER BY c DESC, lab) AS rn
         |  FROM c$i),
         |l$i AS (SELECT p.id, coalesce(w.lab, p.lab) AS lab
         |  FROM l${i - 1} p LEFT JOIN (SELECT dst, lab FROM w$i WHERE rn = 1) w
         |    ON w.dst = p.id)""".stripMargin
    }.mkString(",\n")
    s"""WITH cp AS (SELECT DISTINCT o_custkey * 2 AS src, l_partkey * 2 + 1 AS dst
       |            FROM orders JOIN lineitem ON l_orderkey = o_orderkey),
       |e AS (SELECT src, dst FROM cp
       |      UNION ALL SELECT dst AS src, src AS dst FROM cp),
       |n AS (SELECT DISTINCT src AS id FROM e),
       |l0 AS (SELECT id, id AS lab FROM n),
       |$steps
       |SELECT id AS node_id, lab AS community FROM l$rounds
       |ORDER BY node_id""".stripMargin
  }

  /** Q221 (G7, label-propagation communities): 4 synchronous LPA rounds
    * over the bidirectional purchase graph ([[graft.ext.LabelProp]]) —
    * deterministic min-label tie order, exact label arithmetic, so the
    * FULL per-node assignment is hash-exact against the unrolled-CTE
    * DuckDB twin (a stronger gate than any summary: every node's
    * community must match). Per round: one label join + one map-side-
    * combined (dst, label) count + a `max_by` argmax — aggregates only,
    * no window shuffle, lazy localCheckpoint lineage truncation. */
  val q221 = GQuery("q221_label_propagation", (s, d) => {
    import graft.ext.{LabelProp, PageRank}
    val g = PageRank.purchaseGraph(t(s, d, "orders"), t(s, d, "lineitem"))
    LabelProp.run(g, "src", "dst", rounds = 4)
      .select(col("id").as("node_id"), col("community"))
      .orderBy("node_id")
  }, Some(labelPropOracle(4)))

  /** DuckDB twin of [[graft.ext.GraphAlgos.kCore]]: one CTE block per
    * synchronous peel sweep — degree over the surviving symmetric edge
    * set, keep ≥ k, restrict edges to kept×kept. */
  private def kCoreOracle(k: Int, rounds: Int): String = {
    val steps = (1 to rounds).map { i =>
      s"""k$i AS (SELECT x AS id FROM e${i - 1} GROUP BY x HAVING count(*) >= $k),
         |e$i AS (SELECT e.x, e.y FROM e${i - 1} e
         |  JOIN k$i a ON a.id = e.x JOIN k$i b ON b.id = e.y)""".stripMargin
    }.mkString(",\n")
    s"""WITH cp AS (SELECT DISTINCT o_custkey * 2 AS src, l_partkey * 2 + 1 AS dst
       |            FROM orders JOIN lineitem ON l_orderkey = o_orderkey),
       |e0 AS (SELECT src AS x, dst AS y FROM cp
       |       UNION ALL SELECT dst AS x, src AS y FROM cp),
       |$steps
       |SELECT x AS node_id, count(*) AS degree FROM e$rounds
       |GROUP BY x ORDER BY node_id""".stripMargin
  }

  /** Q222 (G8, k-core peeling): 6 synchronous peel sweeps at k = 22 over
    * the purchase graph ([[graft.ext.GraphAlgos.kCore]]) — at the gate SF
    * the cascade genuinely runs (5 sweeps remove 353 nodes, sweep 6
    * removes nothing, so the declared fixed-round output IS the k-core
    * fixpoint there) and the full surviving (node, in-core degree) table
    * is hash-exact against the unrolled-CTE twin. Per sweep: one
    * map-side-combined degree count + two slim semi-joins; the edge
    * working set only shrinks. */
  val q222 = GQuery("q222_kcore", (s, d) => {
    import graft.ext.GraphAlgos
    val g = t(s, d, "orders").join(t(s, d, "lineitem"),
        col("o_orderkey") === col("l_orderkey"))
      .select((col("o_custkey") * 2).as("src"),
        (col("l_partkey") * 2 + 1).as("dst"))
      .distinct()
    GraphAlgos.kCore(g, "src", "dst", k = 22, rounds = 6)
      .select(col("id").as("node_id"), col("degree"))
      .orderBy("node_id")
  }, Some(kCoreOracle(22, 6)))

  /** Q223 (N14′, incremental HNSW append): the q219 lifecycle grown by an
    * increment instead of rebuilt — base graph (all but the top-50 ids)
    * built + persisted through `IndexStore` kind=hnsw, reloaded, the
    * increment inserted per shard via [[graft.ext.Hnsw.insert]] (no
    * corpus re-scan), then the same q30-family recall contract over the
    * UNION corpus. Append increments reproduce the from-scratch build
    * bit-for-bit (HnswInsertSpec), so the gate recall floor matches
    * q219's. Memoized per (session, dir): rep 1 prices build+store+
    * insert, reps 2+ steady-state serving. */
  val q223 = GQuery("q223_ann_hnsw_insert", (s, d) => {
    import graft.ext.{Hnsw, IndexStore, Similarity}
    val e = t(s, d, "embeddings")
    val probes = e.where(col("vec_id") < 5)
      .select(col("vec_id").as("probe_id"), col("embedding").as("pv"))
    val params = Hnsw.Params(m = 8, efConstruction = 64, efSearch = 48)
    val dirPlus = sys.props("java.io.tmpdir") +
      s"/graft_idx/hnswinc_${Registry.pathKey(d)}_plus"
    // rep 1: base build + store + insert + write-through of the GROWN
    // graph (an increment's output is itself a publishable index — the
    // round-9 memo cached the lazy insert plan, so every action re-ran
    // load + per-shard insert); reps 2+ price resident steady serving
    // exactly as q219.
    val graph = Hnsw.cached(s.sparkContext.applicationId + ":hnswinc:" + d) {
      val maxId = e.agg(max(col("vec_id"))).head().getLong(0)
      val cut = maxId - 49
      val n = e.count()
      val shards = math.max(1L, n / 512L).toInt
      val dir = sys.props("java.io.tmpdir") +
        s"/graft_idx/hnswinc_${Registry.pathKey(d)}"
      IndexStore.writeHnsw(
        Hnsw.build(e.where(col("vec_id") < cut), "vec_id", "embedding",
          shards, params), params, dir)
      val (loaded, _) = IndexStore.loadHnsw(s, dir)
      val grown = Hnsw.insert(loaded, e.where(col("vec_id") >= cut),
        "vec_id", "embedding", shards, params)
      IndexStore.writeHnsw(grown, params, dirPlus)
      val prepared = Hnsw.prepareServing(IndexStore.loadHnsw(s, dirPlus)._1)
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      prepared.count()
      prepared
    }
    val ann = Hnsw.search(graph, probes, "probe_id", "pv", k = 10, params,
      residentKey = Some(s.sparkContext.applicationId + ":" + dirPlus),
      prepared = true)
    val exact = Similarity.bruteForceTopK(e, probes, "vec_id", "embedding",
      "probe_id", "pv", 10)
    Similarity.recallContract(ann, exact, "probe_id", "vec_id", k = 10,
      minHits = 7.0)
  }, Some(PipelineQueries.annContractSql))

  /** Q224 (ER3, sorted-neighborhood fuzzy match): the merge/purge
    * blocking family ([[graft.ext.EntityResolution.sortedNeighborhoodPairs]],
    * Hernández & Stolfo 1995) over the distinct part names — sort by the
    * canonical key, compare each name with its 4 successors, verify with
    * the native Jaro–Winkler at 0.8. Candidate volume is exactly
    * n·(w−1), skew-free by construction; the global order comes from the
    * two-level sharded rank, never a single-task sort. Hash-exact gate:
    * the DuckDB twin re-derives ranks with `row_number` and scores with
    * its own `jaro_winkler_similarity` (semantics pinned bit-for-bit by
    * q196/StringSimSpec). 150 pairs at sf0.01. */
  val q224 = GQuery("q224_er_sorted_neighborhood", (s, d) => {
    import graft.ext.EntityResolution
    val names = t(s, d, "part").select(col("p_name")).distinct()
      .select(col("p_name").as("pid"), col("p_name").as("pname"))
    EntityResolution.scorePairs(
        EntityResolution.sortedNeighborhoodPairs(names, "pid", "pname",
          lower(trim(col("pname"))), windowSize = 5, shards = 8),
        threshold = 0.8)
      .select(col("name_a"), col("name_b"), col("jw_sim"))
      .orderBy("name_a", "name_b")
  },
    Some("""WITH nm AS (SELECT DISTINCT p_name FROM part),
           |r AS (SELECT p_name,
           |        row_number() OVER (ORDER BY lower(trim(p_name)), p_name) - 1 AS rk
           |      FROM nm)
           |SELECT a.p_name AS name_a, b.p_name AS name_b,
           |  round(jaro_winkler_similarity(a.p_name, b.p_name), 6) AS jw_sim
           |FROM r a JOIN r b ON b.rk - a.rk BETWEEN 1 AND 4
           |WHERE round(jaro_winkler_similarity(a.p_name, b.p_name), 6) >= 0.8
           |ORDER BY name_a, name_b""".stripMargin))

  /** Q225 (N11″, incremental LSH append): the q187 serving bundle grown
    * by an increment instead of rebuilt — base index (all but the top-50
    * ids) built + persisted, the increment hashed map-only and APPENDED
    * to the stored bucket and vector tables
    * ([[graft.ext.IndexStore.appendLsh]] — LSH hashing is
    * data-independent, so the appended rows are bit-identical to a
    * rebuild's), then the q30-family recall contract over the union
    * corpus through the pruned stored-search path. Completes the
    * incremental-serving matrix: text MinHash (q190), graph HNSW
    * (q223), hash LSH (here). */
  val q225 = GQuery("q225_ann_lsh_append", (s, d) => {
    import graft.ext.{IndexStore, LshIndex, Similarity}
    val e = t(s, d, "embeddings")
    val probes = e.where(col("vec_id") < 5)
      .select(col("vec_id").as("probe_id"), col("embedding").as("pv"))
    val stored = LshIndex.cachedStored(
        s.sparkContext.applicationId + ":lshapp:" + d) {
      val maxId = e.agg(max(col("vec_id"))).head().getLong(0)
      val cut = maxId - 49
      val base = e.where(col("vec_id") < cut)
      val built = LshIndex.build(base, "vec_id", "embedding",
        tables = 8, dim = 64)
      val dir = sys.props("java.io.tmpdir") +
        s"/graft_idx/lshapp_${Registry.pathKey(d)}"
      IndexStore.writeLsh(built, dir)
      IndexStore.writeLshVectors(base, "vec_id", "embedding", dir)
      LshIndex.drop(built)
      IndexStore.appendLsh(e.where(col("vec_id") >= cut),
        "vec_id", "embedding", dir)
      LshIndex.Stored(IndexStore.loadLsh(s, dir),
        IndexStore.loadLshVectors(s, dir))
    }
    val ann = LshIndex.searchStored(stored.index, stored.vectors, probes,
      "vec_id", "embedding", "probe_id", "pv", k = 10)
    val exact = Similarity.bruteForceTopK(e, probes, "vec_id", "embedding",
      "probe_id", "pv", 10)
    Similarity.recallContract(ann, exact, "probe_id", "vec_id", k = 10,
      minHits = 2.0)
  }, Some(PipelineQueries.annContractSql))

  val all: Seq[GQuery] =
    Seq(q218, q219, q220, q221, q222, q223, q224, q225)
}
