package graft.ext

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graft.DeletionNeighborhood

/** Exact edit-distance similarity join over short attribute strings.
  *
  * Finds ALL pairs of records whose strings are within Levenshtein
  * distance `d` — the entity-resolution join (merged `customer` /
  * `supplier` / `part` feeds keyed on typo-prone names and codes) and
  * the canonical string-similarity-join benchmark operator. Unlike the
  * q196 blocked JW match (a recall-tuned heuristic whose block key can
  * split a true pair), this join is EXACT: candidate generation by
  * deletion neighborhood ([[org.apache.spark.sql.graft.DeletionNeighborhood]]
  * — Mor & Fraenkel 1982 / FastSS, the SymSpell index family) provably
  * surfaces every pair within distance d, and each candidate is verified
  * with the built-in codegen'd `levenshtein` before it is emitted.
  *
  * == 100 TB design ==
  *
  * The cross product never materializes. The join runs over DISTINCT
  * strings only: identical strings are collapsed to one representative
  * before variant expansion (one hash-aggregate on the string), so a hot
  * ATTRIBUTE VALUE — thousands of records sharing the literal same name,
  * the NORMAL shape for customer/author/site fields — costs ONE variant
  * expansion, ONE set of join rows, and ONE Levenshtein verify instead
  * of c of each (and c² candidate join rows; a variant hash shared by c
  * duplicate records would otherwise mint c² rows, and exactness forbids
  * dropping hot keys since every shared variant can witness a true pair).
  * Each distinct string is then expanded map-side to Σ_{i≤d} C(len, i)
  * 8-byte variant hashes (the native expression hashes before anything
  * leaves the scan — key width is independent of attribute length),
  * candidates form on one hash-equi-join shuffle, are deduplicated on
  * the representative pair — a pair sharing many variants costs one
  * verify — and the O(len²) Levenshtein DP runs only on deduped
  * candidate pairs of distinct strings. Verified pairs are finally
  * expanded back over both groups' id lists (map-side generate, no
  * shuffle), and within-group pairs are emitted directly at distance 0.
  * Output cardinality for a value shared by c records is C(c,2) — that
  * quadratic is the operator's OUTPUT, inherent to exact semantics, not
  * a join blow-up; it is produced by generate, never shuffled. The one
  * remaining per-group EXECUTOR-side bound is the id array, built in a
  * single aggregation-buffer row (8 bytes per duplicate of one value —
  * 10⁶ duplicates ≈ 8 MB, fine; beyond that the within-group output
  * itself is the problem, not the array) — nothing about it touches the
  * driver, so it is executor memory, not driver memory, that sizes hot
  * values. Ids need NOT be unique: the group representative is the
  * (min id, string) struct, distinct per group by construction, so a
  * dirty id shared by two different strings cannot collide two groups'
  * representatives (and duplicate (id, string) rows collapse in the
  * collect_set). The documented domain is short attribute strings (names,
  * titles, codes: len ≲ 50, d ≤ 2), where the expansion is a few
  * hundred keys per string; this is an ER primitive, not a document
  * operator — document-scale near-dup belongs to the D-family
  * (MinHash/SimHash).
  */
object EditJoin {

  // Process-wide staging root for blocked-join slice files, deleted by
  // a JVM shutdown hook. Slices must outlive this call (the returned
  // plan reads them lazily), so per-call deletion is impossible — but
  // the round-13 cut never deleted them AT ALL, leaking one tmp dir per
  // prefixBlocks>1 join across runs. One root + one hook bounds the
  // leak to the process lifetime; each join stages under its own
  // subdirectory so concurrent joins never collide.
  private lazy val stagingRoot: java.nio.file.Path = {
    val root = java.nio.file.Files.createTempDirectory("graft-editjoin")
    Runtime.getRuntime.addShutdownHook(new Thread(() => {
      try {
        java.nio.file.Files.walk(root)
          .sorted(java.util.Comparator.reverseOrder())
          .forEach(p => { java.nio.file.Files.deleteIfExists(p); () })
      } catch { case _: Exception => () }
    }, "graft-editjoin-staging-gc"))
    root
  }

  /** All pairs (id_a < id_b) with lev(s_a, s_b) <= maxDist, plus the
    * distance. Null strings drop out (they can match nothing). One
    * string-collapse shuffle + one equi-join shuffle on the variant hash
    * + one dedup shuffle on the representative pair; the verify is
    * map-side on deduped distinct-string candidates, and the fan-out
    * back to record ids is generate-only.
    *
    * `prefixBlocks` (default 1 = off) is the documented mitigation for
    * the gsf10 memory-pressure finding (BASELINE §Round 10: runtime
    * exponent 1.34 above the candidate exponent 1.17 with the working
    * set near heap — candidate density concentrating on dense key
    * regions): when > 1, the candidate join and its occurrence-dedup
    * aggregate are DECOMPOSED into `prefixBlocks` independent slices of
    * the variant-key space (block = pmod(vkey, B) — EXACT, because
    * candidates only ever form on EQUAL variant keys, so every pair
    * lives wholly inside one block for each shared key). Each slice's
    * exchange and dedup hold ~1/B of the candidate volume, bounding the
    * IN-FLIGHT working set (slices run sequentially — see the inline
    * note); a pair colliding in several blocks is re-deduplicated by
    * one global PAIR-level aggregate (pairs ≪ candidate occurrences)
    * before the one-per-pair verify. Same rows out, bit for bit
    * (EditJoinSpec pins blocks ≡ default). Measured at gsf10
    * (BASELINE §Round 12): B=8 cuts peak heap 63.5 → 50 GiB at 1.7×
    * wall, and COMPLETES at the 48 GiB heap where the B=1 leg
    * GC-killed the context — an OOM-death → bounded-memory-completion
    * converter, not a speedup; pick the smallest B that fits.
    *
    * CONTRACT when `prefixBlocks > 1`: the call EAGERLY EXECUTES the
    * collapse + per-slice candidate jobs (slices must run one at a
    * time for the bound to be real), so it is not a lazy plan-building
    * API on that path — budget the call as a job, not a plan. Slice
    * outputs land in a JVM-lifetime temp parquet staging dir (pairs ≪
    * candidate occurrences; the 100 TB analogue is a staging table),
    * NOT block-manager persists — repeated blocked joins leak no
    * storage blocks (round-12 advisor finding), and the returned plan
    * reads the staged files. */
  def join(records: DataFrame, idCol: String, strCol: String,
      maxDist: Int, prefixBlocks: Int = 1): DataFrame = {
    require(maxDist >= 1 && maxDist <= 3, "maxDist must be in [1, 3]")
    require(prefixBlocks >= 1, "prefixBlocks must be >= 1")
    val base = records
      .where(col(idCol).isNotNull && col(strCol).isNotNull)
      .select(col(idCol).as("__id"), col(strCol).as("__s"))
    // exact-duplicate collapse: one row per DISTINCT string, carrying the
    // sorted id list (collect_set: a duplicate (id, string) ROW costs
    // nothing and cannot double-emit pairs). The representative is the
    // (min id, string) STRUCT, not the bare min id: ER inputs are dirty
    // by nature and the same id can appear with two different strings, in
    // which case two groups would share a bare min-id representative and
    // the `a.__rid < b.__rid` triangle condition would silently drop ALL
    // cross pairs between them (round-9 advisor item). The string
    // component makes representatives distinct per group BY CONSTRUCTION
    // (groups are keyed on the string), and struct comparison is
    // lexicographic, so `<` stays a strict total order over groups.
    val groups = base
      .groupBy(col("__s"))
      .agg(sort_array(collect_set(col("__id"))).as("__ids"))
      .withColumn("__rid",
        struct(element_at(col("__ids"), 1).as("id"), col("__s").as("s")))
    // within-group pairs: identical strings are at distance 0 by
    // definition — emitted map-side (double generate + triangle filter),
    // no join and no verify
    val eqPairs = groups
      .where(size(col("__ids")) >= 2)
      .select(explode(col("__ids")).as("id_a"), col("__ids"))
      .select(col("id_a"), explode(col("__ids")).as("id_b"))
      .where(col("id_a") < col("id_b"))
      .select(col("id_a"), col("id_b"), lit(0L).as("lev"))
    // explode_outer + post-filter: keeps InferFiltersFromGenerate from
    // cloning the neighborhood expression into a pre-filter (the q68 /
    // winnowing discipline; the array is never empty, so no rows are lost)
    val keys = groups
      .select(col("__rid"),
        explode_outer(DeletionNeighborhood(col("__s"), maxDist)).as("__vkey"))
      .filter(col("__vkey").isNotNull)
    // shuffle_hash hint: the exploded side's size ESTIMATE is the scan
    // size, so the planner broadcast the ~20×-larger expansion and ran
    // the join inside the scan's 1–2 input splits — one core chewing
    // hundreds of millions of candidates (caught live at the 100× scale
    // point). The hint forces a vkey shuffle: full parallelism, and the
    // two identical exchanges dedupe via ReusedExchange.
    // pair dedup as an aggregate with the strings carried via first()
    // (the representative struct determines the string, so first is
    // deterministic): grouping keys are the slim (id, short-string)
    // struct pair, the map side absorbs duplicate candidates, and —
    // decisive — the lev filter below CANNOT be pushed through the
    // aggregate (its inputs are aggregate results, not grouping
    // columns; filtering on the structs' own `s` fields would let the
    // optimizer push `lev <= d` under the dedup and run the O(len²) DP
    // once per candidate OCCURRENCE instead of once per pair)
    def candFor(ks: DataFrame) = ks.as("a")
      .join(ks.as("b").hint("shuffle_hash"),
        col("a.__vkey") === col("b.__vkey") && col("a.__rid") < col("b.__rid"))
      .groupBy(col("a.__rid").as("__ra"), col("b.__rid").as("__rb"))
      .agg(first(col("a.__rid").getField("s")).as("__sa"),
        first(col("b.__rid").getField("s")).as("__sb"))
    val cand =
      if (prefixBlocks == 1) candFor(keys)
      else {
        // block-decomposed candidate stage (see scaladoc): each slice of
        // the variant-key space joins and dedups independently — exact,
        // since candidates only form on equal keys — then one global
        // PAIR-level dedup collapses pairs that collided in > 1 block.
        // Slices run SEQUENTIALLY against a DISK-persisted key table,
        // each landing its pair output on disk before the next starts:
        // the round-11 cut unioned the B lazy slices into ONE job,
        // whose independent stages Spark schedules CONCURRENTLY — the
        // gsf1 probe measured B=8 at MORE peak heap than B=1 (11.3 vs
        // 8.8 GiB), the exact opposite of the knob's purpose (and each
        // lazy slice re-ran the string-collapse aggregate). Three rules
        // make the bound real: (1) the variant expansion materializes
        // ONCE, DISK_ONLY, so slices re-read bytes instead of re-paying
        // the collapse aggregate and without competing for storage
        // heap; (2) slices execute one at a time (eager count), so at
        // most one slice's join+dedup working set (~1/B of the
        // candidate volume) is in flight; (3) slice outputs persist
        // DISK_ONLY (pairs ≪ candidate occurrences), off the heap. The
        // returned plan is partially materialized at call time — the
        // price of an opt-in memory-bounding knob; a 100 TB deployment
        // would land slices in a staging table instead.
        import org.apache.spark.storage.StorageLevel
        val keysP = keys.persist(StorageLevel.DISK_ONLY)
        keysP.count()
        // slice outputs stage as parquet FILES, not persisted blocks: a
        // DISK_ONLY persist here outlives the call (the returned plan
        // references the blocks, so this function cannot unpersist
        // them) and each repeated blocked join leaked B slice blocks to
        // the ContextCleaner's mercy. Files under the shutdown-hooked
        // [[stagingRoot]] have no block-manager footprint at all, and
        // the write is the same one-pass disk landing the persist paid.
        val stage = java.nio.file.Files
          .createTempDirectory(stagingRoot, "join").toString
        (0 until prefixBlocks).foreach { i =>
          // sequential: one slice's join+dedup working set in flight
          candFor(keysP.where(
              pmod(col("__vkey"), lit(prefixBlocks.toLong)) === i.toLong))
            .write.mode("overwrite").parquet(s"$stage/slice_$i")
        }
        keysP.unpersist(false) // slices are materialized; drop the keys
        records.sparkSession.read.parquet(
            (0 until prefixBlocks).map(i => s"$stage/slice_$i"): _*)
          .groupBy(col("__ra"), col("__rb"))
          .agg(first(col("__sa")).as("__sa"), first(col("__sb")).as("__sb"))
      }
    val repPairs = cand
      .withColumn("__lev", levenshtein(col("__sa"), col("__sb")))
      .where(col("__lev") <= maxDist)
    // fan verified distinct-string pairs back out over both id lists;
    // a dirty id appearing in BOTH groups would fan out to a degenerate
    // (x, x) self-pair — dropped, mirroring the per-record join's
    // `id_a < id_b`; least/greatest then yields each record pair once
    // per verified group pair
    val crossPairs = repPairs
      .join(groups.select(col("__rid").as("__ra"), col("__ids").as("__ia")), "__ra")
      .join(groups.select(col("__rid").as("__rb"), col("__ids").as("__ib")), "__rb")
      .select(col("__lev"), explode(col("__ia")).as("__xa"), col("__ib"))
      .select(col("__lev"), col("__xa"), explode(col("__ib")).as("__xb"))
      .where(col("__xa") =!= col("__xb"))
      .select(least(col("__xa"), col("__xb")).as("id_a"),
        greatest(col("__xa"), col("__xb")).as("id_b"),
        col("__lev").cast("long").as("lev"))
    crossPairs.unionByName(eqPairs)
  }
}
