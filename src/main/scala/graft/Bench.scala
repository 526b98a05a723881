package graft
import org.apache.spark.sql.SparkSession

/** Benchmark main (driver contract): run every declared query on
  * SPARK_GRAFT_SF_DIR, print ONE JSON line with per-query seconds.
  *
  * Each query is forced through a `noop` sink — full plan execution with
  * all output columns materialized — rather than `count()`, which would let
  * Catalyst prune the plan down to a row count. */
object Bench {

  private def buildSession(cpus: String): SparkSession = {
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      // INT64-micros timestamps (not legacy INT96, which parquet writes
      // WITHOUT column statistics): manifest bounds and row-group skipping
      // on time columns only exist with spec-compliant INT64 timestamps
      .config("spark.sql.parquet.outputTimestampType", "TIMESTAMP_MICROS")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // The bounded-table windows (vocabulary ranks, ≤10⁴-row model tables)
    // legitimately run partitionless; their per-task WindowExec warning is
    // boilerplate that flooded the round-7 killed run's only diagnostics.
    org.apache.logging.log4j.core.config.Configurator.setLevel(
      "org.apache.spark.sql.execution.window.WindowExec",
      org.apache.logging.log4j.Level.ERROR)
    spark
  }

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    var spark = buildSession(cpus)
    // Warm-up: compile a REPRESENTATIVE join+agg+window plan, not just
    // sum(range) — the first heavy whole-stage-codegen compile otherwise
    // lands on whatever query sorts first alphabetically (q09 absorbed ~8 s
    // of compile cost in round 1's bench).
    locally {
      import org.apache.spark.sql.expressions.Window
      import org.apache.spark.sql.functions._
      val fact = spark.range(200000).select(col("id"),
        (col("id") % 100).as("k"), (col("id") % 7).cast("decimal(18,2)").as("v"))
      val dim = spark.range(100).select(col("id").as("k"), (col("id") % 5).as("g"))
      fact.join(dim, "k").groupBy("g")
        .agg(round(sum(col("v") * (lit(1) - col("v"))).cast("double"), 2).as("m"),
          count(lit(1)).as("c"))
        .withColumn("rs", sum(col("c")).over(
          Window.partitionBy(col("g")).orderBy(col("m"))
            .rowsBetween(Window.unboundedPreceding, Window.currentRow)))
        .orderBy("g")
        .write.format("noop").mode("overwrite").save()
    }
    // Three reps PER QUERY, run back-to-back, minimum reported. Why this
    // shape: a whole-suite pass is hostage to whatever the host does during
    // that minute (round 2's driver run showed q04–q17 uniformly 2–4×
    // slower than steady state; round 4's showed phantom 3.5–3.9× spikes
    // on q26/q27 that a same-day judge rerun disproved). Consecutive reps
    // localize contention to one query's window, rep 1 warms the page
    // cache for reps 2–3, and the min of three cannot be produced by a
    // single contended rep. Every rep's time is emitted under "passes" so
    // a contended rep is VISIBLE in the artifact instead of silently
    // polluting the headline. Failures are flagged in-band with a negative
    // time so the driver artifact can't report a broken suite as healthy.
    // Default 2 (was 3 through round 7): the suite is 221 entries and
    // outgrew the driver's kill budget at 3 reps (BENCH_r07 rc=124). Every
    // rep stays visible under "passes", so a contended rep is still
    // detectable; min-of-2 back-to-back is what the judge's own reruns use.
    val reps = sys.env.getOrElse("SPARK_GRAFT_BENCH_REPS", "2").toInt
    // optional subset (comma-separated name prefixes) — the sf1 scaling
    // checkpoint times the expensive queries without the full suite
    val only = sys.env.get("SPARK_GRAFT_BENCH_ONLY")
      .map(_.split(",").map(_.trim).filter(_.nonEmpty).toSeq)
    // Suite-wall rotation (round-8 ask #8; the full suite outgrew the
    // driver's budget — 753 s sbt wall in round 10 on the trajectory that
    // killed round 7). STABLE entries — unchanged for ≥2 rounds and not a
    // headline — are split into two deterministic halves by name-hash
    // parity, and each driver round runs one half, alternating. HOT entries
    // (headlines, this round's new/changed queries, and the documented
    // drift-watch set) always run. The parity follows the driver's own
    // round counter: the max N among BENCH_r{N}.json artifacts in the repo
    // root (this run produces N+1). Override with SPARK_GRAFT_BENCH_GROUP
    // (0/1 = force half, "all" = no rotation); BENCH_ONLY subsets skip
    // rotation entirely (they are already explicit).
    val hotPrefixes = Seq(
      // headlines (BASELINE §1)
      "q08_", "q09_", "q15_", "q24_",
      // round-11/12 new/changed paths: inverted-index appends, map-only
      // langid serve, bucket-clustered LSH fetch, MOR join views,
      // pruned stored-MinHash serving, block-decomposed edit join
      "q187", "q177", "q191", "q208", "q228", "q232", "q233", "q234",
      "q235", "q236", "q237", "q190", "q220",
      // round-15 new/changed: pHash tier + the re-ranged script profile
      "q244", "q248", "q249", "q250", "q251", "q252", "q253", "q254", "q255", "q256", "q257",
      // round-16 new/changed: q244 localization family, quad cross-modal,
      // SQL time travel, video bundle serve
      "q258", "q259", "q260", "q261", "q262", "q263", "q264", "q265",
      // round-17 new: SQL CDC feed + SQL MERGE INTO + metadata tables
      "q266", "q267", "q268",
      // round-18 new: SQL row-level DML + snapshot rollback + column DDL
      "q269", "q270", "q271", "q272", "q273", "q274", "q275",
      // drift-watch (VERDICT r10 What's-wrong #2 named regressors)
      "q78", "q88", "q55", "q182")
    val group = sys.env.get("SPARK_GRAFT_BENCH_GROUP")
    val rotateOff = only.isDefined || group.contains("all")
    val parity: Int = group.filter(g => g == "0" || g == "1").map(_.toInt)
      .getOrElse {
        val rs = Option(new java.io.File(".").listFiles()).getOrElse(Array.empty)
          .flatMap(f => "BENCH_r(\\d+)\\.json".r.findFirstMatchIn(f.getName)
            .map(_.group(1).toInt))
        if (rs.isEmpty) 0 else (rs.max + 1) % 2
      }
    def nameParity(n: String): Int = {
      val d = java.security.MessageDigest.getInstance("MD5")
        .digest(n.getBytes(java.nio.charset.StandardCharsets.UTF_8))
      java.lang.Byte.toUnsignedInt(d(0)) % 2
    }
    // RAW run closures from the registry — SparkEntry.queries composes
    // setup+run for the driver's one-closure contract, but the bench
    // runs an entry's fixture `setup` UNTIMED (below), so the timed
    // body prices the query alone (VERDICT r17 #4: the fixture-heavy
    // entries q266/q267/q268 topped the drift table with create+commit
    // lifecycle cost that is not query time)
    val all = graft.queries.Registry.all.map(q => q.name -> q.run)
      .sortBy(_._1)
      .filter { case (n, _) => only.forall(_.exists(n.startsWith)) }
    val setupSecs = scala.collection.mutable.LinkedHashMap.empty[String, Double]
    def runSetup(name: String): Unit =
      graft.queries.Registry.byName.get(name).flatMap(_.setup).foreach { st =>
        val t0 = System.nanoTime()
        try st(spark, sfDir)
        catch { case e: Throwable =>
          System.err.println(s"[bench] setup $name failed: $e") }
        setupSecs(name) =
          setupSecs.getOrElse(name, 0.0) + (System.nanoTime() - t0) / 1e9
      }
    val (named, rotatedOut) =
      if (rotateOff) (all, Seq.empty[String])
      else {
        val (run, skip) = all.partition { case (n, _) =>
          hotPrefixes.exists(n.startsWith) || nameParity(n) == parity }
        (run, skip.map(_._1))
      }
    if (rotatedOut.nonEmpty)
      System.err.println(s"[bench] rotation parity=$parity: running " +
        s"${named.size}/${all.size} entries (${rotatedOut.size} stable " +
        "entries deferred to the alternate half)")
    val wallT0 = System.nanoTime()
    // Untimed WARM phase (round-11 verdict, Next-round #1a): every entry
    // backed by a build-once/serve-many memo (index builds, model
    // training, stored-bundle creation) runs ONCE before the timed loop,
    // so rep 1 of the timed window prices steady-state serving instead
    // of a multi-second lifecycle — the mechanism that made q232's rep-1
    // training bleed into alphabetical neighbors' readings. Warm times
    // are emitted under "warm" so the lifecycle cost stays VISIBLE in
    // the artifact; it just no longer contaminates the regression signal.
    // Memo FAMILY GROUPS: entries in one group share serving state
    // (same memo key or same family), so warm → time → RELEASE runs per
    // group and every memo-backed entry is timed with only its own
    // group's state resident. Why groups and not one big memo phase:
    // the all-resident protocol skewed ANN readings ~3× (q177 read
    // 0.93 s with only its family resident, 2.65–3.2 s under the full
    // 23-family residency; bisection showed no single culprit family —
    // it is the TOTAL), and heap sizing did not remove it (unchanged at
    // 32g). Grouping respects shared keys so nothing rebuilds: q78/
    // q175/q178 share the IVF+PQ ":"+d builds, q228/q232 share the
    // langid train-once memo, append twins share their family.
    val warmGroups: Seq[Seq[String]] = Seq(
      Seq("q78_", "q175", "q178"),
      Seq("q177"), Seq("q179_"), Seq("q187"),
      Seq("q190", "q236", "q238"), Seq("q191", "q233", "q237"),
      Seq("q193"), Seq("q194"), Seq("q208", "q234"), Seq("q215"),
      Seq("q219", "q223"), Seq("q225"), Seq("q226"), Seq("q227"),
      Seq("q228", "q232"), Seq("q229"), Seq("q242"), Seq("q245"),
      Seq("q250"), Seq("q256"), Seq("q262"))
    val warmPrefixes = warmGroups.flatten
    val warmed = scala.collection.mutable.ArrayBuffer.empty[(String, Double)]
    // Previous per-entry times (most recent bench_history run containing
    // the entry with a clean time) — the round-11 verdict's ask #2: the
    // drift comparison belongs IN the artifact, against the last run the
    // entry actually appeared in, whatever round that was.
    val (lastTimes, lastHashes): (Map[String, Double], Map[String, String]) = {
      val histDir = java.nio.file.Paths.get("target", "bench_history")
      if (!java.nio.file.Files.exists(histDir)) (Map.empty, Map.empty)
      else {
        val om = new com.fasterxml.jackson.databind.ObjectMapper()
        // Files.list holds a directory handle until closed (round-12
        // advisor: the unclosed stream leaked one fd per bench run)
        val listing = java.nio.file.Files.list(histDir)
        val sorted =
          try scala.jdk.CollectionConverters.IteratorHasAsScala(
            listing.iterator()).asScala.toSeq
            .sortBy(_.getFileName.toString) // ts-stamped names
          finally listing.close()
        sorted.foldLeft((Map.empty[String, Double], Map.empty[String, String])) {
          case ((accT, accH), p) =>
            try {
              val node = om.readTree(java.nio.file.Files.readAllBytes(p))
              val qs = node.get("queries")
              val runSf = Option(node.get("sf")).map(_.asText()).getOrElse("")
              if (qs == null || runSf != sfDir) (accT, accH) // same-SF runs only
              else {
                val it = qs.properties().iterator()
                var m = accT
                while (it.hasNext) {
                  val e = it.next()
                  val v = e.getValue.asDouble()
                  if (v > 0) m = m.updated(e.getKey, v) // later files win
                }
                // per-entry SHAPE hash recorded by newer runs: when the
                // entry's time updates from this file, its hash (or its
                // absence — pre-field file) updates WITH it, so time and
                // shape always describe the same run
                var h = accH
                val hs = node.get("query_hash")
                val it2 = qs.properties().iterator()
                while (it2.hasNext) {
                  val e = it2.next()
                  if (e.getValue.asDouble() > 0) {
                    val hv = Option(hs).flatMap(n => Option(n.get(e.getKey)))
                      .map(_.asText())
                    h = hv.fold(h - e.getKey)(v => h.updated(e.getKey, v))
                  }
                }
                (m, h)
              }
            } catch { case _: Exception => (accT, accH) }
        }
      }
    }
    // Shape-change marker (VERDICT r16 #6): a RESTRUCTURED entry — its
    // gated SQL changed since the history run its "last clean" time came
    // from — compares against a DIFFERENT query, so its drift row is a
    // restructure artifact, not host noise (r16 shipped q258 at 2.33×/
    // q244 at 1.50× exactly this way). Identity = md5 of the entry's
    // oracle SQL (the gated text both engines run); spec-gated entries
    // without oracle SQL hash their name — undetectable restructures
    // there are accepted and documented. Restructured entries are
    // EXCLUDED from the drift gate and listed under "restructured".
    def entryHash(n: String): String = {
      val basis = SparkEntry.oracleSql.getOrElse(n, n)
      java.security.MessageDigest.getInstance("MD5")
        .digest(basis.getBytes(java.nio.charset.StandardCharsets.UTF_8))
        .take(8).map(b => f"$b%02x").mkString
    }
    val restructured: Set[String] = lastTimes.keySet.filter { n =>
      lastHashes.get(n).exists(_ != entryHash(n))
    }
    // Round-7 lesson (`target/bench_latest.json`): a query that OOMs the
    // SparkContext poisons every query after it — each "fails" in
    // milliseconds against a dead session and the artifact reports phantom
    // errors. After any failure, check the context and rebuild it loudly so
    // one bad query costs one bad entry, not the rest of the suite.
    var rebuilds = 0
    // Interleaved CANARY (round-11 verdict, Next-round #1b): one fixed,
    // light, steady query timed every `canaryEvery` entries. Its spread
    // across the suite localizes contention — a drifting canary flags a
    // contaminated region of the artifact instead of letting a heavy
    // neighbor's session pressure masquerade as a per-query regression.
    val canaryName = "q08_join_agg"
    val canaryFn = graft.queries.Registry.byName.get(canaryName).map(_.run)
    val canaryEvery = 20
    val canary = scala.collection.mutable.ArrayBuffer.empty[Double]
    def runCanary(): Unit = canaryFn.foreach { fn =>
      val t0 = System.nanoTime()
      try {
        fn(spark, sfDir).write.format("noop").mode("overwrite").save()
        canary += (System.nanoTime() - t0) / 1e9
      } catch { case e: Throwable =>
        System.err.println(s"[bench] canary failed: $e") }
    }
    // canary plan warm-up (untimed, TWICE): the very first q08 execution
    // pays its whole-stage-codegen compile, and the second still reads a
    // cold page cache — a round-13 clean run measured the first recorded
    // reading at 0.62 vs a 0.30 floor (spread 2.07) purely from this,
    // tripping the self-heal on a run that needed no healing
    (1 to 2).foreach { _ =>
      canaryFn.foreach { fn =>
        try fn(spark, sfDir).write.format("noop").mode("overwrite").save()
        catch { case _: Throwable => () }
      }
    }
    runCanary()
    // Per-group warm → time → release (the cross-family-residency fix,
    // BASELINE §Round 12), then the stateless entries against an
    // unpressured block manager.
    var timedCount = 0
    val timedBuf = scala.collection.mutable.LinkedHashMap.empty[String, Seq[Double]]
    // per-entry canary interval (index of the last canary reading taken
    // BEFORE the entry ran): the self-heal pass maps a drifted canary
    // reading back to exactly the entries it brackets
    val entrySpan = scala.collection.mutable.Map.empty[String, Int]
    def timeOnce(name: String,
        fn: (SparkSession, String) => org.apache.spark.sql.DataFrame): Double = {
      runSetup(name) // fixture phase, untimed (recorded under "fixture_setup")
      val t0 = System.nanoTime()
      val ok =
        try { fn(spark, sfDir).write.format("noop").mode("overwrite").save(); true }
        catch { case e: Throwable => System.err.println(s"[bench] $name failed: $e"); false }
      val secs = (System.nanoTime() - t0) / 1e9
      if (!ok && spark.sparkContext.isStopped) {
        System.err.println(s"[bench] SparkContext DIED during $name — rebuilding session")
        rebuilds += 1
        spark = buildSession(cpus)
      }
      if (ok) secs else -secs
    }
    def timeEntry(name: String, fn: (SparkSession, String) => org.apache.spark.sql.DataFrame): Unit = {
      if (timedCount > 0 && timedCount % canaryEvery == 0) runCanary()
      timedCount += 1
      entrySpan(name) = canary.size - 1
      timedBuf(name) = (1 to reps).map(_ => timeOnce(name, fn))
    }
    val groups = warmGroups
      .map(g => named.filter { case (n, _) => g.exists(n.startsWith) })
      .filter(_.nonEmpty)
    // in-artifact residency attribution (VERDICT r12 #7): which entries
    // shared serving state while timed — an in-suite/isolated delta on
    // one of these is attributable to its group's residency, not to the
    // entry's own plan
    val groupOf: Map[String, Int] = groups.zipWithIndex.flatMap {
      case (g, i) => g.map { case (n, _) => n -> i } }.toMap
    val stateless = named.filterNot { case (n, _) =>
      warmPrefixes.exists(n.startsWith) }
    groups.foreach { g =>
      g.foreach { case (n, fn) =>
        runSetup(n)
        val t0 = System.nanoTime()
        try fn(spark, sfDir).write.format("noop").mode("overwrite").save()
        catch { case e: Throwable =>
          System.err.println(s"[bench] warm $n failed: $e") }
        warmed += n -> (System.nanoTime() - t0) / 1e9
      }
      // SERVE entries time first within their group (VERDICT r13 #4:
      // q232's in-suite reading carried ~1 s its isolated-group run did
      // not) — the warm pass just rebuilt the family, so a serve entry
      // timed immediately after prices exactly the steady state, before
      // the group's heavier build/aggregate twins churn the heap and
      // block manager under it. Deterministic: serve/search/probe names
      // first, original order within each half.
      val (serveFirst, rest) = g.partition { case (n, _) =>
        n.contains("serve") || n.contains("search") || n.contains("probe") }
      (serveFirst ++ rest).foreach { case (n, fn) => timeEntry(n, fn) }
      graft.ext.Memo.clearAllRegistered() // next group starts unpressured
    }
    if (warmed.nonEmpty)
      System.err.println(f"[bench] warm (grouped, untimed): ${warmed.size} " +
        f"entries, ${warmed.map(_._2).sum}%.1f s across ${groups.size} groups")
    stateless.foreach { case (n, fn) => timeEntry(n, fn) }
    runCanary()
    // ---- SELF-HEALING RE-TIME (VERDICT r12 Next-round #1) ----------
    // The canary DETECTS environment contention; this pass REPAIRS the
    // artifact instead of merely flagging it: every entry bracketed by
    // a canary reading > 2× the run's floor is re-timed once (min
    // across attempts kept — a contended rep can only ever ADD time),
    // within a wall budget so the repair cannot blow the driver's kill
    // window. Memo-group entries re-warm themselves first (one untimed
    // run rebuilds exactly their family state) and their groups release
    // after, preserving the per-group residency protocol.
    val fnOf = named.toMap
    val canaryFloor = if (canary.nonEmpty) canary.min else 0.0
    val badReadings = canary.zipWithIndex.collect {
      case (t, i) if canaryFloor > 0 && t > 2.0 * canaryFloor => i }.toSet
    val suspects: Seq[String] =
      if (badReadings.isEmpty) Seq.empty
      else timedBuf.toSeq.collect {
        case (n, ts) if ts.exists(_ >= 0) &&
          (badReadings.contains(entrySpan(n)) ||
            badReadings.contains(entrySpan(n) + 1)) => n }
    val retimed = scala.collection.mutable.ArrayBuffer.empty[String]
    val repairVerdicts = scala.collection.mutable.ArrayBuffer.empty[Boolean]
    def repairPass(toFix: Seq[String], maxWall: Double, label: String): Unit = {
      val warmCost = warmed.toMap
      def elapsed = (System.nanoTime() - wallT0) / 1e9
      System.err.println(f"[bench] $label: re-timing ${toFix.size} " +
        f"bracketed entries (wall budget $maxWall%.0f, elapsed $elapsed%.0f)")
      // stateless suspects first (no rebuild cost), then grouped ones
      // ordered cheapest-group-first; each entry is skipped — loudly —
      // if its estimated cost would cross the wall budget
      val (grouped, free) = toFix.partition(groupOf.contains)
      val orderedGroups = grouped.groupBy(groupOf).toSeq.sortBy { case (_, ns) =>
        ns.map(n => warmCost.getOrElse(n, 0.0) +
          timedBuf(n).filter(_ >= 0).map(math.abs).minOption.getOrElse(0.0)).sum
      }
      def retimeOne(n: String, est: Double): Unit = {
        if (elapsed + est > maxWall)
          System.err.println(f"[bench] retime SKIPPED $n (est $est%.1f s " +
            f"would cross wall budget $maxWall%.0f)")
        else {
          val t = timeOnce(n, fnOf(n))
          timedBuf(n) = timedBuf(n) :+ t
          if (t >= 0) retimed += n
        }
      }
      free.sortBy(n => timedBuf(n).map(math.abs).min).foreach { n =>
        retimeOne(n, timedBuf(n).map(math.abs).min * 1.5)
      }
      orderedGroups.foreach { case (_, ns) =>
        ns.foreach { n =>
          val base = timedBuf(n).map(math.abs).min
          val est = warmCost.getOrElse(n, base) + base * 1.5
          if (elapsed + est > maxWall)
            System.err.println(f"[bench] retime SKIPPED $n (est $est%.1f s " +
              f"would cross wall budget $maxWall%.0f)")
          else {
            // re-warm: one untimed run rebuilds this entry's family
            runSetup(n)
            try fnOf(n)(spark, sfDir).write.format("noop").mode("overwrite").save()
            catch { case e: Throwable =>
              System.err.println(s"[bench] retime warm $n failed: $e") }
            val t = timeOnce(n, fnOf(n))
            timedBuf(n) = timedBuf(n) :+ t
            if (t >= 0) retimed += n
          }
        }
        graft.ext.Memo.clearAllRegistered()
      }
      runCanary() // post-repair reading, visible in the artifact
      repairVerdicts += toFix.forall(retimed.contains)
    }
    if (suspects.nonEmpty) {
      val maxWall = sys.env.getOrElse("SPARK_GRAFT_BENCH_MAX_WALL", "545").toDouble
      System.err.println(f"[bench] canary flagged ${badReadings.size} " +
        f"readings (floor $canaryFloor%.2f) across ${suspects.size} entries")
      repairPass(suspects, maxWall, "repair-1")
      // ---- BOUNDED RETRY (VERDICT r14 Next-round #2) --------------
      // Round 14's driver artifact shipped canary_ok:false because the
      // first repair hit the 545 s wall with part of the queue
      // unrepaired (wall_s 545.1, 30/57 retimed). One more pass over
      // exactly the UNREPAIRED remainder runs under an extended budget
      // (still inside the driver window round 10's 753 s run survived)
      // before the artifact is written; BOTH passes' verdicts are
      // recorded under canary.repair_verdicts. A verdict still false
      // after the retry is emitted honestly — a host contended for the
      // entire window cannot be timed clean by insisting.
      if (!repairVerdicts.last) {
        val maxWall2 =
          sys.env.getOrElse("SPARK_GRAFT_BENCH_MAX_WALL_RETRY", "660").toDouble
        repairPass(suspects.filterNot(retimed.contains), maxWall2, "repair-2")
      }
    }
    val canaryOk = badReadings.isEmpty || suspects.forall(retimed.contains)
    // ---- PER-ENTRY DRIFT GATE (VERDICT r15 Next-round #2) ----------
    // The canary detects WINDOW contention; this gate catches per-entry
    // contamination the canary's sampling missed (round 15's artifact:
    // q68 12.4 s vs 1.2 s in the same binary's clean run 90 minutes
    // earlier — BOTH reps sat inside one contended span the canary never
    // sampled, so min-of-two was helpless and the proof lived in a side
    // file the driver never reads). Any entry whose min-of-passes
    // exceeds `driftLimit`× its last clean time (bench_history, same SF)
    // by a real absolute margin is re-timed — but only inside a
    // CANARY-VERIFIED quiet window (a fresh canary reading ≤ 2× floor;
    // re-timing inside the noise proves nothing) and inside the wall
    // budget. Entries still over the limit after the retry are emitted
    // under "drift_suspects" WITH the evidence (last clean, min now,
    // ratio) — a suspect is "could not reproduce the historical time
    // this run", visible in the artifact instead of silently polluting
    // "queries". Tiny entries are exempt via the absolute floor: a
    // 0.05 s → 0.2 s wobble is scheduler noise, not contamination.
    val driftLimit =
      sys.env.getOrElse("SPARK_GRAFT_BENCH_DRIFT_LIMIT", "3.0").toDouble
    def entryMin(n: String): Double = {
      val ok = timedBuf(n).filter(_ >= 0)
      if (ok.isEmpty) -1.0 else ok.min
    }
    def driftRatio(n: String): Option[Double] = lastTimes.get(n).flatMap { prev =>
      val now = entryMin(n)
      // a restructured entry's "last clean" timed a DIFFERENT query —
      // it reports under "restructured", never as drift
      if (restructured.contains(n)) None
      else if (now > 0 && prev > 0 && now - prev > 0.4) Some(now / prev) else None
    }
    def drifted(n: String): Boolean = driftRatio(n).exists(_ > driftLimit)
    val driftFlagged = timedBuf.keys.toSeq.filter(drifted)
    val driftRetimed = scala.collection.mutable.ArrayBuffer.empty[String]
    if (driftFlagged.nonEmpty) {
      val maxWall3 =
        sys.env.getOrElse("SPARK_GRAFT_BENCH_MAX_WALL_DRIFT", "720").toDouble
      def elapsed = (System.nanoTime() - wallT0) / 1e9
      System.err.println(f"[bench] drift gate: ${driftFlagged.size} entries " +
        f"exceed ${driftLimit}%.1f× their last clean time " +
        f"(${driftFlagged.mkString(",")}) — re-timing in quiet windows " +
        f"(wall budget $maxWall3%.0f, elapsed $elapsed%.0f)")
      val warmCost = warmed.toMap
      driftFlagged.sortBy(entryMin).foreach { n =>
        val est = warmCost.getOrElse(n, 0.0) + entryMin(n) * 1.5
        if (elapsed + est > maxWall3)
          System.err.println(f"[bench] drift retime SKIPPED $n " +
            f"(est $est%.1f s would cross wall budget $maxWall3%.0f)")
        else {
          runCanary()
          // canary can be EMPTY here (canary query missing or every
          // reading failed) — a log interpolation of canary.last would
          // crash the bench after all timing is done and lose the
          // artifact; an unverifiable window counts as not-quiet
          val lastReading = canary.lastOption.getOrElse(-1.0)
          val quiet = canaryFloor > 0 && canary.nonEmpty &&
            lastReading <= 2.0 * canaryFloor
          if (!quiet)
            System.err.println(f"[bench] drift retime DEFERRED $n — host " +
              f"not quiet (canary $lastReading%.2f vs floor $canaryFloor%.2f)")
          else {
            if (groupOf.contains(n)) {
              // re-warm the entry's memo family so the retime prices
              // steady-state serving, then release after
              runSetup(n)
              try fnOf(n)(spark, sfDir).write.format("noop").mode("overwrite").save()
              catch { case e: Throwable =>
                System.err.println(s"[bench] drift warm $n failed: $e") }
            }
            val t = timeOnce(n, fnOf(n))
            timedBuf(n) = timedBuf(n) :+ t
            if (t >= 0) driftRetimed += n
            if (groupOf.contains(n)) graft.ext.Memo.clearAllRegistered()
          }
        }
      }
    }
    // recompute with the appended retimes: an entry leaves the suspect
    // list iff its (possibly repaired) min is back inside the limit
    val driftSuspects = driftFlagged.filter(drifted)
    val driftSuspectsJson = driftSuspects.map { n =>
      "\"" + n + "\":" + f"""{"last":${lastTimes(n)}%.3f,"min":${entryMin(n)}%.3f,"ratio":${driftRatio(n).getOrElse(0.0)}%.2f,"retimed":${driftRetimed.contains(n)}}"""
    }.mkString("{", ",", "}")
    val driftGateOk = driftSuspects.isEmpty
    val timed: Seq[(String, Seq[Double])] = timedBuf.toSeq
    val results = timed.map { case (name, ts) =>
      // an entry is an error only when EVERY rep failed — a failed
      // self-heal retime appended to an otherwise-passing entry must
      // not poison it (the original reps already measured it; the
      // repair attempt's failure is its own noise, not the query's)
      val ok = ts.filter(_ >= 0)
      name -> (if (ok.nonEmpty) ok.min else -ts.map(math.abs).max)
    }
    val qs = results.map { case (k, v) => "\"" + k + f"""":$v%.3f""" }
      .mkString("{", ",", "}")
    val passes = timed.map { case (k, ts) =>
      "\"" + k + "\":" + ts.map(t => f"$t%.3f").mkString("[", ",", "]")
    }.mkString("{", ",", "}")
    val errs = results.filter(_._2 < 0).map { case (k, _) => "\"" + k + "\"" }
      .mkString("[", ",", "]")
    val total = results.map(v => math.abs(v._2)).sum
    val rotJson = rotatedOut.map("\"" + _ + "\"").mkString("[", ",", "]")
    val warmJson = warmed.map { case (k, v) => "\"" + k + f"""":$v%.3f""" }
      .mkString("{", ",", "}")
    // untimed fixture-phase seconds per entry (VERDICT r17 #4): the
    // lifecycle cost stays VISIBLE in the artifact without polluting
    // the per-query regression signal
    val setupJson = setupSecs.map { case (k, v) => "\"" + k + f"""":$v%.3f""" }
      .mkString("{", ",", "}")
    val canaryJson = canary.map(t => f"$t%.3f").mkString("[", ",", "]")
    val canarySpread =
      if (canary.size >= 2 && canary.min > 0) canary.max / canary.min else 0.0
    val contendedJson = suspects.map("\"" + _ + "\"").mkString("[", ",", "]")
    val retimedJson = retimed.map("\"" + _ + "\"").mkString("[", ",", "]")
    val repairVerdictsJson = repairVerdicts.mkString("[", ",", "]")
    // residency attribution: which entries were timed with a shared
    // memo family resident (grouped by warm group)
    val residentJson = groups.zipWithIndex.map { case (g, i) =>
      "\"g" + i + "\":" + g.map { case (n, _) => "\"" + n + "\"" }
        .mkString("[", ",", "]")
    }.mkString("{", ",", "}")
    // per-entry inverse (VERDICT r12 #7 / r13 #4 field): for each timed
    // entry, the families resident while it was timed — its own group's
    // other members under the per-group protocol, [] for stateless
    // entries (timed after every release)
    val residentOfJson = timedBuf.keys.map { n =>
      val fams = groupOf.get(n)
        .map(i => groups(i).map(_._1).filterNot(_ == n)).getOrElse(Seq.empty)
      "\"" + n + "\":" + fams.map("\"" + _ + "\"").mkString("[", ",", "]")
    }.mkString("{", ",", "}")
    val deltaPairs = results.filter(_._2 > 0).flatMap { case (k, v) =>
      lastTimes.get(k).map(prev => k -> v / prev)
    }
    val deltas = deltaPairs.map { case (k, r) => "\"" + k + f"""":$r%.2f""" }
      .mkString("{", ",", "}")
    // compact digest for the tail-captured summary (the full map would
    // blow the driver's 2000-char tail): how many entries compared, and
    // the 5 worst apparent regressions
    val driftWorst = deltaPairs.sortBy(-_._2).take(5)
      .map { case (k, r) => "\"" + k + f"""":$r%.2f""" }
      .mkString("{", ",", "}")
    val driftJson =
      s"""{"n_compared":${deltaPairs.size},"worst":$driftWorst}"""
    // per-entry shape hashes (consumed by the NEXT run's restructure
    // detection) + this run's restructured list
    val hashJson = timedBuf.keys.toSeq.sorted
      .map(n => "\"" + n + "\":\"" + entryHash(n) + "\"")
      .mkString("{", ",", "}")
    val restructuredJson = restructured.toSeq.sorted
      .map("\"" + _ + "\"").mkString("[", ",", "]")
    val wallS = (System.nanoTime() - wallT0) / 1e9
    val line = f"""{"metric":"total","value":$total%.3f,"unit":"sec","queries":$qs,"passes":$passes,"errors":$errs,"session_rebuilds":$rebuilds,"rotation_parity":$parity,"rotated_out":$rotJson,"warm":$warmJson,"fixture_setup":$setupJson,"warm_groups":$residentJson,"resident_families":$residentOfJson,"canary":{"name":"$canaryName","times":$canaryJson,"spread":$canarySpread%.2f,"ok":$canaryOk,"contended_spans":$contendedJson,"retimed":$retimedJson,"repair_verdicts":$repairVerdictsJson},"canary_ok":$canaryOk,"delta_vs_last_run":$deltas,"drift_suspects":$driftSuspectsJson,"drift_gate_ok":$driftGateOk,"restructured":$restructuredJson,"query_hash":$hashJson,"wall_s":$wallS%.1f,"sf":"$sfDir"}"""
    // The driver captures only the TAIL of stdout; at 230 entries the full
    // per-query line is ~10 KB and the tail has truncated it mid-map two
    // rounds running (BENCH_r08/r09 `parsed: null`). Persist the full line
    // to a file, archive it to a stamped path (so the next run stops
    // destroying this run's record), and print a COMPACT summary — total,
    // headline times, error count — as the LAST stdout line so the tail
    // capture always contains one complete, parseable JSON object.
    try {
      val out = java.nio.file.Paths.get("target", "bench_latest.json")
      java.nio.file.Files.createDirectories(out.getParent)
      java.nio.file.Files.write(out,
        (line + "\n").getBytes(java.nio.charset.StandardCharsets.UTF_8))
      val hist = java.nio.file.Paths.get("target", "bench_history",
        s"bench_${System.currentTimeMillis()}.json")
      java.nio.file.Files.createDirectories(hist.getParent)
      java.nio.file.Files.write(hist,
        (line + "\n").getBytes(java.nio.charset.StandardCharsets.UTF_8))
    } catch { case e: Exception => System.err.println(s"[bench] file write failed: $e") }
    val headlines = Seq("q08_join_agg", "q09_star_join_revenue", "q15_topk",
      "q24_cosine_topk")
    // Driver-legible per-query coverage (VERDICT r18 next-round #2): the
    // compact summary used to carry ONLY the 4 headlines, so the driver's
    // PERF comparison had n_common=4 of 172 and its scaling heuristic ran
    // on sub-second overhead-bound entries. Include the slowest entries —
    // the data-bound set whose round-over-round ratios actually measure
    // the engine — alongside the headlines: top 20 by min-of-passes plus
    // every entry ≥ 1 s, capped at 40 names (~1.1 KB) so the summary stays
    // inside the driver's tail-capture budget. Entry TIMES are unchanged;
    // this only widens which of them the compact line repeats.
    val slowSet: Set[String] = {
      val ok = results.filter(_._2 > 0)
      val byTime = ok.sortBy(-_._2)
      (byTime.take(20) ++ ok.filter(_._2 >= 1.0)).map(_._1).distinct
        .take(40).toSet
    }
    val hq = results.filter(r => headlines.contains(r._1) || slowSet(r._1))
      .map { case (k, v) => "\"" + k + f"""":$v%.3f""" }.mkString("{", ",", "}")
    val summary = f"""{"metric":"total","value":$total%.3f,"unit":"sec","queries":$hq,"entries":${results.size},"rotated_out":${rotatedOut.size},"rotation_parity":$parity,"error_count":${results.count(_._2 < 0)},"session_rebuilds":$rebuilds,"warm_s":${warmed.map(_._2).sum}%.1f,"canary":{"name":"$canaryName","times":$canaryJson,"spread":$canarySpread%.2f,"ok":$canaryOk,"contended_spans":$contendedJson,"retimed":$retimedJson,"repair_verdicts":$repairVerdictsJson},"canary_ok":$canaryOk,"drift":$driftJson,"drift_suspects":$driftSuspectsJson,"drift_gate_ok":$driftGateOk,"restructured":$restructuredJson,"wall_s":$wallS%.1f,"sf":"$sfDir","full":"target/bench_latest.json"}"""
    // Stop Spark BEFORE the final prints: the driver parses the LAST stdout
    // line as JSON, and shutdown must not be able to interleave output
    // after it (build.sbt already strips sbt's own [info]/[success] noise).
    spark.stop()
    println(line)
    println(summary)
  }
}
