package graft.ext

/** Bounded access-order (LRU) memo for serving-state registries — the
  * build-once/serve-many lifecycle's cache, with the leak closed.
  *
  * Every index/model family memoizes its built state per (session,
  * dataset) so bench rep 1 pays the build and reps 2+ price steady-state
  * serving. Through round 10 those registries were unbounded
  * ConcurrentHashMaps pinning persisted corpus-sized DataFrames for the
  * PROCESS lifetime — the mechanism BASELINE's q182 contention note and
  * VERDICT r10's suite-drift finding both point at: a long bench session
  * accumulates every family's cluster-side state simultaneously, and
  * memory pressure bleeds into unrelated entries' times. A bounded LRU
  * caps each family at `max` live states (keys are per-dataset — a
  * session touches a handful), and eviction RELEASES the state
  * (unpersist / drop) so the block manager actually gets the memory
  * back instead of waiting on GC.
  *
  * Concurrency (the round-11 advisor finding): a build can take minutes
  * and spawn Spark jobs, so it must NOT run under the map-wide monitor —
  * a concurrent caller for a DIFFERENT key (a streaming micro-batch
  * thread sharing a family with a bench thread) would block for the
  * whole build, and cross-family nested builds would create a
  * lock-ordering deadlock surface. Builds are serialized PER KEY via a
  * latch slot installed under the monitor; the monitor itself is only
  * ever held for map bookkeeping. A failed build removes its slot and
  * rethrows; waiters on the failed slot retry (installing their own
  * build) rather than caching the failure.
  *
  * Eviction is LOGGED (key + family), and a rebuild of a just-evicted
  * key WARNS — with `max` small, a session touching more keys than the
  * bound round-robin would otherwise thrash silently, every access
  * re-paying a full index/model build (the invisible-cliff half of the
  * same advisor finding). An in-flight build is never evicted
  * (releasing half-built state would hand eviction a value the builder
  * is about to return) — but it does not SHIELD its neighbors: the
  * bound sweep skips building slots and evicts the oldest COMPLETED
  * entry instead (the round-12 advisor finding: bailing at a building
  * eldest deferred eviction for every younger completed entry too),
  * and a build's completion path re-runs the sweep, so residency
  * returns to the bound as soon as a victim exists even on a get-only
  * workload. Only when EVERY resident slot is mid-build is the bound
  * temporarily exceeded.
  *
  * Release-hook contract: a borrower can hold a value across the
  * monitor (apply returns it unlocked), so a concurrent insert may
  * evict and RELEASE that value while it is still in use. Hooks must
  * therefore tolerate release-during-use — true for every registered
  * family (DataFrame `unpersist`: the borrowed plan stays valid and
  * merely recomputes) — and a hook with stronger semantics (closing a
  * file handle, freeing native memory) must NOT ride this class
  * without adding pin/refcount support first.
  *
  * `max` defaults to the `graft.memo.max` system property (default 4 —
  * generous for per-dataset keys while bounding the worst case). */
final class Memo[V](release: V => Unit,
    max: Int = Memo.defaultMax, name: String = "memo") {
  require(max >= 1, s"memo bound must be >= 1, got $max")
  Memo.register(this)

  /** One key's lifecycle: installed under the monitor, completed (or
    * failed) outside it, latch released exactly once. */
  private final class Slot {
    @volatile var value: Option[V] = None
    val done = new java.util.concurrent.CountDownLatch(1)
  }

  // access-order LinkedHashMap = the LRU; values are slots so the map
  // can hold in-flight builds without blocking unrelated keys. Eviction
  // is NOT removeEldestEntry: that hook can only drop the single eldest
  // entry, so an eldest slot mid-build would shield every younger
  // completed entry too — enforceBound sweeps instead.
  private val m = new java.util.LinkedHashMap[String, Slot](16, 0.75f, true)

  /** Evict oldest COMPLETED entries (access order) until the bound
    * holds; building slots are skipped, never released. Call under
    * `m.synchronized`. */
  private def enforceBound(spare: Slot = null): Unit = {
    var victim = findVictim(spare)
    while (m.size() > max && victim != null) {
      System.err.println(s"[memo:$name] evicting '${victim._1}' (bound $max)")
      evicted.add(victim._1)
      m.remove(victim._1)
      release(victim._2)
      victim = findVictim(spare)
    }
    if (m.size() > max)
      System.err.println(s"[memo:$name] bound $max exceeded but every " +
        "evictable slot is still building — deferring eviction")
  }

  /** Oldest completed (key, value) in access order, or null. `spare`
    * (the completion path's own slot) is never chosen — a builder must
    * not evict the value it is about to hand its caller. */
  private def findVictim(spare: Slot): (String, V) = {
    val it = m.entrySet().iterator()
    while (it.hasNext) {
      val e = it.next()
      if (e.getValue ne spare) e.getValue.value match {
        case Some(v) => return (e.getKey, v)
        case None    => ()
      }
    }
    null
  }
  // small ring of recently-evicted keys: a rebuild of one of these is
  // the thrash signature worth warning about
  private val evicted = java.util.Collections.newSetFromMap(
    new java.util.LinkedHashMap[String, java.lang.Boolean](16, 0.75f, false) {
      override def removeEldestEntry(
          e: java.util.Map.Entry[String, java.lang.Boolean]): Boolean =
        size() > 16
    })

  @annotation.tailrec
  def apply(key: String)(build: => V): V = {
    var mine = false
    val slot = m.synchronized {
      val hit = m.get(key)
      if (hit != null) hit
      else {
        if (evicted.remove(key))
          System.err.println(s"[memo:$name] REBUILDING just-evicted '$key' " +
            s"— family bound $max may be too small for this session")
        val s = new Slot
        m.put(key, s)
        enforceBound()
        mine = true
        s
      }
    }
    if (mine) {
      // the build runs OUTSIDE the monitor: only same-key callers wait
      try {
        val v = build
        slot.value = Some(v)
        slot.done.countDown()
        // completion re-check (round-12 advisor): if eviction was
        // deferred while this build was the only victim-free resident,
        // the bound is re-enforced NOW instead of at the next insert.
        // Bump this key first so the sweep prefers an older entry over
        // the value this builder is about to hand its caller.
        m.synchronized {
          if (m.get(key) eq slot) enforceBound(spare = slot)
        }
        v
      } catch {
        case e: Throwable =>
          m.synchronized { if (m.get(key) eq slot) m.remove(key) }
          slot.done.countDown() // waiters observe the empty slot and retry
          throw e
      }
    } else {
      slot.done.await()
      slot.value match {
        case Some(v) => v
        case None    => apply(key)(build) // other thread's build failed
      }
    }
  }

  /** Release one entry (or everything): removes the reference and runs
    * the release hook so cluster-side blocks free immediately. A slot
    * still building is dropped from the map but not released — its
    * builder owns the value it is about to return. */
  def drop(key: String): Unit = m.synchronized {
    Option(m.remove(key)).flatMap(_.value).foreach(release)
  }
  def clear(): Unit = m.synchronized {
    m.values.forEach(s => s.value.foreach(release))
    m.clear()
  }
}

object Memo {
  // every family memo self-registers so a harness can release ALL
  // serving state at a protocol boundary (graft.Bench runs memo-backed
  // entries first, then clears before timing the stateless rest — the
  // cross-family-residency skew fix, BASELINE §Round 12)
  private val registry = new java.util.concurrent.CopyOnWriteArrayList[Memo[_]]()
  private def register(m: Memo[_]): Unit = { registry.add(m); () }

  /** Release every registered family's entire serving state (and any
    * tracked transient probe-side blocks — [[trackTransient]]). */
  def clearAllRegistered(): Unit = {
    registry.forEach(_.clear())
    releaseTransient()
  }

  // ---- transient probe-side blocks ----------------------------------
  // Persisted DataFrames with no owning memo entry — e.g. the pruned
  // probe's sketch (MinHashIndex.candidatesPruned persists the probe
  // bands so the key collect and the join share one materialization,
  // but the RETURNED plan still references the blocks, so the producer
  // cannot unpersist before its caller executes). Tracking them here
  // lets a harness boundary (graft.Bench's per-group release, the probe
  // tools) free them deterministically instead of waiting on the
  // ContextCleaner. Bounded: past 64 entries the oldest is unpersisted
  // on insert — by then its consumer has long executed, and even a
  // still-borrowed plan merely recomputes (the unpersist contract).
  private val transient0 =
    new java.util.concurrent.ConcurrentLinkedQueue[org.apache.spark.sql.DataFrame]()

  /** Register a persisted probe-side DataFrame for deferred release. */
  def trackTransient[D <: org.apache.spark.sql.DataFrame](df: D): D = {
    transient0.add(df)
    while (transient0.size > 64) Option(transient0.poll())
      .foreach(d => try { d.unpersist(false); () } catch { case _: Exception => () })
    df
  }

  /** Unpersist every tracked transient block (blocking = false). */
  def releaseTransient(): Unit = {
    var d = transient0.poll()
    while (d != null) {
      try { d.unpersist(false); () } catch { case _: Exception => () }
      d = transient0.poll()
    }
  }

  private[ext] def defaultMax: Int = intProp("graft.memo.max", 4)

  /** Shared system-property integer knob reader. */
  private[ext] def intProp(name: String, default: Int): Int =
    sys.props.get(name).map(_.toInt).getOrElse(default)

  /** A memo for values with no cluster-side state to release (driver
    * models, lazily-read stored bundles). Bounding still matters — it
    * caps plan/JVM state — but eviction is reference-drop only. */
  def unmanaged[V]: Memo[V] = new Memo[V](_ => ())
}
