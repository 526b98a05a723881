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
  * All access goes through the map's monitor; `build` runs under it —
  * the same serialization `computeIfAbsent` provided (a memoized build
  * is expensive and must run once; concurrent callers of the SAME key
  * must wait for it anyway).
  *
  * `max` defaults to the `graft.memo.max` system property (default 4 —
  * generous for per-dataset keys while bounding the worst case). */
final class Memo[V](release: V => Unit,
    max: Int = Memo.defaultMax) {
  require(max >= 1, s"memo bound must be >= 1, got $max")
  private val m = new java.util.LinkedHashMap[String, V](16, 0.75f, true) {
    override def removeEldestEntry(e: java.util.Map.Entry[String, V]): Boolean = {
      val evict = size() > max
      if (evict) release(e.getValue)
      evict
    }
  }

  def apply(key: String)(build: => V): V = m.synchronized {
    val hit = m.get(key)
    if (hit != null) hit
    else { val v = build; m.put(key, v); v }
  }

  /** Release one entry (or everything): removes the reference and runs
    * the release hook so cluster-side blocks free immediately. */
  def drop(key: String): Unit = m.synchronized {
    Option(m.remove(key)).foreach(release)
  }
  def clear(): Unit = m.synchronized {
    m.values.forEach(v => release(v))
    m.clear()
  }
}

object Memo {
  private[ext] def defaultMax: Int =
    sys.props.get("graft.memo.max").map(_.toInt).getOrElse(4)

  /** A memo for values with no cluster-side state to release (driver
    * models, lazily-read stored bundles). Bounding still matters — it
    * caps plan/JVM state — but eviction is reference-drop only. */
  def unmanaged[V]: Memo[V] = new Memo[V](_ => ())
}
