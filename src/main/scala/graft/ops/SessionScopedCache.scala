package graft.ops

/** LRU-bounded cache for per-(session, corpus) trained-index artifacts
  * — checkpointed quantizer frames, persisted serving-index roots, PQ
  * code frames. The plain ConcurrentHashMaps these replace grew for
  * the life of the process (same class of finding as the TxLog
  * instantCache fix: a long-lived driver touching many corpora or
  * cycling sessions accumulated dead entries forever).
  *
  * Two eviction rules:
  *
  *   - DEAD-SESSION SWEEP on every access: an entry records an
  *     aliveness probe for the session that built it (its key embeds
  *     the session identity, so a new session can never HIT a dead
  *     entry — the sweep is about releasing the dead session's
  *     DataFrames/roots instead of pinning them until process exit).
  *   - LRU past `capacity`: a miss merely re-trains/re-serves, the
  *     cost any cold session pays.
  *
  * Computation runs under the lock — the same serialization the
  * ConcurrentHashMap `computeIfAbsent` gave (two concurrent trainings
  * of one index would be strictly worse than brief lock convoy on the
  * driver; nothing here sits in an executor hot path). */
private[graft] final class SessionScopedCache[K, V](capacity: Int) {
  private final case class Entry(alive: () => Boolean, v: V)
  private val m = new java.util.LinkedHashMap[K, Entry](16, 0.75f, true) {
    override def removeEldestEntry(e: java.util.Map.Entry[K, Entry]): Boolean =
      size() > capacity
  }

  /** Sweep dead-session entries, then serve `k`, computing and
    * retaining the value (tagged with `alive`) on a miss. */
  def getOrCompute(k: K, alive: () => Boolean)(compute: => V): V = m.synchronized {
    val it = m.values.iterator()
    while (it.hasNext) if (!it.next().alive()) it.remove()
    val e = m.get(k)
    if (e != null) e.v
    else { val v = compute; m.put(k, Entry(alive, v)); v }
  }

  private[graft] def size: Int = m.synchronized(m.size())
  private[graft] def contains(k: K): Boolean = m.synchronized(m.containsKey(k))
}

private[graft] object SessionScopedCache {
  /** The standard aliveness probe: the owning session's context is
    * still running. (Per-session granularity beyond the shared context
    * is carried by the KEY — identityHashCode of the session — so a
    * replaced session's entries stop being addressable immediately and
    * fall to LRU/sweep.) */
  def aliveProbe(spark: org.apache.spark.sql.SparkSession): () => Boolean =
    () => !spark.sparkContext.isStopped
}
