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
    override def removeEldestEntry(e: java.util.Map.Entry[K, Entry]): Boolean = {
      val evict = size() > capacity
      if (evict) SessionScopedCache.release(e.getValue.v)
      evict
    }
  }

  /** Sweep dead-session entries, then serve `k`, computing and
    * retaining the value (tagged with `alive`) on a miss. */
  def getOrCompute(k: K, alive: () => Boolean)(compute: => V): V = m.synchronized {
    val it = m.values.iterator()
    while (it.hasNext) {
      val e = it.next()
      if (!e.alive()) { SessionScopedCache.release(e.v); it.remove() }
    }
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

  /** Best-effort release of an evicted value's materialized blocks
    * (r18 ADVICE item 4): the cached values here are mostly
    * `localCheckpoint(true)`ed DataFrames whose RDD blocks otherwise
    * sit in the block manager until GC + ContextCleaner get around to
    * them — in a long-lived driver an evicted label/code frame could
    * pin storage for a while. Eviction means the value is no longer
    * addressable through the cache, and every consumer in this engine
    * uses a cached frame synchronously inside the query build that
    * fetched it, so unpersisting the LogicalRDD roots is safe. Guarded:
    * never touches a stopped context, swallows everything (release is
    * an optimization, not a contract). */
  private[ops] def release(v: Any): Unit = v match {
    case df: org.apache.spark.sql.Dataset[_] => releaseDf(df)
    case p: Product => p.productIterator.foreach {
      case df: org.apache.spark.sql.Dataset[_] => releaseDf(df)
      case _ => ()
    }
    case _ => ()
  }

  private def releaseDf(df: org.apache.spark.sql.Dataset[_]): Unit =
    try {
      if (!df.sparkSession.sparkContext.isStopped)
        df.queryExecution.analyzed.foreach {
          case l: org.apache.spark.sql.execution.LogicalRDD =>
            l.rdd.unpersist(blocking = false)
          case _ => ()
        }
    } catch { case _: Throwable => () }
}
