package graft.ops

import org.scalatest.funsuite.AnyFunSuite

/** The trained-index caches (quantizers, served roots, PQ codes) must
  * hold BOUNDED driver memory: entries of a stopped session sweep on
  * the next access, and the population LRU-evicts past capacity —
  * the r13 instantCache class of finding applied to the vector packs'
  * per-(session, corpus) caches. */
class SessionScopedCacheSpec extends AnyFunSuite {

  test("a dead session's entries evict on the next access") {
    val c = new SessionScopedCache[String, String](8)
    var dead = false
    c.getOrCompute("stopped-session@corpus1", () => !dead)("v1")
    c.getOrCompute("stopped-session@corpus2", () => !dead)("v2")
    c.getOrCompute("live-session@corpus1", () => true)("v3")
    assert(c.size === 3)
    // the session stops; nothing happens until someone touches the
    // cache (no background thread) — then EVERY dead entry sweeps
    dead = true
    c.getOrCompute("live-session@corpus2", () => true)("v4")
    assert(c.size === 2, "stopped session's entries survived the sweep")
    assert(!c.contains("stopped-session@corpus1"))
    assert(!c.contains("stopped-session@corpus2"))
    assert(c.contains("live-session@corpus1"))
  }

  test("population LRU-evicts past capacity; recently-used entries survive") {
    val c = new SessionScopedCache[Int, Int](4)
    (1 to 4).foreach(i => c.getOrCompute(i, () => true)(i))
    // touch 1 so it is most-recently-used, then overflow
    assert(c.getOrCompute(1, () => true)(fail("hit recomputed")) === 1)
    (5 to 7).foreach(i => c.getOrCompute(i, () => true)(i))
    assert(c.size === 4)
    assert(c.contains(1), "recently-touched entry evicted before older ones")
    assert(!c.contains(2) && !c.contains(3) && !c.contains(4))
  }

  test("a hit never recomputes; a swept key recomputes fresh") {
    val c = new SessionScopedCache[String, Int](8)
    var builds = 0
    var alive = true
    def get(): Int = c.getOrCompute("k", () => alive) { builds += 1; builds }
    assert(get() === 1 && get() === 1 && builds === 1)
    // session dies and restarts (same key shape): the rebuilt entry is
    // the NEW session's, not the dead one's cached value
    alive = false
    val swept = c.getOrCompute("other", () => true)(0)
    assert(swept === 0 && !c.contains("k"))
    alive = true
    assert(get() === 2 && builds === 2)
  }
}
