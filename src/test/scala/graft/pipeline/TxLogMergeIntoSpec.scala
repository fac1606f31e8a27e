package graft.pipeline

import graft.SparkTestBase
import graft.pipeline.{MergeInto => M}
import org.apache.spark.sql.functions._

/** Full conditional MERGE ([[TxLog.mergeInto]]) — the Delta clause
  * surface: per-clause conditions, DELETE actions, NOT MATCHED BY
  * SOURCE, first-clause-wins ordering, the cardinality violation, and
  * the 100 TB commit shape (only dirs holding modified rows rewrite;
  * everything else carries). */
class TxLogMergeIntoSpec extends SparkTestBase {
  import spark.implicits._

  private def freshTable(name: String): TxLog = {
    val t = TxLog(spark, tmpDir(name))
    t.overwrite(Seq(
      (1L, "a", 10L), (2L, "b", 20L), (3L, "c", 30L), (4L, "d", 40L))
      .toDF("k", "v", "amt"))
    t
  }

  test("conditional update / delete / insert fire per clause, in order") {
    val t = freshTable("mi_basic")
    val src = Seq(
      (1L, "upd", 100L),  // matched, amt>=100 → update
      (2L, "del", 5L),    // matched, amt<100  → delete
      (9L, "new", 99L))   // not matched       → insert
      .toDF("k", "v", "amt")
    val v = t.mergeInto(src, "t.k = s.k",
      matched = Seq(
        M.When(Some("s.amt >= 100"), M.Update(Seq("v" -> "s.v", "amt" -> "s.amt"))),
        M.When(None, M.Delete)),
      notMatched = Seq(M.When(None, M.InsertAll)))
    assert(v === 1L)
    val out = t.snapshot().orderBy("k")
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2))).toSeq
    assert(out === Seq(
      (1L, "upd", 100L), (3L, "c", 30L), (4L, "d", 40L), (9L, "new", 99L)))
    // time travel still sees the pre-merge table
    assert(t.snapshot(0L).count() === 4L)
  }

  test("first passing clause wins; assignments see both aliases and cast") {
    val t = freshTable("mi_order")
    val src = Seq((1L, "x", 7L)).toDF("k", "v", "amt")
    // both clauses match row 1 — the FIRST fires (update, not delete)
    t.mergeInto(src, "t.k = s.k",
      matched = Seq(
        M.When(Some("s.amt < 50"), M.Update(Seq("amt" -> "t.amt + s.amt"))),
        M.When(None, M.Delete)))
    val r1 = t.snapshot().filter(col("k") === 1L).head()
    assert(r1.getLong(2) === 17L) // 10 + 7, RHS mixed both aliases
    assert(r1.getString(1) === "a") // unassigned column carries
  }

  test("NOT MATCHED BY SOURCE: delete and conditional update (full sync)") {
    val t = freshTable("mi_nmbs")
    val src = Seq((1L, "keep", 10L), (2L, "keep", 20L)).toDF("k", "v", "amt")
    // rows 3,4 are target-only; delete those under 40, flag the rest
    t.mergeInto(src, "t.k = s.k",
      matched = Seq(M.When(None, M.Update(Seq("v" -> "s.v")))),
      notMatchedBySource = Seq(
        M.When(Some("t.amt < 40"), M.Delete),
        M.When(None, M.Update(Seq("v" -> "'orphan'")))))
    val out = t.snapshot().orderBy("k")
      .collect().map(r => (r.getLong(0), r.getString(1))).toSeq
    assert(out === Seq((1L, "keep"), (2L, "keep"), (4L, "orphan")))
  }

  test("cardinality violation: two source rows modifying one target row fail") {
    val t = freshTable("mi_card")
    val dup = Seq((1L, "x", 1L), (1L, "y", 2L)).toDF("k", "v", "amt")
    val e = intercept[IllegalStateException](
      t.mergeInto(dup, "t.k = s.k",
        matched = Seq(M.When(None, M.Update(Seq("v" -> "s.v"))))))
    assert(e.getMessage.contains("cardinality violation"))
    // ...but duplicate matches where only ONE fires are legal
    t.mergeInto(dup, "t.k = s.k",
      matched = Seq(M.When(Some("s.v = 'y'"), M.Update(Seq("v" -> "s.v")))))
    assert(t.snapshot().filter(col("k") === 1L).head().getString(1) === "y")
  }

  test("only dirs holding modified rows rewrite; the rest carry with stats") {
    val root = tmpDir("mi_prune")
    val t = TxLog(spark, root, statsCols = Seq("k"))
    t.overwrite(Seq((1L, "a"), (2L, "b")).toDF("k", "v"))
    t.append(Seq((10L, "x"), (11L, "y")).toDF("k", "v"))
    val dirsBefore = t.snapshotDataDirs().toSet
    assert(dirsBefore.size === 2)
    // touch only the appended dir's rows
    t.mergeInto(Seq((10L, "X")).toDF("k", "v"), "t.k = s.k",
      matched = Seq(M.When(None, M.Update(Seq("v" -> "s.v")))))
    val dirsAfter = t.snapshotDataDirs().toSet
    // the untouched dir carried; the touched dir was replaced
    val carried = dirsBefore.intersect(dirsAfter)
    assert(carried.size === 1)
    assert(t.snapshot().orderBy("k").collect().map(_.getString(1)).toSeq ===
      Seq("a", "b", "X", "y"))
    // carried stats still prune: a k=1 point read skips the new dir
    assert(t.snapshot().filter(col("k") === 1L).count() === 1L)
  }

  test("insert with explicit columns nulls the rest; no-op merge keeps version") {
    val t = freshTable("mi_insert")
    val v0 = t.currentVersion()
    // nothing matches, nothing fires → no-op, same version
    val vSame = t.mergeInto(Seq((1L, "a", 10L)).toDF("k", "v", "amt"),
      "t.k = s.k",
      matched = Seq(M.When(Some("s.amt > 1000"), M.Delete)))
    assert(vSame === v0)
    // explicit column-list insert: unlisted column becomes NULL
    t.mergeInto(Seq((7L, "seven", 0L)).toDF("k", "v", "amt"), "t.k = s.k",
      notMatched = Seq(
        M.When(None, M.Insert(Seq("k" -> "s.k", "v" -> "upper(s.v)")))))
    val r = t.snapshot().filter(col("k") === 7L).head()
    assert(r.getString(1) === "SEVEN")
    assert(r.isNullAt(2))
  }

  test("validation: clause shapes, unknown columns, star coverage") {
    val t = freshTable("mi_validate")
    val src = Seq((1L, "x", 1L)).toDF("k", "v", "amt")
    // non-final clause must carry a condition
    assertThrows[IllegalArgumentException](
      t.mergeInto(src, "t.k = s.k", matched = Seq(
        M.When(None, M.Delete), M.When(None, M.Delete))))
    // unknown assignment target
    assertThrows[IllegalArgumentException](
      t.mergeInto(src, "t.k = s.k", matched = Seq(
        M.When(None, M.Update(Seq("nope" -> "1"))))))
    // INSERT * with a source missing target columns
    assertThrows[IllegalArgumentException](
      t.mergeInto(Seq(1L).toDF("k"), "t.k = s.k",
        notMatched = Seq(M.When(None, M.InsertAll))))
    // DELETE is not a NOT MATCHED action
    assertThrows[IllegalArgumentException](
      t.mergeInto(src, "t.k = s.k", notMatched = Seq(M.When(None, M.Delete))))
  }

  test("merge over a tombstoned dir sees only visible rows") {
    val t = freshTable("mi_tombs")
    t.deleteWhere("k = 2") // MoR tombstone, no rewrite
    // NMBS delete of everything unmatched: row 2 is already invisible
    // and must not resurrect
    t.mergeInto(Seq((1L, "a", 10L)).toDF("k", "v", "amt"), "t.k = s.k",
      matched = Seq(M.When(None, M.Update(Seq("v" -> "'hit'")))),
      notMatchedBySource = Seq(M.When(None, M.Delete)))
    val out = t.snapshot().collect().map(r => (r.getLong(0), r.getString(1))).toSeq
    assert(out === Seq((1L, "hit")))
  }
}
