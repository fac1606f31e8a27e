package graft.pipeline

import graft.SparkTestBase
import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._

/** Change Data Feed + incremental MV maintenance contracts:
  * classification correctness, verbatim-copy exclusion, per-commit
  * attribution, dir-granular pruning on partitioned merges, the
  * vacuum guard, and signed-fold view maintenance (including group
  * moves and group drains). */
class TxLogCdfSpec extends SparkTestBase {
  import spark.implicits._

  private def table(name: String): TxLog = TxLog(spark, tmpDir(name))

  test("changes classifies insert / update pre+post / delete; copies drop out") {
    val t = table("cdf_classify")
    t.overwrite(Seq((1, "a", 10), (2, "b", 20), (3, "c", 30))
      .toDF("k", "s", "v"))                                  // v0
    // merge: k=2 updated, k=4 inserted, k=1/3 carried VERBATIM by the
    // rewrite — they must not appear in the feed
    t.merge(Seq((2, "b2", 21), (4, "d", 40), (1, "a", 10))
      .toDF("k", "s", "v"), Seq("k"))                        // v1
    t.deleteWhere("k = 3")                                   // v2
    // from=0 is INCLUSIVE (Delta's starting_version): the v0 seed
    // serves as inserts at commit 0
    val feed = t.changes(0, 2, Seq("k"))
      .select("k", "s", "v", "_change_type", "_commit_version")
      .collect().map(r => (r.getInt(0), r.getString(1), r.getInt(2),
        r.getString(3), r.getLong(4))).toSet
    assert(feed === Set(
      (1, "a", 10, "insert", 0L),
      (2, "b", 20, "insert", 0L),
      (3, "c", 30, "insert", 0L),
      (2, "b", 20, "update_preimage", 1L),
      (2, "b2", 21, "update_postimage", 1L),
      (4, "d", 40, "insert", 1L),
      (3, "c", 30, "delete", 2L)))
    // from=1 starts after the seed — the pre-r9 window
    assert(t.changes(1, 2, Seq("k")).count() === 4L)
  }

  test("a merge-src row equal to the target row produces no change rows") {
    val t = table("cdf_noop")
    t.overwrite(Seq((1, 10), (2, 20)).toDF("k", "v"))
    t.merge(Seq((1, 10)).toDF("k", "v"), Seq("k")) // values identical
    assert(t.changes(1, 1, Seq("k")).count() === 0L)
  }

  test("from == 0 serves the seed as inserts; from == to+1 is the empty caught-up window") {
    val t = table("cdf_empty")
    t.overwrite(Seq((1, 10)).toDF("k", "v"))
    // inclusive starting version: commit 0's changes are its snapshot
    // diffed against the empty pre-state
    val seed = t.changes(0, 0, Seq("k"))
      .select("k", "v", "_change_type", "_commit_version").collect()
      .map(r => (r.getInt(0), r.getInt(1), r.getString(2), r.getLong(3)))
    assert(seed.toSeq === Seq((1, 10, "insert", 0L)))
    // a caught-up consumer's window (from = to+1) is legal and empty
    val f = t.changes(1, 0, Seq("k"))
    assert(f.count() === 0L)
    assert(f.columns.toSet === Set("k", "v", "_change_type", "_commit_version"))
  }

  test("partitioned merge: the feed's read set is ONLY the touched partitions") {
    val t = table("cdf_pruned")
    val base = (1 to 40).map(i => (i, s"p${i % 4}", i * 10))
      .toDF("k", "p", "v")
    t.overwritePartitioned(base, "p")                        // v0: 4 partitions
    t.mergePartitioned(Seq((5, "p1", 999)).toDF("k", "p", "v"),
      Seq("k"), "p")                                         // v1: touches p1 only
    val (ch0, ch1) = t.changedEntriesBetween(0, 1)
    // v0 is one dir tagged per partition; only the p1 ENTRY may differ
    // on each side — p0/p2/p3 rows are never read
    assert(ch0.map(_._2) === Seq(Some("p1")) &&
      ch1.map(_._2) === Seq(Some("p1")),
      s"expected exactly the p1 entry on each side, got $ch0 / $ch1")
    val feed = t.changes(1, 1, Seq("k"))
      .select("k", "v", "_change_type").collect()
      .map(r => (r.getInt(0), r.getInt(1), r.getString(2))).toSet
    assert(feed === Set((5, 50, "update_preimage"), (5, 999, "update_postimage")))
  }

  test("schema evolution: only columns present in both versions drive updates") {
    val t = table("cdf_evolve")
    t.overwrite(Seq((1, 10), (2, 20)).toDF("k", "v"))
    t.merge(Seq((1, 11, "x")).toDF("k", "v", "w"), Seq("k"),
      evolve = true)
    val feed = t.changes(1, 1, Seq("k"))
    val post = feed.filter($"_change_type" === "update_postimage")
      .select("k", "v", "w").collect()
    assert(post.toSeq === Seq(Row(1, 11, "x")))
    val pre = feed.filter($"_change_type" === "update_preimage")
      .select("k", "v", "w").collect()
    assert(pre.toSeq === Seq(Row(1, 10, null))) // old version null-fills w
    // k=2 carried verbatim (v unchanged; w is not common) → absent
    assert(feed.filter($"k" === 2).count() === 0L)
  }

  test("changes refuses a vacuumed range with a clear error") {
    val t = table("cdf_vacuum")
    t.overwrite(Seq((1, 10)).toDF("k", "v"))                 // v0
    t.overwrite(Seq((1, 11)).toDF("k", "v"))                 // v1
    t.overwrite(Seq((1, 12)).toDF("k", "v"))                 // v2
    t.vacuum(keepVersions = 1)                               // v0/v1 dirs gone
    val e = intercept[IllegalArgumentException](
      t.changes(0, 2, Seq("k")).count())
    assert(e.getMessage.contains("vacuumed"))
  }

  test("materializeChanges writes a streamable per-commit parquet feed") {
    val t = table("cdf_mat")
    val dest = tmpDir("cdf_mat_out")
    t.overwrite(Seq((1, 10), (2, 20)).toDF("k", "v"))
    t.merge(Seq((2, 21), (3, 30)).toDF("k", "v"), Seq("k"))
    t.deleteWhere("k = 1")
    t.materializeChanges(0, 2, Seq("k"), dest)
    val back = spark.read.parquet(dest)
    val n = back.count()
    assert(n === t.changes(0, 2, Seq("k")).count())
    // inclusive window: the seed materializes as its own
    // _commit_version=0 partition
    assert(back.select("_commit_version").distinct().as[Long]
      .collect().toSet === Set(0L, 1L, 2L))
    // idempotent re-materialization of the same range
    t.materializeChanges(0, 2, Seq("k"), dest)
    assert(spark.read.parquet(dest).count() === n)
  }

  test("applyDelta maintains sums/counts through group moves and drains") {
    val mv0 = Seq(("a", BigDecimal("30.00"), 2L), ("b", BigDecimal("5.00"), 1L))
      .toDF("g", "x", "cnt")
      .select($"g", $"x".cast("decimal(18,2)").as("x"), $"cnt")
    val changes = Seq(
      ("a", "10.00", "update_preimage"),  // row moves a → b
      ("b", "10.00", "update_postimage"),
      ("c", "7.00", "insert"),            // new group appears
      ("b", "5.00", "delete")             // b's original row leaves
    ).toDF("g", "x", "_change_type")
      .select($"g", $"x".cast("decimal(18,2)").as("x"), $"_change_type")
    val mv1 = IncrementalMV.applyDelta(mv0, changes, Seq("g"), Seq("x"))
      .collect().map(r => (r.getString(0), r.getDecimal(1).toPlainString,
        r.getLong(2))).toSet
    assert(mv1 === Set(("a", "20.00", 1L), ("b", "10.00", 1L),
      ("c", "7.00", 1L)))
  }

  test("applyDelta drops a group whose count reaches zero") {
    val mv0 = Seq(("a", 10L, 1L)).toDF("g", "x", "cnt")
    val changes = Seq(("a", 10L, "delete")).toDF("g", "x", "_change_type")
    assert(IncrementalMV.applyDelta(mv0, changes, Seq("g"), Seq("x"))
      .count() === 0L)
  }

  test("incremental maintenance over a real TxLog feed equals recompute") {
    val t = table("cdf_mv")
    val base = (1 to 60).map(i => (i, s"g${i % 3}", BigDecimal(i).setScale(2)))
      .toDF("k", "g", "x")
      .select($"k", $"g", $"x".cast("decimal(18,2)").as("x"))
    t.overwrite(base)                                        // v0
    t.merge((1 to 60).filter(_ % 5 == 0)
      .map(i => (i, s"g${(i + 1) % 3}", BigDecimal(i * 2).setScale(2)))
      .toDF("k", "g", "x")
      .select($"k", $"g", $"x".cast("decimal(18,2)").as("x")),
      Seq("k"))                                              // v1: moves groups
    t.deleteWhere("x > 100")                                 // v2
    val mv0 = IncrementalMV.recompute(t.snapshot(0), Seq("g"), Seq("x"))
    val inc = IncrementalMV.applyDelta(
      mv0, t.changes(1, 2, Seq("k")), Seq("g"), Seq("x"))
    val full = IncrementalMV.recompute(t.snapshot(), Seq("g"), Seq("x"))
    assert(inc.exceptAll(full).isEmpty && full.exceptAll(inc).isEmpty)
  }
}
