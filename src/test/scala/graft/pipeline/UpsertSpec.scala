package graft.pipeline

import graft.SparkTestBase
import org.apache.spark.sql.functions._

/** O1/O2 merge semantics — Delta `whenMatchedUpdateAll /
  * whenNotMatchedInsertAll` parity (SURVEY §2.3). */
class UpsertSpec extends SparkTestBase {
  import spark.implicits._

  private def target = Seq((1L, "a", 10), (2L, "b", 20), (3L, "c", 30))
    .toDF("k", "name", "v")

  test("matched rows update, unmatched target rows persist, new rows insert") {
    val src = Seq((2L, "b2", 21), (9L, "i", 90)).toDF("k", "name", "v")
    val out = Upsert.merge(target, src, Seq("k")).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getInt(2))).sortBy(_._1)
    assert(out === Array((1L, "a", 10), (2L, "b2", 21), (3L, "c", 30), (9L, "i", 90)))
  }

  test("target multiplicity preserved: two matched target rows both update") {
    val dupTarget = target.union(Seq((2L, "b_dup", 22)).toDF("k", "name", "v"))
    val src = Seq((2L, "upd", 99)).toDF("k", "name", "v")
    val out = Upsert.merge(dupTarget, src, Seq("k"))
    assert(out.count() === 4)
    assert(out.filter($"k" === 2L).collect().forall(r => r.getString(1) == "upd"))
  }

  test("strict mode rejects duplicate source keys (Delta parity)") {
    val src = Seq((2L, "x", 1), (2L, "y", 2)).toDF("k", "name", "v")
    val e = intercept[IllegalArgumentException] {
      Upsert.merge(target, src, Seq("k"))
    }
    assert(e.getMessage.contains("multiple rows"))
  }

  test("column-set mismatch is rejected") {
    val src = Seq((2L, "x")).toDF("k", "name")
    intercept[IllegalArgumentException] { Upsert.merge(target, src, Seq("k")) }
  }

  test("merge is idempotent: merging an already-applied batch changes nothing") {
    val src = Seq((2L, "b2", 21)).toDF("k", "name", "v")
    val once = Upsert.merge(target, src, Seq("k"))
    val twice = Upsert.merge(once, src, Seq("k"))
    assert(once.exceptAll(twice).count() === 0 && twice.exceptAll(once).count() === 0)
  }

  test("null source key never matches — inserts (reference `=` semantics)") {
    val src = Seq((Option.empty[Long], "n", 0)).toDF("k", "name", "v")
    val out = Upsert.merge(target, src, Seq("k"))
    assert(out.count() === 4)
    assert(out.filter($"k".isNull).count() === 1)
  }

  test("composite keys merge on the full conjunction") {
    val t2 = Seq((1L, 1L, "a"), (1L, 2L, "b")).toDF("k1", "k2", "v")
    val src = Seq((1L, 2L, "B"), (2L, 1L, "C")).toDF("k1", "k2", "v")
    val out = Upsert.merge(t2, src, Seq("k1", "k2")).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getString(2))).sortBy(x => (x._1, x._2))
    assert(out === Array((1L, 1L, "a"), (1L, 2L, "B"), (2L, 1L, "C")))
  }

  test("overwriteAtomic swaps safely while the plan reads the target path") {
    val path = tmpDir("upsert_atomic") + "/t"
    target.write.parquet(path)
    val live = spark.read.parquet(path)
    val merged = Upsert.merge(live, Seq((1L, "a2", 11)).toDF("k", "name", "v"), Seq("k"))
    Upsert.overwriteAtomic(spark, merged, path)
    val after = spark.read.parquet(path)
    assert(after.count() === 3)
    assert(after.filter($"k" === 1L).head().getString(1) === "a2")
  }
}
