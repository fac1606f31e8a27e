package graft.pipeline

import graft.SparkTestBase
import graft.sql.TxLogSql
import org.apache.spark.sql.functions._

/** Dynamic partition overwrite ([[TxLog.replacePartitions]] and the
  * `INSERT OVERWRITE … PARTITION` / `INSERT INTO … PARTITION` SQL
  * forms): only the partitions present in the source replace; every
  * other partition's manifest lines carry untouched — the
  * recompute-one-day-of-a-five-year-table shape. */
class TxLogReplacePartitionsSpec extends SparkTestBase {
  import spark.implicits._

  private def partedTable(name: String): TxLog = {
    val t = TxLog(spark, tmpDir(name), statsCols = Seq("k"))
    t.overwritePartitioned(
      Seq((1L, "a", 2020), (2L, "b", 2020), (3L, "c", 2021), (4L, "d", 2022))
        .toDF("k", "v", "year"), "year")
    t
  }

  test("only the partitions present in src replace; the rest carry structurally") {
    val t = partedTable("rp_basic")
    val dirsBefore = t.snapshotDataDirs().toSet
    t.replacePartitions(
      Seq((30L, "C1", 2021), (31L, "C2", 2021)).toDF("k", "v", "year"), "year")
    // 2020/2022 rows untouched, 2021 fully replaced
    assert(t.snapshot().orderBy("k").collect()
      .map(r => (r.getLong(0), r.getInt(2))).toSeq ===
      Seq((1L, 2020), (2L, 2020), (4L, 2022), (30L, 2021), (31L, 2021)))
    // the untouched partitions' DIR carried (manifest-level, no rewrite)
    assert(t.snapshotDataDirs().toSet.intersect(dirsBefore).nonEmpty)
    // a partition new to the table simply appears
    t.replacePartitions(Seq((50L, "e", 2023)).toDF("k", "v", "year"), "year")
    assert(t.snapshot().count() === 6L)
    // point reads still prune to one partition's entries
    assert(t.snapshotPoint("year", "2023").count() === 1L)
    // empty source: no-op, no version churn
    val v = t.currentVersion()
    assert(t.replacePartitions(
      Seq.empty[(Long, String, Int)].toDF("k", "v", "year"), "year") === v)
  }

  test("SQL: INSERT OVERWRITE PARTITION static and dynamic; INTO appends tagged") {
    val t = partedTable("rp_sql")
    TxLogSql.register("rp_sql_tbl", t)
    // static: query supplies all columns except the partition column
    spark.sql(
      "INSERT OVERWRITE rp_sql_tbl PARTITION (year = 2020) VALUES (10, 'X')")
    assert(spark.sql(
      "SELECT k FROM rp_sql_tbl WHERE year = 2020").collect()
      .map(_.getLong(0)).toSeq === Seq(10L))
    assert(spark.sql("SELECT count(*) FROM rp_sql_tbl").head().getLong(0) === 3L)
    // dynamic: query supplies all columns; only present partitions replace
    spark.sql(
      "INSERT OVERWRITE rp_sql_tbl PARTITION (year) VALUES (20, 'Y', 2022)")
    assert(spark.sql("SELECT k, year FROM rp_sql_tbl ORDER BY k").collect()
      .map(r => (r.getLong(0), r.getInt(1))).toSeq ===
      Seq((3L, 2021), (10L, 2020), (20L, 2022)))
    // INTO PARTITION appends and TAGS: the pruned-merge invariant holds
    spark.sql(
      "INSERT INTO rp_sql_tbl PARTITION (year = 2021) VALUES (33, 'Z')")
    assert(spark.sql(
      "SELECT count(*) FROM rp_sql_tbl WHERE year = 2021").head().getLong(0) === 2L)
    // every manifest entry still tagged → a pruned merge stays pruned
    val dirsBefore = t.snapshotDataDirs().toSet
    t.mergePartitioned(Seq((33L, "Z2", 2021)).toDF("k", "v", "year"),
      Seq("k"), "year")
    // 2020/2022 dirs carried through the pruned merge
    assert(t.snapshotDataDirs().toSet.intersect(dirsBefore).nonEmpty)
    assert(spark.sql(
      "SELECT v FROM rp_sql_tbl WHERE k = 33").head().getString(0) === "Z2")
    // ANSI casts: a bad static literal fails, never lands as NULL
    val e = intercept[Exception](spark.sql(
      "INSERT OVERWRITE rp_sql_tbl PARTITION (year = 'notayear') VALUES (1, 'q')"))
    assert(e.getMessage.toLowerCase.contains("cast") ||
      e.getMessage.contains("notayear"))
    TxLogSql.unregister("rp_sql_tbl")
  }

  test("untagged table: replace degrades to a preserving full rewrite") {
    val t = TxLog(spark, tmpDir("rp_untagged"))
    t.overwrite(Seq((1L, 2020), (2L, 2021)).toDF("k", "year"))
    t.replacePartitions(Seq((20L, 2021)).toDF("k", "year"), "year")
    assert(t.snapshot().orderBy("k").collect()
      .map(r => (r.getLong(0), r.getInt(1))).toSeq ===
      Seq((1L, 2020), (20L, 2021)))
  }
}
