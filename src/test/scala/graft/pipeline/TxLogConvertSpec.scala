package graft.pipeline

import graft.SparkTestBase
import graft.sql.TxLogSql
import org.apache.spark.sql.functions._

/** CONVERT TO GRAFT — in-place zero-rewrite import of an existing
  * parquet directory (Delta's CONVERT TO DELTA). The contract under
  * test: no data bytes move, reads see exactly the source rows (with
  * the hive partition column materialized at its discovered type),
  * partition pruning is structural, and every transactional operation
  * (append, delete, merge, optimize, clone, vacuum) works on the
  * converted table from version 0. */
class TxLogConvertSpec extends SparkTestBase {
  import spark.implicits._

  test("flat convert: zero-rewrite import, then normal transactional life") {
    val src = tmpDir("convert_flat")
    Seq((1L, "a"), (2L, "b"), (3L, "c")).toDF("id", "v")
      .write.mode("overwrite").parquet(src)
    val before = new java.io.File(src).listFiles()
      .filter(_.getName.endsWith(".parquet")).map(f => (f.getName, f.lastModified()))
    val t = TxLog(spark, src, statsCols = Seq("id"))
    assert(t.convertFrom() === 0L)
    // no data files touched
    val after = new java.io.File(src).listFiles()
      .filter(_.getName.endsWith(".parquet")).map(f => (f.getName, f.lastModified()))
    assert(after.toSeq === before.toSeq)
    assert(t.snapshot().orderBy("id").collect().map(r =>
      (r.getLong(0), r.getString(1))).toSeq === Seq((1L, "a"), (2L, "b"), (3L, "c")))
    // transactional ops work from v0: append, time travel
    t.append(Seq((4L, "d")).toDF("id", "v"))
    assert(t.snapshot().count() === 4L)
    assert(t.snapshot(0L).count() === 3L)
    // double convert refused
    val e = intercept[Exception](TxLog(spark, src).convertFrom())
    assert(e.getMessage.contains("already has TxLog commits"))
  }

  test("hive convert: partition column materialized, pruning structural, ops work") {
    val src = tmpDir("convert_hive")
    (0L until 300L).map(i => (i, s"r$i", (1994 + (i % 3)).toInt))
      .toDF("id", "v", "year")
      .write.partitionBy("year").mode("overwrite").parquet(src)
    // the hive layout really strips the column from the files
    assert(!spark.read.parquet(s"$src/year=1994").columns.contains("year"))
    spark.sql(s"CONVERT TO GRAFT parquet.`$src` PARTITIONED BY (year INT)")
    spark.sql(s"CREATE TABLE convert_hive_t USING graft LOCATION '$src'")
    // the snapshot sees the column, typed as discovered
    val df = spark.sql("SELECT * FROM convert_hive_t")
    assert(df.columns.toSeq === Seq("id", "v", "year"))
    assert(df.schema("year").dataType.sql === "INT")
    assert(df.count() === 300L)
    assert(spark.sql(
      "SELECT count(*) FROM convert_hive_t WHERE year = 1995")
      .head().getLong(0) === 100L)
    // pruning is STRUCTURAL: a point read opens exactly one leaf
    val t = TxLog(spark, src)
    assert(t.pointDirs("year", "1995") === Seq(s"$src/year=1995"))
    assert(t.snapshotPoint("year", "1995").count() === 100L)
    // DELETE lays row-level tombstones over the converted dir in place
    spark.sql("DELETE FROM convert_hive_t WHERE year = 1994 AND id < 30")
    assert(spark.sql("SELECT count(*) FROM convert_hive_t").head().getLong(0) === 290L)
    assert(spark.sql(
      "SELECT count(*) FROM convert_hive_t WHERE year = 1994")
      .head().getLong(0) === 90L)
    // an APPEND materializes its own dir; types line up with discovery
    spark.sql("INSERT INTO convert_hive_t VALUES (1000, 'new', 1995)")
    assert(spark.sql(
      "SELECT count(*) FROM convert_hive_t WHERE year = 1995")
      .head().getLong(0) === 101L)
    // OPTIMIZE materializes everything under data/ — the manifest no
    // longer references the source leaves, but the source files remain
    val filesBefore = new java.io.File(s"$src/year=1994").listFiles().length
    spark.sql("OPTIMIZE convert_hive_t")
    assert(spark.sql("SELECT count(*) FROM convert_hive_t").head().getLong(0) === 291L)
    assert(new java.io.File(s"$src/year=1994").listFiles().length === filesBefore)
    // vacuum reclaims superseded data/ dirs but NEVER the source layout
    spark.sql("VACUUM convert_hive_t RETAIN 1 VERSIONS")
    assert(new java.io.File(s"$src/year=1994").listFiles().length === filesBefore)
    assert(spark.sql("SELECT count(*) FROM convert_hive_t").head().getLong(0) === 291L)
    TxLogSql.unregister("convert_hive_t")
  }

  test("hive convert: declared type must match discovery; null partition dir refused") {
    val src = tmpDir("convert_hive_types")
    Seq((1L, 2020), (2L, 2021)).toDF("id", "year")
      .write.partitionBy("year").mode("overwrite").parquet(src)
    val e = intercept[Exception](
      spark.sql(s"CONVERT TO GRAFT parquet.`$src` PARTITIONED BY (year STRING)"))
    assert(e.getMessage.contains("does not match partition discovery"))
    // a dataset with null partition values is refused loudly
    val src2 = tmpDir("convert_hive_nulls")
    Seq((1L, Some(2020)), (2L, None)).toDF("id", "year")
      .write.partitionBy("year").mode("overwrite").parquet(src2)
    val e2 = intercept[Exception](
      spark.sql(s"CONVERT TO GRAFT parquet.`$src2` PARTITIONED BY (year INT)"))
    assert(e2.getMessage.contains("null-partition dir"))
  }

  test("partition-pruned merge over a converted table touches only the hit leaves") {
    val src = tmpDir("convert_merge")
    (0L until 90L).map(i => (i, s"v$i", (i % 3).toInt))
      .toDF("k", "v", "p").write.partitionBy("p").mode("overwrite").parquet(src)
    val t = TxLog(spark, src)
    t.convertFrom(Some(("p", "INT")))
    // merge hits only p=1: existing key updated, new key inserted
    val batch = Seq((1L, "UPD", 1), (1000L, "NEW", 1)).toDF("k", "v", "p")
    t.mergePartitioned(batch, Seq("k"), "p")
    val out = t.snapshot()
    assert(out.count() === 91L)
    assert(out.filter(col("k") === 1L).head().getString(1) === "UPD")
    assert(out.filter(col("k") === 1000L).count() === 1L)
    // untouched partitions still read from the ORIGINAL source leaves
    val m = t.snapshotDataDirs()
    assert(m.count(_.startsWith(s"$src/p=")) === 2) // p=0, p=2 carried
    // the rewritten partition's source leaf is no longer referenced
    assert(!m.contains(s"$src/p=1"))
    // clone of a converted table: zero-copy references into the mix
    val dst = tmpDir("convert_merge_clone")
    t.shallowCloneTo(dst, -1L)
    assert(TxLog(spark, dst).snapshot().count() === 91L)
  }
}
