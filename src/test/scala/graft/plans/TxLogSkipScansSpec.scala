package graft.plans

import graft.SparkTestBase
import graft.pipeline.TxLog
import graft.sql.TxLogSql
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.datasources.{HadoopFsRelation, LogicalRelation}
import org.apache.spark.sql.functions._

/** The optimizer's automatic data-skipping rule: plain `SELECT …
  * WHERE` on a registered TxLog table must open only the dirs the
  * manifest stats cannot exclude — the structural claim the explicit
  * APIs (`snapshotPoint`/`snapshotRange`) already prove, now for the
  * SQL face with zero API calls in the query. */
class TxLogSkipScansSpec extends SparkTestBase {
  import spark.implicits._

  /** Every parquet scan path in the OPTIMIZED plan. */
  private def scanPaths(df: DataFrame): Seq[String] =
    df.queryExecution.optimizedPlan.collect {
      case l: LogicalRelation => l.relation match {
        case h: HadoopFsRelation => h.location.rootPaths.map(_.toString)
        case _ => Seq.empty[String]
      }
    }.flatten

  private def rangedTable(name: String): TxLog = {
    val t = TxLog(spark, tmpDir(s"skipscan_$name"), statsCols = Seq("k"),
      bloomCols = Seq("k"))
    // four appends with disjoint key ranges: per-dir stats are tight
    (0 until 4).foreach(b => t.append(
      (b * 100 until b * 100 + 100).map(i => (i.toLong, s"v$i"))
        .toDF("k", "v")))
    t
  }

  test("SQL WHERE range predicates prune scan dirs through the manifest stats") {
    val t = rangedTable("range")
    TxLogSql.register("skipscan_range", t)
    val all = scanPaths(spark.sql("SELECT * FROM skipscan_range")).length
    assert(all === 4)
    // equality: one dir survives (range + bloom agree)
    val eq = spark.sql("SELECT v FROM skipscan_range WHERE k = 137")
    assert(scanPaths(eq).length === 1)
    assert(eq.collect().map(_.getString(0)).toSeq === Seq("v137"))
    // band: two dirs
    val band = spark.sql(
      "SELECT count(*) FROM skipscan_range WHERE k >= 150 AND k < 250")
    assert(scanPaths(band).length === 2)
    assert(band.head().getLong(0) === 100L)
    // one-sided: two dirs
    assert(scanPaths(spark.sql(
      "SELECT * FROM skipscan_range WHERE k >= 200")).length === 2)
    // strict inequality widens to inclusive: the dir whose range ends
    // exactly at the excluded endpoint is conservatively kept
    assert(scanPaths(spark.sql(
      "SELECT * FROM skipscan_range WHERE k > 199")).length === 3)
    // IN across two dirs: union semantics, two survive
    val in = spark.sql("SELECT v FROM skipscan_range WHERE k IN (5, 305)")
    assert(scanPaths(in).length === 2)
    assert(in.collect().map(_.getString(0)).sorted === Seq("v305", "v5").sorted)
    // impossible predicate: empty relation, no scan at all — and the
    // result still has the right schema
    val none = spark.sql("SELECT * FROM skipscan_range WHERE k = 99999")
    assert(scanPaths(none).isEmpty)
    assert(none.count() === 0L && none.columns.toSeq === Seq("k", "v"))
    // unsupported shapes and non-stats columns keep every dir
    assert(scanPaths(spark.sql(
      "SELECT * FROM skipscan_range WHERE v = 'v5'")).length === 4)
    assert(scanPaths(spark.sql(
      "SELECT * FROM skipscan_range WHERE k % 2 = 0")).length === 4)
    // disjunctions contribute no pruning (conservative)
    assert(scanPaths(spark.sql(
      "SELECT * FROM skipscan_range WHERE k = 1 OR v = 'x'")).length === 4)
    TxLogSql.unregister("skipscan_range")
  }

  test("DATE predicates prune through the ISO-string stats — the time-range shape") {
    val t = TxLog(spark, tmpDir("skipscan_date"), statsCols = Seq("d"))
    (0 until 4).foreach { b =>
      t.append(spark.sql(
        s"SELECT DATE'2024-01-01' + make_interval(0,0,0,${b * 30} + x.id) AS d, x.id AS n " +
          s"FROM range(30) x"))
    }
    TxLogSql.register("skipscan_date", t)
    // a one-month window touches the one dir whose range covers it
    // (inclusive end: the strict `< Mar 1` form widens to ≤ and keeps
    // the dir whose min IS Mar 1 — the documented conservatism)
    val q = spark.sql("SELECT count(*) FROM skipscan_date " +
      "WHERE d >= DATE'2024-02-01' AND d <= DATE'2024-02-29'")
    assert(scanPaths(q).length === 1)
    assert(q.head().getLong(0) === 29L) // 2024-02-01 .. 2024-02-29
    // equality on a date
    val eq = spark.sql("SELECT n FROM skipscan_date WHERE d = DATE'2024-03-05'")
    assert(scanPaths(eq).length === 1)
    assert(eq.count() === 1L)
    TxLogSql.unregister("skipscan_date")
  }

  test("a fully-pruned scan keeps _metadata columns resolvable") {
    // the empty LocalRelation replacing an all-dirs-excluded scan must
    // carry the relation's METADATA attributes: a projection of
    // _metadata.file_path above the impossible Filter holds references
    // already resolved against them (ADVICE r9)
    val t = rangedTable("meta")
    TxLogSql.register("skipscan_meta", t)
    val q = spark.sql(
      "SELECT _metadata.file_path FROM skipscan_meta WHERE k = 99999")
    assert(scanPaths(q).isEmpty) // fully pruned...
    assert(q.count() === 0L)     // ...and still executable
    // sanity: the same projection over a surviving dir works and
    // names a real file
    val one = spark.sql(
      "SELECT _metadata.file_path FROM skipscan_meta WHERE k = 137")
    assert(one.collect().map(_.getString(0)).forall(_.contains("/data/")))
    TxLogSql.unregister("skipscan_meta")
  }

  test("pruned scans return exactly the unpruned rows (correctness is the residual filter's)") {
    val t = rangedTable("exact")
    TxLogSql.register("skipscan_exact", t)
    val q = "SELECT k, v FROM skipscan_exact WHERE k >= 42 AND k <= 301"
    val got = spark.sql(q).collect().map(r => (r.getLong(0), r.getString(1))).sorted
    val want = (42L to 301L).map(i => (i, s"v$i")).sorted
    assert(got.toSeq === want)
    TxLogSql.unregister("skipscan_exact")
  }

  test("skipping survives time travel, stays conservative without stats, and ignores unregistered reads") {
    val t = rangedTable("tt")
    TxLogSql.register("skipscan_tt", t)
    // overwrite drops the old dirs from the CURRENT manifest; a
    // time-travel read of v3 still prunes via the cross-version view
    t.overwrite(Seq((9999L, "z")).toDF("k", "v"))
    val tt = spark.sql("SELECT v FROM skipscan_tt VERSION AS OF 3 WHERE k = 137")
    assert(scanPaths(tt).length === 1)
    assert(tt.collect().map(_.getString(0)).toSeq === Seq("v137"))
    TxLogSql.unregister("skipscan_tt")
    // a statsless table never prunes
    val u = TxLog(spark, tmpDir("skipscan_nostats"))
    (0 until 3).foreach(b => u.append(Seq((b.toLong, s"v$b")).toDF("k", "v")))
    TxLogSql.register("skipscan_ns", u)
    assert(scanPaths(spark.sql(
      "SELECT * FROM skipscan_ns WHERE k = 1")).length === 3)
    assert(spark.sql("SELECT count(*) FROM skipscan_ns WHERE k = 1")
      .head().getLong(0) === 1L)
    TxLogSql.unregister("skipscan_ns")
    // an unregistered plain parquet read with the same shape is untouched
    val plain = tmpDir("skipscan_plain")
    (0L until 10L).map(i => (i, s"v$i")).toDF("k", "v")
      .write.mode("overwrite").parquet(plain)
    val df = spark.read.parquet(plain).filter(col("k") === 5L)
    assert(scanPaths(df).nonEmpty) // rule left it alone (paths unchanged)
    assert(df.count() === 1L)
  }
}
