package graft.ops

import graft.SparkTestBase
import org.apache.spark.sql.functions._

/** Cost-based optimization: with table + column statistics ANALYZEd in,
  * Catalyst's join reorder must rewrite an adversarially-ordered join
  * chain so the selective dimension reduces the fact FIRST — the
  * statistics-driven planning a 100 TB star schema depends on.
  */
class CboSpec extends SparkTestBase {

  test("ANALYZEd statistics drive join reorder: selective dim joins the fact first") {
    Seq("cbo_lineitem", "cbo_orders", "cbo_region").foreach { t =>
      spark.sql(s"DROP TABLE IF EXISTS $t")
      org.apache.commons.io.FileUtils.deleteDirectory(
        new java.io.File(s"/root/repo/spark-warehouse/$t"))
    }
    spark.read.parquet(sf("0.001") + "/lineitem.parquet")
      .select(col("l_orderkey"), col("l_suppkey"), col("l_quantity"))
      .write.saveAsTable("cbo_lineitem")
    spark.read.parquet(sf("0.001") + "/orders.parquet")
      .select(col("o_orderkey"), col("o_custkey"))
      .write.saveAsTable("cbo_orders")
    // 5-row "dim" keyed to orders
    spark.read.parquet(sf("0.001") + "/orders.parquet")
      .select(col("o_orderkey").as("r_orderkey")).limit(5)
      .write.saveAsTable("cbo_region")
    Seq("cbo_lineitem", "cbo_orders", "cbo_region").foreach(t =>
      spark.sql(s"ANALYZE TABLE $t COMPUTE STATISTICS FOR ALL COLUMNS"))
    val sql = """
      SELECT count(*) AS n
      FROM cbo_lineitem l
      JOIN cbo_orders o ON l.l_orderkey = o.o_orderkey
      JOIN cbo_region r ON o.o_orderkey = r.r_orderkey"""
    def joinOrderLeaves(p: org.apache.spark.sql.execution.SparkPlan): Seq[String] =
      p.collectLeaves().map(_.toString)
    withConf("spark.sql.cbo.enabled" -> "true",
      "spark.sql.cbo.joinReorder.enabled" -> "true",
      "spark.sql.autoBroadcastJoinThreshold" -> "-1",
      "spark.sql.adaptive.enabled" -> "false") {
      val df = spark.sql(sql)
      val optimized = df.queryExecution.optimizedPlan.toString
      // CBO must pull the 5-row dim INTO the first join against orders
      // (or lineitem) instead of leaving it last as written — i.e. the
      // innermost join must involve cbo_region
      val joins = df.queryExecution.optimizedPlan.collect {
        case j: org.apache.spark.sql.catalyst.plans.logical.Join => j
      }
      assert(joins.size === 2, optimized.take(1500))
      val innermost = joins.last // deepest join in the tree
      val innerTables = innermost.collectLeaves().map(_.toString).mkString(" ")
      assert(innerTables.contains("cbo_region"),
        s"CBO left the 5-row dim out of the innermost join:\n${optimized.take(2000)}")
      assert(df.head().getLong(0) > 0)
    }
    // and WITHOUT CBO the join order stays as written (region last) —
    // proving the reorder came from the statistics, not the parser
    withConf("spark.sql.cbo.enabled" -> "false",
      "spark.sql.autoBroadcastJoinThreshold" -> "-1",
      "spark.sql.adaptive.enabled" -> "false") {
      val joins = spark.sql(sql).queryExecution.optimizedPlan.collect {
        case j: org.apache.spark.sql.catalyst.plans.logical.Join => j
      }
      val innerTables = joins.last.collectLeaves().map(_.toString).mkString(" ")
      assert(!innerTables.contains("cbo_region"),
        "baseline (no CBO) unexpectedly reordered the chain")
    }
  }

  test("TxLog ANALYZE feeds CBO: persisted stats flip a filtered join to broadcast, no scan") {
    import graft.sql.TxLogSql
    val loc = tmpDir("cbo_txlog")
    spark.sql(s"""
      CREATE TABLE cbo_txlog (id BIGINT, pad STRING) USING graft
      TBLPROPERTIES ('keys' = 'id') LOCATION '$loc'""")
    // ~30k rows of incompressible padding: the parquet footprint is
    // far above the broadcast threshold, so WITHOUT statistics the
    // planner sees only big file bytes on both sides
    spark.range(30000)
      .selectExpr("id", "md5(CAST(id AS STRING)) AS pad")
      .createOrReplaceTempView("cbo_txlog_src")
    spark.sql("INSERT INTO cbo_txlog SELECT id, pad FROM cbo_txlog_src")
    val sql = """
      SELECT count(*) AS n
      FROM cbo_txlog a
      JOIN (SELECT id, pad FROM cbo_txlog WHERE id <= 100) b
        ON a.id = b.id"""
    def hasBroadcast(df: org.apache.spark.sql.DataFrame): Boolean =
      df.queryExecution.sparkPlan.collect {
        case b: org.apache.spark.sql.execution.joins.BroadcastHashJoinExec => b
      }.nonEmpty
    withConf("spark.sql.cbo.enabled" -> "true",
      "spark.sql.adaptive.enabled" -> "false",
      "spark.sql.autoBroadcastJoinThreshold" -> (64 * 1024).toString) {
      // BEFORE ANALYZE: no rowCount, the filtered side's estimate stays
      // the full file size → sort-merge
      assert(!hasBroadcast(spark.sql(sql)),
        "join broadcast before any statistics existed — threshold too high?")
      spark.sql("ANALYZE TABLE cbo_txlog COMPUTE STATISTICS FOR COLUMNS id")
      // AFTER ANALYZE: rowCount + id's min/max make the id<=100 side
      // ~0.3% selective → estimated bytes under the threshold →
      // broadcast. The statistics came from TABLE PROPERTIES (one
      // manifest read), not from scanning data at plan time.
      val df = spark.sql(sql)
      assert(hasBroadcast(df),
        "ANALYZEd statistics did not flip the filtered join to broadcast:\n" +
          df.queryExecution.optimizedPlan.toString.take(2000))
      assert(df.head().getLong(0) === 101L)
      // the injected stats carry the analyzed rowCount on the scan
      val scanStats = df.queryExecution.optimizedPlan.collect {
        case lr: org.apache.spark.sql.execution.datasources.LogicalRelation
            if lr.catalogTable.exists(_.provider.contains("graft")) =>
          lr.stats
      }
      assert(scanStats.nonEmpty, "no graft-stamped relation in the plan")
      assert(scanStats.exists(_.rowCount.contains(BigInt(30000))),
        s"scan stats missing the ANALYZEd rowCount: $scanStats")
    }
    // time-traveled reads do NOT carry the stats (they describe the
    // analyzed snapshot, not an arbitrary historical one)
    val tt = spark.sql("SELECT * FROM cbo_txlog VERSION AS OF 0")
    assert(!tt.queryExecution.optimizedPlan.collect {
      case lr: org.apache.spark.sql.execution.datasources.LogicalRelation
          if lr.catalogTable.isDefined => lr
    }.exists(_ => true), "time travel carried current-snapshot stats")
    TxLogSql.unregister("cbo_txlog")
  }

  test("stats injection guards: inert with CBO off; skipped on multi-relation (MoR) snapshots") {
    import graft.pipeline.TxLog
    import graft.sql.TxLogSql
    import org.apache.spark.sql.execution.datasources.LogicalRelation
    val loc = tmpDir("cbo_guards")
    spark.sql(s"""
      CREATE TABLE cbo_guards (id BIGINT, v STRING) USING graft
      TBLPROPERTIES ('keys' = 'id') LOCATION '$loc'""")
    spark.range(500).selectExpr("id", "CAST(id AS STRING) AS v")
      .createOrReplaceTempView("cbo_guards_src")
    spark.sql("INSERT INTO cbo_guards SELECT * FROM cbo_guards_src")
    spark.sql("ANALYZE TABLE cbo_guards COMPUTE STATISTICS FOR COLUMNS id")
    def stamped(df: org.apache.spark.sql.DataFrame): Boolean =
      df.queryExecution.optimizedPlan.collect {
        case lr: LogicalRelation if lr.catalogTable.isDefined => lr
      }.nonEmpty
    // CBO OFF (the default): the plan must stay on REAL file-size
    // estimates — CatalogStatistics.sizeInBytes would otherwise
    // override them, letting a stale ANALYZE of a since-grown table
    // under-estimate a huge join side below the broadcast threshold
    assert(!stamped(spark.sql("SELECT * FROM cbo_guards")),
      "stats were injected with cost-based planning disabled")
    withConf("spark.sql.cbo.enabled" -> "true") {
      assert(stamped(spark.sql("SELECT * FROM cbo_guards")),
        "stats missing under CBO on a single-relation snapshot")
      // a merge-on-read DELETE makes the snapshot a multi-relation
      // plan (tombstone anti-join sidecars): stamping each relation
      // with the FULL table's rowCount would multiply the estimate,
      // so injection must skip — conservative, never a wrong number
      TxLog(spark, loc).deleteWhere("id % 10 = 0")
      spark.sql("ANALYZE TABLE cbo_guards COMPUTE STATISTICS FOR COLUMNS id")
      val mor = spark.sql("SELECT * FROM cbo_guards")
      val rels = mor.queryExecution.optimizedPlan.collect {
        case lr: LogicalRelation => lr }
      assert(rels.size > 1, "expected a multi-relation MoR snapshot plan")
      assert(!stamped(mor),
        "full-table stats were stamped onto a multi-relation snapshot")
      assert(mor.count() === 450)
    }
    TxLogSql.unregister("cbo_guards")
  }

  test("metadata caches purge on same-root recreate: no stale instants or properties") {
    import graft.pipeline.TxLog
    val loc = tmpDir("cbo_recreate")
    val t0 = TxLog(spark, loc)
    import spark.implicits._
    t0.overwrite(Seq((1L, "old")).toDF("id", "v"))
    t0.setProperties(Seq(TxLog.IctProp -> "true", "owner" -> "old"))
    t0.append(Seq((2L, "old2")).toDF("id", "v"))
    val oldInstant = t0.commitInstant(2L) // cached (recorded ICT)
    val oldProps = t0.properties() // cached
    assert(oldProps.toMap.apply("owner") === "old")
    // delete and RE-CREATE at the same root, same process — the new
    // incarnation's commits must purge the old one's cached metadata
    org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(loc))
    val t1 = TxLog(spark, loc)
    t1.overwrite(Seq((1L, "new")).toDF("id", "v"))
    t1.setProperties(Seq(TxLog.IctProp -> "true", "owner" -> "new"))
    t1.append(Seq((2L, "new2")).toDF("id", "v"))
    assert(t1.properties().toMap.apply("owner") === "new",
      "recreated table served the dead incarnation's cached properties")
    // the instant must come from the NEW manifest on disk, not the
    // dead incarnation's cache entry
    val recorded = java.nio.file.Files.readString(java.nio.file.Paths.get(
        s"$loc/_txlog/00000002.json")).linesIterator
      .find(_.startsWith("#commitTs=")).get.stripPrefix("#commitTs=").toLong
    assert(t1.commitInstant(2L) === recorded,
      "recreated table served the dead incarnation's cached instant")
    // and time travel resolves on the NEW clock
    assert(t1.versionAsOf(recorded) === 2L)
    assert(oldInstant > 0L) // silence unused warning; old value was read pre-delete
  }
}
