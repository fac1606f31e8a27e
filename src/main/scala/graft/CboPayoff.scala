package graft

import org.apache.spark.sql.SparkSession

/** End-to-end CBO payoff measurement at bench fidelity (round-15
  * verdict item 7): the Q9 profit shape (fact ⋈ filtered part ⋈
  * supplier ⋈ orders ⋈ nation, grouped by nation × year) over graft
  * TxLog tables at the target SF, run under identical confs in three
  * stats conditions:
  *
  *   - `no_stats`   — tables never ANALYZEd (planner sees file bytes)
  *   - `analyzed`   — ANALYZE … FOR ALL COLUMNS (rowCount/ndv/bounds
  *                    AND the 32-bin equi-height histograms, numeric +
  *                    DATE/TIMESTAMP as of round 15)
  *   - `no_hist`    — identical stats minus every histogram property
  *                    (the UNSET counterfactual, isolating what the
  *                    histograms add over bounds at full fidelity)
  *
  * Conditions interleave round-robin (3 reps each) so JIT/page-cache
  * warming cancels; the report is per-condition medians plus a plan
  * digest (join operators in order) so a wall-time delta is traceable
  * to a plan change, not noise. Broadcast threshold is pinned low
  * enough that the filtered sides must EARN a broadcast through
  * statistics — the 100 TB posture, where file sizes alone would
  * sort-merge everything.
  *
  * `runMain graft.CboPayoff [sfDir]` (default target/sf1 — run
  * ScaleUp first). One-time table builds land under target/tmp.
  */
object CboPayoff {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/repo/target/sf1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.extensions", "graft.GraftExtensions")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import graft.sql.TxLogSql

    val root = s"/root/repo/target/tmp/cbo_payoff_${sfDir.hashCode.abs}"
    org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(root))
    // two incarnations of each table so `no_stats` can never see the
    // analyzed tables' properties: *_ns (never analyzed) and *_an
    // (ANALYZEd; histograms UNSET for the no_hist condition, restored
    // from a re-ANALYZE)
    val tables = Seq("lineitem", "orders", "part", "supplier", "nation")
    for (t <- tables; suf <- Seq("ns", "an")) {
      val name = s"cbo9_${t}_$suf"
      spark.sql(s"DROP TABLE IF EXISTS $name")
      spark.sql(s"""CREATE TABLE $name USING graft LOCATION '$root/${t}_$suf'
        AS SELECT * FROM parquet.`$sfDir/$t.parquet`""")
    }
    tables.foreach(t =>
      spark.sql(s"ANALYZE TABLE cbo9_${t}_an COMPUTE STATISTICS FOR ALL COLUMNS"))

    def q9(suf: String): String = s"""
      SELECT n_name AS nation, year(o_orderdate) AS o_year,
             CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2)) * (100 - CAST(l_discount * 100 AS INT)) / 100) AS DOUBLE) AS profit
      FROM cbo9_lineitem_$suf
      JOIN cbo9_part_$suf     ON p_partkey = l_partkey
      JOIN cbo9_supplier_$suf ON s_suppkey = l_suppkey
      JOIN cbo9_orders_$suf   ON o_orderkey = l_orderkey
      JOIN cbo9_nation_$suf   ON s_nationkey = n_nationkey
      WHERE p_name LIKE '%green%'
      GROUP BY n_name, year(o_orderdate)"""

    def unsetHists(): Unit = tables.foreach { t =>
      val hists = graft.pipeline.TxLog(spark, s"$root/${t}_an").properties()
        .map(_._1).filter(k => k.startsWith("graft.stats.col.") && k.endsWith(".hist"))
      if (hists.nonEmpty)
        spark.sql(s"ALTER TABLE cbo9_${t}_an UNSET TBLPROPERTIES (" +
          hists.map(k => s"'$k'").mkString(", ") + ")")
    }
    def reAnalyze(): Unit = tables.foreach(t =>
      spark.sql(s"ANALYZE TABLE cbo9_${t}_an COMPUTE STATISTICS FOR ALL COLUMNS"))

    def planDigest(sql: String): String = {
      val p = spark.sql(sql).queryExecution.executedPlan.toString
      val joins = "(BroadcastHashJoin|SortMergeJoin|ShuffledHashJoin)".r
        .findAllIn(p).toSeq
      joins.groupBy(identity).map { case (k, v) => s"$k x${v.size}" }
        .toSeq.sorted.mkString(", ")
    }

    val conf = Seq(
      "spark.sql.cbo.enabled" -> "true",
      "spark.sql.cbo.joinReorder.enabled" -> "true",
      "spark.sql.autoBroadcastJoinThreshold" -> (4 * 1024 * 1024).toString)

    def timed(sql: String): Double = {
      val t0 = System.nanoTime()
      spark.sql(sql).collect()
      (System.nanoTime() - t0) / 1e9
    }

    graft.ops.Q.withConf(spark, conf: _*) {
      // warm both table sets once, untimed
      timed(q9("ns")); timed(q9("an"))
      val conds = Seq("no_stats" -> "ns", "analyzed" -> "an", "no_hist" -> "an")
      val times = scala.collection.mutable.Map.empty[String, List[Double]]
        .withDefaultValue(Nil)
      val digests = scala.collection.mutable.Map.empty[String, String]
      (1 to 3).foreach { _ =>
        conds.foreach { case (cond, suf) =>
          if (cond == "no_hist") unsetHists()
          else if (cond == "analyzed") reAnalyze()
          digests(cond) = planDigest(q9(suf))
          times(cond) = timed(q9(suf)) :: times(cond)
        }
      }
      reAnalyze() // leave the tables fully analyzed
      conds.map(_._1).distinct.foreach { cond =>
        val ts = times(cond).sorted
        val med = ts(ts.size / 2)
        println(f"$cond%-10s median=${med}%6.2f s  runs=${times(cond).reverse.map(t => f"$t%.2f").mkString("/")}  plan: ${digests(cond)}")
      }
    }
    tables.foreach { t =>
      TxLogSql.unregister(s"cbo9_${t}_ns"); TxLogSql.unregister(s"cbo9_${t}_an")
    }
    spark.stop()
  }
}
