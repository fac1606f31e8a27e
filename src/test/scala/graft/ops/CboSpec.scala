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
}
