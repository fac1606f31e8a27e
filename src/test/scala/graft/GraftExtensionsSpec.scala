package graft

import org.apache.spark.sql.SparkSession

class GraftExtensionsSpec extends SparkTestBase {

  test("spark.sql.extensions=graft.GraftExtensions registers native functions") {
    // force a fresh session build (shares the existing SparkContext) so
    // withExtensions actually applies
    val prev = spark // materialize the shared session first
    SparkSession.clearActiveSession()
    SparkSession.clearDefaultSession()
    try {
      val s2 = SparkSession.builder()
        .master("local[2]")
        .withExtensions(new GraftExtensions)
        .config("spark.ui.enabled", "false")
        .getOrCreate()
      val cos = s2.sql(
        "SELECT cosine_sim(array(CAST(1.0 AS FLOAT), CAST(0.0 AS FLOAT)), " +
          "array(CAST(1.0 AS FLOAT), CAST(0.0 AS FLOAT))) AS c").head().getDouble(0)
      assert(math.abs(cos - 1.0) < 1e-12)
      val d2 = s2.sql(
        "SELECT l2_sq(array(CAST(1.0 AS FLOAT), CAST(2.0 AS FLOAT)), " +
          "array(CAST(4.0 AS FLOAT), CAST(6.0 AS FLOAT))) AS d").head().getDouble(0)
      assert(d2 === 25.0)
      val sig = s2.sql(
        "SELECT minhash_agg(h, 4) AS sig FROM VALUES (1L), (2L), (3L) AS t(h)")
        .head().getSeq[Long](0)
      assert(sig.length === 4)
      // the injected planner strategy plans the custom as-of node
      import org.apache.spark.sql.functions.col
      val l = s2.range(3).select(col("id").as("k"), col("id").as("lts"))
      val r = s2.range(2).select(col("id").as("k"), col("id").as("rts"),
        (col("id") * 10).as("x"))
      val joined = org.apache.spark.sql.graft.GraftSqlBridge.ofRows(s2,
        graft.plans.AsOfJoinPlan(l.queryExecution.analyzed,
          r.queryExecution.analyzed, Seq("k"), "lts", "rts"))
      assert(joined.queryExecution.executedPlan.toString.contains("AsOfJoin"))
      assert(joined.count() === 3)
    } finally {
      SparkSession.setActiveSession(prev)
      SparkSession.setDefaultSession(prev)
    }
  }

  test("approx_count_distinct stays within the HLL++ error bound") {
    val li = spark.read.parquet(sf("0.01") + "/lineitem.parquet")
    val approx = li.selectExpr("approx_count_distinct(l_partkey) AS a").head().getLong(0)
    val exact = li.selectExpr("count(DISTINCT l_partkey) AS e").head().getLong(0)
    assert(math.abs(approx - exact).toDouble / exact < 0.1,
      s"approx=$approx exact=$exact")
  }
}
