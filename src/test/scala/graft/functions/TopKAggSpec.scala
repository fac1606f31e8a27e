package graft.functions

import graft.SparkTestBase
import graft.functions.expressions.TopKAgg
import org.apache.spark.sql.functions._

class TopKAggSpec extends SparkTestBase {
  import spark.implicits._

  private def topOf(df: org.apache.spark.sql.DataFrame, k: Int) =
    df.groupBy("g").agg(TopKAgg.topk_agg(spark, $"v", k).as("top"))
      .orderBy("g").collect()
      .map(r => r.getLong(0) -> r.getSeq[Long](1))

  test("top-k equals the sorted-take reference on random groups") {
    val rnd = new scala.util.Random(31)
    val rows = Seq.fill(5000)((rnd.nextInt(7).toLong, rnd.nextInt(10000).toLong))
    val got = topOf(rows.toDF("g", "v"), 5).toMap
    val want = rows.groupBy(_._1).map { case (g, vs) =>
      g -> vs.map(_._2).sorted(Ordering[Long].reverse).take(5)
    }
    got.foreach { case (g, top) => assert(top === want(g), s"group $g") }
  }

  test("result is invariant to row order and partitioning (merge path exercised)") {
    val rows = Seq.tabulate(2000)(i => (i % 3L, (i * 2654435761L) % 100000))
    val fwd = topOf(rows.toDF("g", "v"), 7)
    val rev = topOf(rows.reverse.toDF("g", "v").repartition(13), 7)
    assert(fwd === rev)
  }

  test("k larger than the group returns the whole group sorted descending") {
    val got = topOf(Seq((1L, 5L), (1L, 9L), (1L, 1L)).toDF("g", "v"), 10)
    assert(got === Array(1L -> Seq(9L, 5L, 1L)))
  }

  test("boundary ties keep identical values (deterministic multiset)") {
    val got = topOf(Seq((1L, 9L), (1L, 7L), (1L, 7L), (1L, 7L), (1L, 3L))
      .toDF("g", "v"), 3)
    assert(got === Array(1L -> Seq(9L, 7L, 7L)))
  }

  test("SQL surface: topk_agg(v, k) usable in spark.sql; misuse is an analysis error") {
    TopKAgg.register(spark)
    Seq.tabulate(20)(i => (i % 2, i.toLong)).toDF("g", "v")
      .createOrReplaceTempView("tk_t")
    val out = spark.sql("SELECT g, topk_agg(v, 3) AS top FROM tk_t GROUP BY g")
      .orderBy("g").collect().map(_.getSeq[Long](1))
    assert(out(0) === Seq(18L, 16L, 14L))
    assert(out(1) === Seq(19L, 17L, 15L))
    intercept[org.apache.spark.sql.AnalysisException] {
      spark.sql("SELECT topk_agg(v) FROM tk_t").collect()
    }
    intercept[org.apache.spark.sql.AnalysisException] {
      spark.sql("SELECT topk_agg(v, g) FROM tk_t").collect()
    }
  }

  test("non-BIGINT value column fails at analysis, not with a runtime ClassCastException") {
    TopKAgg.register(spark)
    Seq(("x", 1), ("y", 2)).toDF("s", "i").createOrReplaceTempView("tk_bad")
    // STRING and INT columns both violate the Long buffer contract
    intercept[org.apache.spark.sql.AnalysisException] {
      spark.sql("SELECT topk_agg(s, 3) FROM tk_bad").collect()
    }
    intercept[org.apache.spark.sql.AnalysisException] {
      spark.sql("SELECT topk_agg(i, 3) FROM tk_bad").collect()
    }
  }
}
