package graft.functions

import graft.SparkTestBase
import graft.functions.expressions.MinHashAgg
import org.apache.spark.sql.functions._

class MinHashAggSpec extends SparkTestBase {
  import spark.implicits._

  private def sigsOf(df: org.apache.spark.sql.DataFrame) =
    df.groupBy("id").agg(MinHashAgg.minhash_agg(spark, $"h", 16).as("sig"))
      .orderBy("id").collect().map(_.getSeq[Long](1))

  test("signature is a sketch: sig(A ∪ B) = elementwise min(sig(A), sig(B))") {
    val a = Seq.tabulate(50)(i => (1L, i.toLong * 7919)).toDF("id", "h")
    val b = Seq.tabulate(50)(i => (1L, i.toLong * 104729 + 3)).toDF("id", "h")
    val sa = sigsOf(a.withColumn("id", lit(10L))).head
    val sb = sigsOf(b.withColumn("id", lit(20L))).head
    val su = sigsOf(a.union(b)).head
    assert(su === sa.zip(sb).map { case (x, y) => math.min(x, y) })
  }

  test("identical input sets yield identical signatures regardless of order") {
    val rows = Seq.tabulate(100)(i => (1L, i.toLong * 31337))
    val fwd = sigsOf(rows.toDF("id", "h")).head
    val rev = sigsOf(rows.reverse.toDF("id", "h").repartition(5)).head
    assert(fwd === rev)
  }

  test("SQL surface: minhash_agg(h, k) usable in spark.sql") {
    MinHashAgg.register(spark)
    Seq.tabulate(20)(i => (i % 2, i.toLong * 997)).toDF("g", "h")
      .createOrReplaceTempView("mh_t")
    val out = spark.sql("SELECT g, minhash_agg(h, 8) AS sig FROM mh_t GROUP BY g")
      .collect()
    assert(out.length === 2)
    out.foreach(r => assert(r.getSeq[Long](1).length === 8))
  }

  test("misuse is a clear analysis-time error: wrong arity, non-constant k") {
    MinHashAgg.register(spark)
    Seq((1, 10L)).toDF("g", "h").createOrReplaceTempView("mh_err_t")
    val e1 = intercept[Exception](
      spark.sql("SELECT minhash_agg(h) FROM mh_err_t").collect())
    assert(e1.getMessage.contains("minhash_agg"))
    val e2 = intercept[Exception](
      spark.sql("SELECT minhash_agg(h, g) FROM mh_err_t GROUP BY g").collect())
    assert(e2.getMessage.contains("minhash_agg"))
  }

  test("similar sets have similar signatures (minhash property)") {
    // two sets sharing 90% of elements should agree on most slots
    val base = Seq.tabulate(100)(i => i.toLong * 6151)
    val near = base.take(90) ++ Seq.tabulate(10)(i => i.toLong * 9973 + 1)
    val s1 = sigsOf(base.map((1L, _)).toDF("id", "h")).head
    val s2 = sigsOf(near.map((1L, _)).toDF("id", "h")).head
    val agree = s1.zip(s2).count { case (x, y) => x == y }
    assert(agree >= 8, s"only $agree/16 slots agree for 90%-overlapping sets")
  }
}
