package graft.functions

import graft.SparkTestBase
import graft.functions.expressions.TopKPairAgg
import org.apache.spark.sql.Row
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

class TopKPairAggSpec extends SparkTestBase {
  import spark.implicits._

  private def topOf(df: org.apache.spark.sql.DataFrame, k: Int) =
    df.groupBy("g")
      .agg(TopKPairAgg.topk_pair_agg(spark, $"s", $"i", k).as("top"))
      .select($"g", posexplode($"top"))
      .select($"g", ($"pos" + 1).cast("int").as("rank"), $"col.score", $"col.id")
      .collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getDouble(2), r.getLong(3)))

  /** The window formulation the aggregate replaces — the reference. */
  private def windowRef(df: org.apache.spark.sql.DataFrame, k: Int) = {
    val w = Window.partitionBy($"g").orderBy($"s".desc, $"i")
    df.withColumn("rank", row_number().over(w))
      .filter($"rank" <= k)
      .select($"g", $"rank", $"s", $"i")
      .collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getDouble(2), r.getLong(3)))
  }

  test("pair top-k equals the row_number window reference on random groups (incl. score ties)") {
    val rnd = new scala.util.Random(47)
    // nextInt(50) / 10.0 forces plenty of exact score ties → the id
    // tie-break must match the window's ORDER BY s DESC, i ASC
    val rows = Seq.tabulate(4000)(i =>
      (rnd.nextInt(5).toLong, rnd.nextInt(50) / 10.0, i.toLong))
    val df = rows.toDF("g", "s", "i")
    assert(topOf(df, 5).sorted === windowRef(df, 5).sorted)
  }

  test("result is invariant to row order and partitioning (merge path exercised)") {
    val rows = Seq.tabulate(3000)(i => (i % 4L, (i * 2654435761L % 997).toDouble, i.toLong))
    val fwd = topOf(rows.toDF("g", "s", "i"), 7).sorted
    val rev = topOf(rows.reverse.toDF("g", "s", "i").repartition(13), 7).sorted
    assert(fwd === rev)
  }

  test("k larger than the group returns the whole group in ranking order") {
    val got = topOf(Seq((1L, 0.5, 10L), (1L, 0.9, 11L), (1L, 0.5, 3L)).toDF("g", "s", "i"), 10)
    assert(got.toSeq === Seq((1L, 1, 0.9, 11L), (1L, 2, 0.5, 3L), (1L, 3, 0.5, 10L)))
  }

  test("NaN scores rank greatest, matching the window's DESC NaN placement") {
    // cosine_sim of a zero-norm embedding yields NaN; Spark's double
    // ordering puts NaN ABOVE every value in DESC order, so the heap
    // must admit and rank it first — raw </== comparison would never
    // admit a NaN once the heap fills
    val rows = Seq((1L, Double.NaN, 100L), (1L, Double.NaN, 99L)) ++
      Seq.tabulate(500)(i => (1L, i / 100.0, i.toLong))
    val df = rows.toDF("g", "s", "i").repartition(7)
    val got = topOf(df, 4)
    val ref = windowRef(df, 4)
    // NaN != NaN under tuple equality — compare scores by bit pattern
    def bits(xs: Array[(Long, Int, Double, Long)]) =
      xs.map(t => (t._1, t._2, java.lang.Double.doubleToLongBits(t._3), t._4)).sorted
    assert(bits(got) === bits(ref))
    // the two NaN pairs lead, tie-broken by id ascending
    val byRank = got.sortBy(_._2)
    assert(byRank(0)._4 === 99L && byRank(0)._3.isNaN)
    assert(byRank(1)._4 === 100L && byRank(1)._3.isNaN)
    assert(byRank(2)._3 === 4.99)
  }

  test("NaN offered while filling keeps the heap ordered (weakest still evicted first)") {
    // NaN arrives FIRST (heap not yet full): under the broken raw-<
    // comparator this corrupted sift order; under the SQL total order
    // it sits at the top and the true weakest pair is evicted on the
    // k+1th offer
    val df = (Seq((1L, Double.NaN, 50L)) ++
      Seq((1L, 0.1, 1L), (1L, 0.9, 2L), (1L, 0.5, 3L), (1L, 0.7, 4L)))
      .toDF("g", "s", "i").coalesce(1)
    val got = topOf(df, 3).sortBy(_._2)
    assert(got.map(_._4).toSeq === Seq(50L, 2L, 4L))
  }

  test("SQL surface + analysis-time validation") {
    TopKPairAgg.register(spark)
    Seq.tabulate(20)(i => (i % 2, i / 7.0, i.toLong)).toDF("g", "s", "i")
      .createOrReplaceTempView("tkp_t")
    val out = spark.sql(
      "SELECT g, topk_pair_agg(s, i, 2) AS top FROM tkp_t GROUP BY g ORDER BY g")
      .collect().map(_.getSeq[Row](1).map(r => (r.getDouble(0), r.getLong(1))))
    assert(out(0) === Seq((18 / 7.0, 18L), (16 / 7.0, 16L)))
    assert(out(1) === Seq((19 / 7.0, 19L), (17 / 7.0, 17L)))
    intercept[org.apache.spark.sql.AnalysisException] {
      spark.sql("SELECT topk_pair_agg(s, i) FROM tkp_t").collect()
    }
    intercept[org.apache.spark.sql.AnalysisException] {
      spark.sql("SELECT topk_pair_agg(s, i, g) FROM tkp_t").collect()
    }
    intercept[org.apache.spark.sql.AnalysisException] {
      // wrong score type (BIGINT where DOUBLE required)
      spark.sql("SELECT topk_pair_agg(i, i, 3) FROM tkp_t").collect()
    }
  }
}
