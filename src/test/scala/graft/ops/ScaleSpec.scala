package graft.ops

import graft.SparkTestBase
import org.apache.spark.sql.functions._

class ScaleSpec extends SparkTestBase {

  test("partitioned sink: calendar predicate prunes partitions at the scan") {
    val path = tmpDir("scale_part") + "/orders_by_year"
    val orders = spark.read.parquet(sf("0.001") + "/orders.parquet")
      .withColumn("o_year", year(col("o_orderdate")))
    Scale.writePartitioned(orders, path, Seq("o_year"))

    val pruned = spark.read.parquet(path).filter(col("o_year") === 1995)
    val plan = pruned.queryExecution.executedPlan.toString
    // partition filter must reach the file index, not a post-scan Filter
    assert(plan.contains("PartitionFilters") && plan.contains("o_year"),
      s"no partition pruning in plan:\n$plan")
    // and results are correct
    val expected = orders.filter(col("o_year") === 1995).count()
    assert(pruned.count() === expected)
  }

  test("AQE splits a skewed shuffle-join partition at runtime (and stays exact)") {
    // the OTHER skew lever next to explicit salting: Adaptive Query
    // Execution re-plans a sort-merge join whose largest partition
    // dwarfs the median into parallel skew-split reads. Thresholds are
    // lowered (scoped + restored) so the tiny test corpus trips it.
    withConf(
      "spark.sql.adaptive.skewJoin.skewedPartitionFactor" -> "2",
      "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes" -> "1KB",
      "spark.sql.adaptive.advisoryPartitionSizeInBytes" -> "2KB",
      // coalescing would glue the small partitions back together and
      // mask the skew detector on a corpus this small
      "spark.sql.adaptive.coalescePartitions.enabled" -> "false",
      "spark.sql.adaptive.forceOptimizeSkewedJoin" -> "true",
      "spark.sql.autoBroadcastJoinThreshold" -> "-1") { // force the shuffle join
      val li = spark.read.parquet(sf("0.01") + "/lineitem.parquet")
        // multiple map outputs: AQE splits a skewed REDUCE partition
        // along mapper boundaries, so a single-mapper input (one small
        // parquet file) is structurally unsplittable however skewed
        .repartition(8)
        // 90% of rows land on one key — the classic hot-key fact side
        .withColumn("sk",
          when(col("l_orderkey") % 10 < 9, 0L).otherwise(col("l_orderkey")))
      val dim = spark.range(0, 200000, 1, 4).toDF("sk")
        .withColumn("tag", col("sk") % 7)
      val joined = li.join(dim, "sk")
        .groupBy(col("tag")).agg(count(lit(1)).as("n"),
          sum(col("l_quantity").cast("decimal(18,2)")).as("qty"))
      val rows = joined.collect().map(r =>
        (r.getLong(0), r.getLong(1), r.getDecimal(2).toPlainString)).sortBy(_._1)
      // AQE actually split the hot partition
      val plan = joined.queryExecution.executedPlan.toString
      assert(plan.contains("AQEShuffleRead skewed") && plan.contains("skew=true"),
        s"no skew split in adaptive plan:\n${plan.take(1500)}")
      // the answer must match the skew-oblivious broadcast plan,
      // computed OUTSIDE the scoped skew confs (withConf restores them)
      (li, dim, rows)
    } match { case (li, dim, rows) =>
      val want = li.join(org.apache.spark.sql.functions.broadcast(dim), "sk")
        .groupBy(col("tag")).agg(count(lit(1)).as("n"),
          sum(col("l_quantity").cast("decimal(18,2)")).as("qty"))
        .collect().map(r =>
          (r.getLong(0), r.getLong(1), r.getDecimal(2).toPlainString)).sortBy(_._1)
      assert(rows.toSeq === want.toSeq)
    }
  }

  test("TPC-H shapes survive broadcast being impossible: SMJ fallback is result-identical") {
    // the 100 TB design point: orders/customer/part no longer fit in a
    // broadcast. The queries carry no hints on those sides, so forcing
    // the threshold to -1 (static AND adaptive) must degrade them to
    // shuffle joins — and the answer must not move a bit.
    def rows(name: String): Seq[String] =
      graft.SparkEntry.queries(name)(spark, sf("0.001"))
        .collect().map(_.toString).sorted.toSeq
    val broadcastRun = Seq("q3_shipping_priority", "q5_region_volume", "q14_promo_share",
        "q7_nation_volume", "q10_returned_items", "q18_large_orders",
        "q21_waiting_suppliers")
      .map(n => n -> rows(n)).toMap
    withConf(
      "spark.sql.autoBroadcastJoinThreshold" -> "-1",
      "spark.sql.adaptive.autoBroadcastJoinThreshold" -> "-1") {
      // q3 has NO hints at all — with broadcast off the plan must fall
      // back to shuffle joins rather than secretly depending on a hint
      val q3 = graft.SparkEntry.queries("q3_shipping_priority")(spark, sf("0.001"))
      q3.collect()
      val p3 = q3.queryExecution.executedPlan.toString
      assert(!p3.contains("BroadcastHashJoin"), p3.take(1200))
      assert(p3.contains("SortMergeJoin") || p3.contains("ShuffledHashJoin"), p3.take(1200))
      for ((name, want) <- broadcastRun)
        assert(rows(name) === want, s"$name: SMJ fallback changed results")
    }
  }

  test("salted join is row-identical to the plain join") {
    val li = spark.read.parquet(sf("0.001") + "/lineitem.parquet")
      .select(col("l_orderkey"), col("l_partkey"), col("l_quantity"))
    val parts = spark.read.parquet(sf("0.001") + "/part.parquet")
      .select(col("p_partkey").as("l_partkey"), col("p_brand"))
    val plain = li.join(parts, Seq("l_partkey"), "left")
    val salted = Scale.saltedLeftJoin(li, parts, Seq("l_partkey"),
      spread = col("l_orderkey"), saltBuckets = 8)
      .select(plain.columns.map(col).toSeq: _*)
    assert(salted.count() === plain.count())
    assert(salted.exceptAll(plain).count() === 0)
    assert(plain.exceptAll(salted).count() === 0)
  }
}
