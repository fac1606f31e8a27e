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
