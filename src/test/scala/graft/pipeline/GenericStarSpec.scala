package graft.pipeline

import graft.SparkTestBase
import org.apache.spark.sql.functions._

/** The SCD1 dimension builder is generic — not car-sales-specific:
  * build a star schema over the TPC-H tables with the same machinery. */
class GenericStarSpec extends SparkTestBase {

  import spark.implicits._

  test("DimensionBuilder + Upsert build and maintain a TPC-H customer dim") {
    val spec = DimSpec("dim_customer", "dim_customer_key", "c_name", Seq("c_mktsegment"))
    val customers = spark.read.parquet(sf("0.001") + "/customer.parquet")
      .select(col("c_name"), col("c_mktsegment"))

    // initial build from an empty sink
    val sink0 = DimensionBuilder.emptySeed(spark, spec)
    val dim1 = DimensionBuilder.plan(customers, sink0, spec).cache()
    assert(dim1.count() === customers.select("c_name").distinct().count())
    val keys = dim1.select(spec.dimKey).collect().map(_.getLong(0)).sorted
    assert(keys === (1L to keys.length).toArray)

    // incremental: one changed attribute + one new natural key
    val batch = customers.limit(1)
      .select(col("c_name"), lit("CHANGED").as("c_mktsegment"))
      .unionByName(Seq(("brand-new-customer", "NEWSEG"))
        .toDF("c_name", "c_mktsegment"))
    val planned = DimensionBuilder.plan(batch.toDF("c_name", "c_mktsegment"), dim1, spec)
    val dim2 = Upsert.merge(dim1, planned, Seq(spec.dimKey))
    assert(dim2.count() === dim1.count() + 1)
    assert(dim2.filter(col("c_mktsegment") === "CHANGED").count() === 1)
    // changed row kept its surrogate key
    val changedName = batch.head().getString(0)
    val k1 = dim1.filter(col("c_name") === changedName).head().getLong(0)
    val k2 = dim2.filter(col("c_name") === changedName).head().getLong(0)
    assert(k1 === k2)
  }

  test("surrogate keys: distributed rank ≡ single-window reference, any partitioning, no global window over data") {
    // a "large" high-cardinality dimension — the initial-load shape the
    // single-partition row_number would have funnelled through one task
    val spec = DimSpec("dim_user", "dim_user_key", "user_nk", Seq("attr"))
    val big = spark.range(50000)
      .select(concat(lit("u"), format_string("%07d", col("id"))).as("user_nk"),
        (col("id") % 97).cast("string").as("attr"))
      .repartition(16) // arbitrary physical layout
    val sink = Seq((40L, "existing-user", "x"))
      .toDF("dim_user_key", "user_nk", "attr")
    val out = DimensionBuilder.plan(big, sink, spec)
    // reference semantics: maxKey + rank of natural key in sorted order
    val keys = out.filter(col("user_nk") =!= "existing-user")
      .orderBy("user_nk").select(col("dim_user_key"))
      .collect().map(_.getLong(0))
    assert(keys === (41L to 40L + 50000L).toArray)
    // same keys under a different input partitioning (determinism)
    val out2 = DimensionBuilder.plan(big.repartition(3), sink, spec)
      .filter(col("user_nk") =!= "existing-user")
      .orderBy("user_nk").select(col("dim_user_key"))
      .collect().map(_.getLong(0))
    assert(out2 === keys)
    // tripwire: NO partition-less window anywhere — the offsets frame
    // rides GlobalRank.metaWindow (constant-valued partition key), so
    // a partition-less WindowExec reappearing means an accidental
    // global window over data
    assert(graft.PlanChecks.assertGlobalWindowsAreMetadataOnly("dim_plan", out) === 0)
    // and the offsets window itself is still in the plan, partitioned
    // on the metaWindow key (same single-partition execution, no
    // WindowExec warning)
    val wins = out.queryExecution.executedPlan.collect {
      case w: org.apache.spark.sql.execution.window.WindowExec => Seq(w)
      case a: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec =>
        a.executedPlan.collect {
          case w: org.apache.spark.sql.execution.window.WindowExec => w }
    }.flatten
    assert(wins.nonEmpty, "the broadcast-offsets window vanished from the dim plan")
  }
}
