package graft.pipeline

import graft.SparkTestBase
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** End-to-end golden replay (SURVEY §5, FIXTURES §6): full load →
  * incremental 1 → incremental 2 → idempotence, with every BASELINE.md
  * correctness invariant asserted. Runs the real SalesPipeline against
  * the reference's own CSVs (read-only). */
class PipelineSpec extends SparkTestBase {

  private val ref = "/root/reference"
  private lazy val root = tmpDir("pipeline_golden")
  private lazy val pipe = {
    val p = SalesPipeline(spark, root)
    p.run(s"$ref/SalesData.csv")
    p
  }

  private def counts: Map[String, Long] =
    (DimensionBuilder.specs.map(_.name) :+ "factsales")
      .map(n => n -> pipe.table(n).count()).toMap

  test("full load reproduces every BASELINE row count") {
    assert(counts === Map(
      "dim_branch" -> 1836L, "dim_dealer" -> 267L, "dim_model" -> 277L,
      "dim_date" -> 1156L, "factsales" -> 1849L))
  }

  test("silver schema is the reference's 13 columns with exact types") {
    pipe // force full load
    val silver = Silver.read(spark, s"$root/warehouse/silver/carsales")
    assert(silver.schema === Schemas.silver)
  }

  test("derived columns match the reference's golden outputs") {
    pipe
    val silver = Silver.read(spark, s"$root/warehouse/silver/carsales")
    // RevPerUnit: long/long → double (13363978/2 = 6681989.0)
    val r = silver.filter(col("Revenue") === 13363978L && col("Units_Sold") === 2L)
    assert(r.head().getAs[Double]("RevPerUnit") === 6681989.0)
    // model_category = split prefix
    val m = silver.filter(col("Model_ID") === "Mah-M167")
    assert(m.head().getAs[String]("model_category") === "Mah")
  }

  test("gold schemas match the reference star schema") {
    pipe
    assert(pipe.table("dim_branch").schema === Schemas.dimBranch)
    assert(pipe.table("dim_date").schema === Schemas.dimDate) // Day/Month/Year dropped
    assert(pipe.table("factsales").schema === Schemas.factSales)
  }

  test("surrogate keys are contiguous 1..N on the natural-key order") {
    pipe
    val keys = pipe.table("dim_dealer").select("dim_dealer_key")
      .collect().map(_.getLong(0)).sorted
    assert(keys === (1L to 267L).toArray)
  }

  test("incremental batch 1: new entities inserted, existing keys untouched") {
    pipe
    val dealerKeysBefore = pipe.table("dim_dealer")
      .select("Dealer_ID", "dim_dealer_key").collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    pipe.run(s"$ref/IncrementalSales.csv")
    assert(counts === Map(
      "dim_branch" -> 1840L, "dim_dealer" -> 268L, "dim_model" -> 278L,
      "dim_date" -> 1158L, "factsales" -> 1853L))
    // no-hyphen model: category is the whole string
    val zyx = pipe.table("dim_model").filter(col("Model_ID") === "ZYXM13")
    assert(zyx.head().getAs[String]("model_category") === "ZYXM13")
    // existing surrogate keys unchanged
    val after = pipe.table("dim_dealer").select("Dealer_ID", "dim_dealer_key")
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    dealerKeysBefore.foreach { case (k, v) => assert(after(k) === v) }
    // gold commits go through the transaction log: the pre-incremental
    // snapshot is still readable (time travel), one version back
    val log = pipe.catalog.txlog("gold", "dim_dealer")
    assert(log.currentVersion() >= 1)
    assert(log.snapshot(log.currentVersion() - 1).count() === 267L)
    assert(log.snapshot().count() === 268L)
    // and the SQL registration tracks the CURRENT snapshot (S9): the
    // catalog table must re-point at each commit's data dir
    assert(spark.sql("SELECT count(*) FROM gold.dim_dealer").head().getLong(0) === 268L)
  }

  test("incremental batch 2: SCD1 updates in place, counts and keys stable") {
    pipe.run(s"$ref/IncrementalSales.csv")
    val keysBefore = pipe.table("dim_dealer").select("Dealer_ID", "dim_dealer_key")
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    pipe.run(s"$ref/IncrementalSalesUpdate.csv")
    val d = pipe.table("dim_dealer")
    assert(d.filter(col("DealerName").endsWith(" up")).count() === 3)
    // the quoted-comma dealer got its update through the CSV parser
    assert(d.filter(col("DealerName") === "Fisker, Karma Motors up").count() === 1)
    assert(counts("dim_dealer") === 268L && counts("factsales") === 1853L)
    val keysAfter = pipe.table("dim_dealer").select("Dealer_ID", "dim_dealer_key")
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(keysAfter === keysBefore)
  }

  test("replaying a batch is a no-op (merge idempotence)") {
    pipe.run(s"$ref/IncrementalSalesUpdate.csv")
    val before = counts
    val namesBefore = pipe.table("dim_dealer").select("DealerName")
      .collect().map(r => Option(r.getString(0)).getOrElse("")).sorted
    pipe.run(s"$ref/IncrementalSalesUpdate.csv")
    assert(counts === before)
    val namesAfter = pipe.table("dim_dealer").select("DealerName")
      .collect().map(r => Option(r.getString(0)).getOrElse("")).sorted
    assert(namesAfter === namesBefore)
  }

  test("RunMode.ForceFull drops gold + watermark and reloads as initial") {
    // after the incremental batches above, a forced full load of the
    // original CSV must reproduce the pristine initial-load counts
    pipe.run(s"$ref/SalesData.csv", RunMode.ForceFull)
    assert(counts === Map(
      "dim_branch" -> 1836L, "dim_dealer" -> 267L, "dim_model" -> 277L,
      "dim_date" -> 1156L, "factsales" -> 1849L))
  }

  test("RunMode.ForceIncremental fails fast without persisted state") {
    val fresh = SalesPipeline(spark, tmpDir("pipeline_forceinc"))
    intercept[IllegalArgumentException](
      fresh.run(s"$ref/SalesData.csv", RunMode.ForceIncremental))
  }

  test("SQL registration survives multi-dir snapshots (append/mergePartitioned) via a view") {
    import spark.implicits._
    val cat = GoldCatalog(spark, tmpDir("catalog_multidir"))
    cat.ensureDatabases()
    cat.saveAsTable(Seq((1L, "a"), (2L, "b")).toDF("id", "v"), "gold", "multi_t")
    assert(spark.sql("SELECT count(*) FROM gold.multi_t").head().getLong(0) === 2L)
    // an append makes the snapshot multi-dir; register must fall back
    // to a view instead of silently dropping the SQL name
    cat.txlog("gold", "multi_t").append(Seq((3L, "c")).toDF("id", "v"))
    cat.register("gold", "multi_t")
    assert(spark.sql("SELECT count(*) FROM gold.multi_t").head().getLong(0) === 3L)
    // a merge compacts back to single-dir: view → table re-registration
    cat.mergeInto("gold", "multi_t", Seq((3L, "C")).toDF("id", "v"), Seq("id"))
    assert(spark.sql("SELECT v FROM gold.multi_t WHERE id = 3").head().getString(0) === "C")
    cat.dropTable("gold", "multi_t")
  }

  test("KeyMode.Faithful: unique keys above maxKey (reference mono-id semantics)") {
    import spark.implicits._
    val spec = DimensionBuilder.specs.find(_.name == "dim_dealer").get
    val silver = Seq(("D1", "Alpha"), ("D2", "Beta"), ("D3", "Gamma"))
      .toDF("Dealer_ID", "DealerName")
    val sink = Seq((5L, "D0", "Zero")).toDF("dim_dealer_key", "Dealer_ID", "DealerName")
    // plan() is src-driven: all three dealers are new (D0 stays in the
    // sink via the merge, not via plan), so 3 fresh keys, all unique
    // and above the sink's max key (5)
    val out = DimensionBuilder.plan(silver, sink, spec, KeyMode.Faithful)
      .select("dim_dealer_key").collect().map(_.getLong(0))
    assert(out.length === 3)
    assert(out.distinct.length === 3)
    assert(out.forall(_ > 5L))
  }
}
