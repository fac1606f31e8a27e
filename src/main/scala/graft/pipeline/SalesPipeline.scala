package graft.pipeline

import org.apache.spark.sql.{DataFrame, SparkSession}

/** End-to-end medallion pipeline orchestration (SURVEY §3 entry points
  * A+B+C): CSV → bronze (watermark) → silver → 4 SCD1 dims → fact.
  *
  * The reference runs this as six notebooks with an `incremental_flag`
  * widget (S12, `gold_dim_branch.ipynb:62`); here full-vs-incremental
  * is decided by the persisted watermark + table existence (S8) by
  * default ([[RunMode.Auto]]), with a manual override mirroring the
  * reference's flag for operational fidelity.
  */

/** Manual full/incremental override (the reference's
  * `incremental_flag` widget, `gold_dim_branch.ipynb:62`). */
sealed trait RunMode
object RunMode {
  /** Watermark + table existence decide — the engine default. */
  case object Auto extends RunMode
  /** Reference flag '0': ignore persisted state, drop gold, reload the
    * batch as an initial full load. */
  case object ForceFull extends RunMode
  /** Reference flag '1': require prior state (fails fast if no
    * watermark has ever been persisted — the reference would silently
    * mis-merge in that situation). */
  case object ForceIncremental extends RunMode
}

final case class SalesPipeline(spark: SparkSession, root: String) {

  val catalog: GoldCatalog = GoldCatalog(spark, s"$root/warehouse")
  private val bronzePath = s"$root/bronze/rawdata"
  private val silverPath = s"$root/warehouse/silver/carsales"
  private val watermarkPath = s"$root/state/watermark.txt"

  /** One batch: ingest a CSV past the watermark, refresh silver, build
    * gold. Re-runnable; an already-seen batch is filtered to zero rows
    * by the watermark and the merges are no-ops (idempotence, §5). */
  def run(csvPath: String, mode: RunMode = RunMode.Auto): Unit = {
    catalog.ensureDatabases()
    mode match {
      case RunMode.ForceFull =>
        // reset to the initial-load branch: no watermark, no gold
        (DimensionBuilder.specs.map(_.name) :+ "factsales")
          .foreach(t => catalog.dropTable("gold", t))
        new java.io.File(watermarkPath).delete()
      case RunMode.ForceIncremental =>
        require(Ingest.readWatermark(watermarkPath).isDefined,
          "RunMode.ForceIncremental requires a persisted watermark (run a full load first)")
      case RunMode.Auto => ()
    }
    val wm = Ingest.readWatermark(watermarkPath)
    val newWm = Ingest.ingest(spark, csvPath, bronzePath, wm)

    val bronze = Ingest.readBronze(spark, bronzePath)
    val initial = !catalog.tableExists("gold", "factsales")
    // Silver holds the current batch (full history on first load) —
    // mirrors the reference where bronze/silver carry only the
    // post-watermark copy (TESTING NOTEBOOK cell 1 output).
    Silver.write(Silver.transform(bronze), silverPath)
    val silver = Silver.read(spark, silverPath)

    DimensionBuilder.specs.foreach(spec =>
      DimensionBuilder.build(spark, catalog, silver, spec))
    FactBuilder.build(spark, catalog, silver)
    DimensionBuilder.specs.foreach(s => catalog.register("gold", s.name))
    catalog.register("gold", "factsales")
    newWm.foreach(Ingest.writeWatermark(watermarkPath, _))
    val _ = initial
  }

  def table(name: String): DataFrame = catalog.table("gold", name)
}
