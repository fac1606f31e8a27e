package graft.pipeline

import graft.SparkTestBase
import org.apache.spark.sql.functions._

/** S1/S3 — CSV parsing quirks + watermark/CDC semantics. */
class IngestSpec extends SparkTestBase {

  test("CSV source: BOM header, quoted embedded commas, empty → null") {
    val raw = Ingest.readSalesCsv(spark, "/root/reference/SalesData.csv")
    assert(raw.count() === 1849)
    assert(raw.schema === Schemas.raw) // BOM did not corrupt the first column name
    // quoted field with comma survives as one value
    assert(Ingest.readSalesCsv(spark, "/root/reference/IncrementalSales.csv")
      .filter(col("DealerName") === "Fisker, Karma Motors").count() === 1)
    // empty DealerName fields arrive as null
    assert(raw.filter(col("DealerName").isNull).count() > 0)
  }

  test("bronze drops Product_Name (11 columns)") {
    val bronze = Ingest.toBronze(Ingest.readSalesCsv(spark, "/root/reference/SalesData.csv"))
    assert(bronze.columns.length === 11)
    assert(!bronze.columns.contains("Product_Name"))
  }

  test("watermark filter keeps only rows strictly past the mark") {
    val raw = Ingest.readSalesCsv(spark, "/root/reference/IncrementalSales.csv")
    assert(Ingest.pastWatermark(raw, Some("DT01245")).count() === 4)
    assert(Ingest.pastWatermark(raw, Some("DT01246")).count() === 2)
    assert(Ingest.pastWatermark(raw, Some("DT01247")).count() === 0)
    assert(Ingest.pastWatermark(raw, None).count() === 4)
  }

  test("CDC ingest: update batch at the watermark loads only changed rows") {
    val root = tmpDir("ingest_cdc")
    val bronze = s"$root/bronze"
    // batch 1 (full): watermark None
    val wm1 = Ingest.ingest(spark, "/root/reference/IncrementalSales.csv", bronze, None)
    assert(wm1 === Some("DT01247"))
    assert(spark.read.parquet(bronze).count() === 4)
    // batch 2 re-uses DT01246-47: only the 3 changed rows load
    val wm2 = Ingest.ingest(spark, "/root/reference/IncrementalSalesUpdate.csv", bronze, wm1)
    assert(wm2 === Some("DT01247"))
    val b = spark.read.parquet(bronze)
    assert(b.count() === 3)
    assert(b.filter(col("DealerName").endsWith(" up")).count() === 3)
    // replaying batch 2: the 3 rows are now unchanged; only the XYZ row
    // (absent from current bronze) re-loads
    val wm3 = Ingest.ingest(spark, "/root/reference/IncrementalSalesUpdate.csv", bronze, wm2)
    assert(spark.read.parquet(bronze).count() === 1)
    // the mark must never regress, even when the batch holds only
    // rows below the old mark
    assert(wm3 === Some("DT01247"))
  }

  test("watermark state round-trips") {
    val p = tmpDir("ingest_wm") + "/wm.txt"
    assert(Ingest.readWatermark(p).isEmpty)
    Ingest.writeWatermark(p, "DT01245")
    assert(Ingest.readWatermark(p) === Some("DT01245"))
  }
}
