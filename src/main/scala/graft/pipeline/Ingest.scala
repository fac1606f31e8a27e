package graft.pipeline

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Bronze-layer ingestion: CSV source (S1) + watermark-based incremental
  * copy (S3) + parquet sink (S5).
  *
  * The reference's ingestion is an Azure Data Factory copy activity
  * (claimed `README.md:8,10`, no code checked in): GitHub CSV → SQL DB →
  * bronze parquet, keeping only rows past a persisted `Date_ID`
  * watermark and dropping `Product_Name`. Here it is one declarative
  * Spark job: scan → filter → project → write. The watermark predicate
  * is a plain `Column` filter so Catalyst pushes it into the CSV/parquet
  * scan; nothing shuffles.
  *
  * Scale note (100 TB): the watermark filter is applied before any wide
  * transform, so an incremental run's cost is proportional to the new
  * data, not the history. Bronze is written partitioned by `Year` so
  * downstream jobs with calendar predicates prune files.
  */
object Ingest {

  /** S1 — CSV source. Header row, UTF-8 BOM on the header, quoted fields
    * with embedded commas ("Fisker, Karma Motors"), empty strings → null.
    * Default: declared schema, no inference pass. `inferSchema = true`
    * reproduces the reference's literal option (`TESTING
    * NOTEBOOK.ipynb:22`) — it costs a full extra scan of the input, so
    * it is an opt-in fidelity flag, not the scale default.
    */
  def readSalesCsv(spark: SparkSession, path: String,
                   inferSchema: Boolean = false): DataFrame = {
    val base = spark.read
      .option("header", true)
      .option("quote", "\"")
      .option("escape", "\"")
    // univocity strips the BOM when the header is matched as text
    if (inferSchema) base.option("inferSchema", true).csv(path)
    else base.schema(Schemas.raw).csv(path)
  }

  /** S3 — watermark filter: keep only rows strictly past the persisted
    * high-water mark. `Date_ID` is an ordered string surrogate (DTnnnnn)
    * so lexicographic > is correct, exactly as the reference's ADF
    * incremental copy (`README.md:10`).
    */
  def pastWatermark(df: DataFrame, watermark: Option[String]): DataFrame =
    watermark.fold(df)(w => df.filter(col("Date_ID") > lit(w)))

  /** Raw → bronze projection: drop Product_Name (reference bronze has 11
    * of the 12 CSV columns, `TESTING NOTEBOOK.ipynb` cell 1 output). */
  def toBronze(raw: DataFrame): DataFrame =
    raw.drop("Product_Name")

  /** Full ingest step: CSV → changed-data capture → bronze parquet.
    *
    * Semantics (proved by the reference's replay data): the watermark
    * alone is not enough — `IncrementalSalesUpdate.csv` re-uses
    * Date_IDs DT01246-47 already past the watermark, yet the reference
    * bronze demonstrably contains its " up" rows (`TESTING
    * NOTEBOOK.ipynb` cell 1 output). So an incremental batch loads:
    *   (a) rows past the watermark (append path — cheap, pruned scan), plus
    *   (b) rows at-or-before the watermark whose full content differs
    *       from what bronze already holds (update path — a bag
    *       difference restricted by the Date_ID predicate, so at scale
    *       it only touches the partitions the batch can affect).
    * Returns the new watermark (max Date_ID seen), if any rows loaded.
    */
  def ingest(spark: SparkSession, csvPath: String, bronzePath: String,
             watermark: Option[String]): Option[String] = {
    val raw = toBronze(readSalesCsv(spark, csvPath))
    watermark match {
      case None =>
        raw.write.mode("overwrite").parquet(bronzePath)
      case Some(w) =>
        val fresh = raw.filter(col("Date_ID") > lit(w))
        val existing = spark.read.parquet(bronzePath)
          .filter(col("Date_ID") <= lit(w))
        val changed = raw.filter(col("Date_ID") <= lit(w)).exceptAll(existing)
        // the plan reads bronzePath → staged atomic swap, not in-place
        Upsert.overwriteAtomic(spark, fresh.unionByName(changed), bronzePath)
    }
    // One ungrouped max over the (already small) incremental batch.
    // The mark must never REGRESS: a changed-rows-only batch contains
    // only Date_IDs at-or-below the old mark, and persisting that max
    // would make unchanged rows look "fresh" again on later batches.
    val row = spark.read.parquet(bronzePath).agg(max("Date_ID")).first()
    Option(row.getString(0))
      .map(m => watermark.fold(m)(w => Ordering[String].max(w, m)))
      .orElse(watermark)
  }

  /** Watermark state: a 1-row JSON file next to the bronze dir
    * (the reference keeps it in an Azure SQL watermark table). */
  def readWatermark(path: String): Option[String] = {
    val f = new java.io.File(path)
    if (f.exists()) Some(new String(java.nio.file.Files.readAllBytes(f.toPath)).trim)
    else None
  }

  def writeWatermark(path: String, value: String): Unit = {
    val p = java.nio.file.Paths.get(path)
    if (p.getParent != null) java.nio.file.Files.createDirectories(p.getParent)
    java.nio.file.Files.write(p, value.getBytes)
  }
}
