package graft.pipeline

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Silver transform (R12): bronze + two derived columns.
  *
  * The reference's silver notebook is missing from the checkout
  * (`.MISSING_LARGE_BLOBS:1`); semantics are reconstructed from the gold
  * notebooks' embedded outputs (SURVEY §1.2):
  *   - model_category = split(Model_ID, '-')[0]
  *     (proof: `Mah-M167 → Mah` in `gold_dim_model.ipynb` cell 7 output;
  *     hyphen-less `ZYXM13` stays whole — Spark split returns the full
  *     string at index 0 when the delimiter is absent)
  *   - RevPerUnit = Revenue / Units_Sold, long/long → double
  *     (proof: 13363978/2 = 6681989.0 in `gold_fact_sales.ipynb` cell 9)
  *
  * Both are narrow, codegen'd projections — no shuffle at any scale.
  */
object Silver {

  def transform(bronze: DataFrame): DataFrame =
    bronze
      .withColumn("model_category", split(col("Model_ID"), "-").getItem(0))
      .withColumn("RevPerUnit", col("Revenue") / col("Units_Sold"))

  /** S5 — silver parquet sink, Hive-partitioned by Year/Month (the
    * SURVEY §7.5 100 TB posture: silver is the volume table, and both
    * the incremental ingest and typical analytics are time-scoped, so
    * Year/Month dirs give partition-pruned scans and let an
    * incremental batch land as a handful of new partition dirs instead
    * of rewriting history). Overwrite for a full load; append for an
    * incremental batch (the bronze watermark guarantees no replays). */
  def write(silver: DataFrame, path: String, mode: String = "overwrite"): Unit =
    silver.write.mode(mode).partitionBy("Year", "Month").parquet(path)

  /** Read silver back in the reference's canonical 13-column order.
    * The schema is supplied explicitly (partition columns included —
    * Spark matches Year/Month to the discovered dirs by name): this
    * pins the declared [[Schemas.silver]] ordering/types AND makes a
    * zero-row silver readable (a partitioned overwrite of an empty
    * batch leaves no files to infer from, which is legal state after
    * an already-seen batch replays to nothing). */
  def read(spark: SparkSession, path: String): DataFrame =
    spark.read.schema(Schemas.silver).parquet(path)
      .select(Schemas.silver.fieldNames.map(col).toSeq: _*)
}
