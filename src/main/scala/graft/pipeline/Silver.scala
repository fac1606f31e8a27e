package graft.pipeline

import org.apache.spark.sql.DataFrame
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

  /** S5 — silver parquet sink. Overwrite for a full load; append for an
    * incremental batch (the bronze watermark guarantees no replays). */
  def write(silver: DataFrame, path: String, mode: String = "overwrite"): Unit =
    silver.write.mode(mode).parquet(path)
}
