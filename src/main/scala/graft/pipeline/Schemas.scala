package graft.pipeline

import org.apache.spark.sql.types._

/** Declared StructTypes for every layer of the medallion pipeline.
  *
  * The reference infers schemas at every boundary (SURVEY §1.3;
  * reference `TESTING NOTEBOOK.ipynb:21-23`). We declare them once: at
  * 100 TB an inference pass is a full extra scan of the source, and a
  * schema drift should fail loudly at the ingest edge, not 3 layers
  * downstream. Types are the ground truth from the reference's embedded
  * execution outputs (`gold_dim_branch.ipynb:27940-28095`, cell 6).
  */
object Schemas {

  /** Raw sales CSV: 12 columns (reference `SalesData.csv:1` header). */
  val raw: StructType = StructType(Seq(
    StructField("Branch_ID", StringType),
    StructField("Dealer_ID", StringType),
    StructField("Model_ID", StringType),
    StructField("Revenue", LongType),
    StructField("Units_Sold", LongType),
    StructField("Date_ID", StringType),
    StructField("Day", IntegerType),
    StructField("Month", IntegerType),
    StructField("Year", IntegerType),
    StructField("BranchName", StringType),
    StructField("DealerName", StringType),
    StructField("Product_Name", StringType),
  ))

  /** Bronze = raw minus Product_Name (reference bronze has 11 cols,
    * `TESTING NOTEBOOK.ipynb` cell 1 output). */
  val bronze: StructType = StructType(raw.fields.filterNot(_.name == "Product_Name"))

  /** Silver = bronze + model_category (string) + RevPerUnit (double). */
  val silver: StructType = StructType(
    bronze.fields :+
      StructField("model_category", StringType) :+
      StructField("RevPerUnit", DoubleType))

  /** Gold star schema (SURVEY §1.2 table 3). */
  def dimSchema(dimKey: String, naturalKey: String, attrs: Seq[StructField]): StructType =
    StructType(StructField(dimKey, LongType) +: StructField(naturalKey, StringType) +: attrs)

  val dimBranch: StructType = dimSchema("dim_branch_key", "Branch_ID",
    Seq(StructField("BranchName", StringType)))
  val dimDealer: StructType = dimSchema("dim_dealer_key", "Dealer_ID",
    Seq(StructField("DealerName", StringType)))
  val dimModel: StructType = dimSchema("dim_model_key", "Model_ID",
    Seq(StructField("model_category", StringType)))
  // Quirk preserved from the reference: dim_date drops Day/Month/Year
  // (`gold_dim_date.ipynb:53318`, cell 27 output).
  val dimDate: StructType = dimSchema("dim_date_key", "Date_ID", Seq.empty)

  val factSales: StructType = StructType(Seq(
    StructField("Revenue", LongType),
    StructField("Units_Sold", LongType),
    StructField("RevPerUnit", DoubleType),
    StructField("dim_branch_key", LongType),
    StructField("dim_dealer_key", LongType),
    StructField("dim_model_key", LongType),
    StructField("dim_date_key", LongType),
  ))
}
