package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Test-table access for the driver-provided TPC-H-ish data
  * (`TESTDATA.md`): one parquet per table under the given sf dir. */
object Tables {
  val names: Seq[String] = Seq("region", "nation", "customer", "supplier",
    "part", "orders", "lineitem", "events", "documents", "embeddings")

  def load(spark: SparkSession, dir: String, name: String): DataFrame =
    spark.read.parquet(s"$dir/$name.parquet")

  /** The events table carries TIMESTAMP(NANOS) parquet, which Spark 4
    * refuses by default (PARQUET_TYPE_ILLEGAL). Read the raw nanos as
    * long (`spark.sql.legacy.parquet.nanosAsLong`) and truncate to
    * microseconds with INTEGER division — epoch-nanos ≈ 1.7e18 exceeds
    * a double's 53-bit mantissa, so `/ 1000` through double would
    * corrupt the low digits. Truncation (floor) matches how DuckDB and
    * Arrow read the same file, so oracle comparisons line up.
    */
  def loadEvents(spark: SparkSession, dir: String): DataFrame = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    spark.read.parquet(s"$dir/events.parquet")
      .withColumn("ts", org.apache.spark.sql.functions.timestamp_micros(
        org.apache.spark.sql.functions.expr("ts div 1000")))
  }

  /** Register every table as a temp view for SQL-path queries (S4/S9). */
  def registerAll(spark: SparkSession, dir: String): Unit =
    names.foreach { n =>
      val df = if (n == "events") loadEvents(spark, dir) else load(spark, dir, n)
      df.createOrReplaceTempView(n)
    }
}
