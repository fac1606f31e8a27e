package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Test-table access for the driver-provided TPC-H-ish data
  * (`TESTDATA.md`): one parquet per table under the given sf dir. */
object Tables {
  val names: Seq[String] = Seq("region", "nation", "customer", "supplier",
    "part", "orders", "lineitem", "events", "documents", "embeddings")

  def load(spark: SparkSession, dir: String, name: String): DataFrame =
    spark.read.parquet(s"$dir/$name.parquet")

  /** The events table's `ts` physical type has varied across driver
    * data generations: TIMESTAMP(NANOS) (Spark 4 refuses it by default
    * — read raw nanos as long via `nanosAsLong` and floor-divide to
    * micros; `/ 1000` through double would corrupt the low digits) or
    * native TIMESTAMP(MICROS) without zone (reads as TIMESTAMP_NTZ —
    * cast to the session zone, UTC everywhere here). Both paths yield
    * the same UTC-micros TimestampType column DuckDB and Arrow see, so
    * oracle comparisons line up regardless of the file's vintage. */
  def loadEvents(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.functions.{col, expr, timestamp_micros}
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val raw = spark.read.parquet(s"$dir/events.parquet")
    raw.schema("ts").dataType match {
      case org.apache.spark.sql.types.LongType =>
        raw.withColumn("ts", timestamp_micros(expr("ts div 1000")))
      case _ =>
        raw.withColumn("ts", col("ts").cast("timestamp"))
    }
  }

  /** Register every table as a temp view for SQL-path queries (S4/S9). */
  def registerAll(spark: SparkSession, dir: String): Unit =
    names.foreach { n =>
      val df = if (n == "events") loadEvents(spark, dir) else load(spark, dir, n)
      df.createOrReplaceTempView(n)
    }
}
