package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Scale utilities: calendar-partitioned sinks and skew-resistant
  * joins. These are the knobs a 100 TB deployment turns; the parity
  * pipeline stays byte-compatible with the reference (unpartitioned
  * silver/gold) and these wrap it where a real deployment would.
  */
object Scale {

  /** Partitioned parquet sink: directory-partitions by the given
    * columns so calendar predicates prune files at the scan
    * (`PartitionFilters` in the plan, no data read outside matching
    * partitions). For the sales pipeline the natural key is Year (or
    * Year/Month at larger volume).
    */
  def writePartitioned(df: DataFrame, path: String, cols: Seq[String]): Unit =
    df.write.mode("overwrite").partitionBy(cols: _*).parquet(path)

  /** Bucketed table sink: co-partitions the table on the join key at
    * write time (`bucketBy`), so equi-joins between tables bucketed on
    * the same key and count need NO shuffle on either side — the
    * pre-partitioning is reused across every downstream join/agg on
    * that key. The big-fact ⋈ big-fact case broadcast can't cover.
    */
  def writeBucketed(df: DataFrame, table: String, bucketCol: String,
                    buckets: Int): Unit =
    df.write.mode("overwrite")
      .bucketBy(buckets, bucketCol)
      .sortBy(bucketCol)
      .format("parquet")
      .saveAsTable(table)

  /** Salted left equi-join for skewed keys.
    *
    * A hash-partitioned join sends every row of a hot key to one task.
    * Salting fans the LEFT (large, skewed) side across `saltBuckets`
    * sub-keys using a deterministic hash of `spread` (any column with
    * per-row variation), and replicates the RIGHT (small) side once per
    * bucket. Result is row-identical to the plain join; the shuffle key
    * becomes (key, salt) so a hot key occupies `saltBuckets` tasks.
    *
    * AQE's skew-join handles sort-merge skew automatically at runtime;
    * this explicit form covers aggregations-after-join layouts and
    * engines/paths where AQE cannot split (e.g. bucketed tables).
    */
  def saltedLeftJoin(large: DataFrame, small: DataFrame, keys: Seq[String],
                     spread: Column, saltBuckets: Int = 16): DataFrame = {
    val saltedLarge = large.withColumn("__salt",
      pmod(xxhash64(spread), lit(saltBuckets.toLong)))
    val saltedSmall = small.withColumn("__salt",
      explode(sequence(lit(0L), lit(saltBuckets.toLong - 1))))
    saltedLarge.join(saltedSmall, keys :+ "__salt", "left").drop("__salt")
  }
}
