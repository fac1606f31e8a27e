package graft.functions

import org.apache.spark.sql.catalyst.expressions.{BloomFilterMightContain, Expression}
import org.apache.spark.sql.catalyst.expressions.aggregate.BloomFilterAggregate
import org.apache.spark.sql.functions._
import org.apache.spark.sql.{Column, DataFrame, SparkSession}

/** Bloom-filter semi-join pruning — the "runtime filter" pattern, made
  * explicit: sketch the small side's join keys into a bloom filter,
  * then drop non-matching rows of the BIG side at the scan, before any
  * shuffle. At 100 TB this is the difference between shuffling the
  * full fact table and shuffling only the ~matching fraction; the
  * false-positive remainder is removed by the exact join that follows,
  * so the composition is semantically transparent.
  *
  * Built on Spark's own Catalyst machinery (`BloomFilterAggregate` /
  * `BloomFilterMightContain` — the expressions behind
  * `spark.sql.optimizer.runtime.bloomFilter.enabled`), registered as
  * session functions the same way as [[expressions.MinHashAgg]]. The
  * sketch itself is a few-KB binary collected once on the driver and
  * embedded as a literal — `BloomFilterMightContain` requires a
  * constant filter side, and a KB-scale literal broadcasts with the
  * task binary exactly like [[VectorFunctions.srpPlanes]].
  */
object BloomFunctions {

  private def fail(msg: String): Nothing =
    throw new org.apache.spark.sql.AnalysisException(
      errorClass = "INTERNAL_ERROR",
      messageParameters = Map("message" -> s"bloom: $msg"))

  /** Register `bloom_agg(xxhash64(k), items, bits)` and
    * `bloom_contains(bf, xxhash64(k))` for SQL + call_function use. */
  def register(spark: SparkSession): Unit = {
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "bloom_agg",
      (exprs: Seq[Expression]) => {
        if (exprs.length != 3)
          fail(s"bloom_agg expects (hash, estimatedItems, numBits), got ${exprs.length} args")
        if (!exprs(1).foldable || !exprs(2).foldable)
          fail("bloom_agg sizing arguments must be constants")
        new BloomFilterAggregate(exprs.head, exprs(1), exprs(2))
      }, "scala_udf")
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "bloom_contains",
      (exprs: Seq[Expression]) => {
        if (exprs.length != 2)
          fail(s"bloom_contains expects (bloom, hash), got ${exprs.length} args")
        BloomFilterMightContain(exprs.head, exprs(1))
      }, "scala_udf")
  }

  /** Aggregate `key` over `df` into a bloom filter sketch; one
    * distributed pass (partial sketches merged), one small binary on
    * the driver. */
  def sketch(df: DataFrame, key: Column, estimatedItems: Long, numBits: Long): Array[Byte] = {
    register(df.sparkSession)
    df.select(call_function("bloom_agg", xxhash64(key),
        lit(estimatedItems), lit(numBits)).as("bf"))
      .head().getAs[Array[Byte]]("bf")
  }

  /** One-pass variant: the sketch AND the exact key count from the
    * same aggregation job — no separate `count()` pass over the input.
    * The count cannot size THIS sketch (`BloomFilterAggregate` needs
    * its size up front), so callers size from an estimate and use the
    * measured count to decide whether the estimate held; see
    * `join_bloom_prefilter` for the re-sketch-on-overflow contract. */
  def sketchWithCount(df: DataFrame, key: Column, estimatedItems: Long,
                      numBits: Long): (Array[Byte], Long) = {
    register(df.sparkSession)
    val row = df.select(
      call_function("bloom_agg", xxhash64(key),
        lit(estimatedItems), lit(numBits)).as("bf"),
      count(key).as("n")).head()
    (row.getAs[Array[Byte]]("bf"), row.getAs[Long]("n"))
  }

  /** Codegen'd membership probe against a driver-built sketch. May
    * return false-positive `true`s (never false negatives) — always
    * follow with the exact join. */
  def mightContain(spark: SparkSession, bloom: Array[Byte], key: Column): Column = {
    register(spark)
    call_function("bloom_contains", lit(bloom), xxhash64(key))
  }
}
