package graft.functions

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Distributed EXACT global row_number over a total order — the
  * TeraSort-style two-phase rank:
  *
  *   1. `repartitionByRange` on the sort keys (range exchange — every
  *      partition holds a contiguous, sorted slice of the order),
  *   2. `row_number` WITHIN each partition (parallel),
  *   3. add each partition's exclusive prefix count, computed once over
  *      a `numParts`-row metadata frame and broadcast.
  *
  * Spark's own `row_number().over(Window.orderBy(...))` funnels the
  * ENTIRE input through one task — the classic 100× scale failure.
  * Here both shuffles (range + the offsets' hash) stay fully parallel;
  * the only partition-less window runs over the `numParts`-row offsets
  * aggregate, which is metadata, not data.
  *
  * `sortCols` must be a total order, or rank assignment on ties is
  * nondeterministic. Shared by surrogate-key generation
  * ([[graft.pipeline.DimensionBuilder]]) and the exact-ntile /
  * token-shard operators ([[graft.ops.CurationQueries]]).
  */
object GlobalRank {

  /** Window spec for a METADATA-sized frame (per-partition offsets,
    * small distinct lists), pinned to one partition by an explicit
    * constant-VALUED key: `pmod(xxhash64(key), 1)` is 0 for every row,
    * so execution is the same single partition a partition-less window
    * uses — but the partitionSpec is non-empty, so `WindowExec` does
    * not log its global-window warning and that warning stays a true
    * signal for ACCIDENTAL full-cardinality windows. (A literal key
    * doesn't work: Catalyst folds it away and the spec comes back
    * empty.) Only ever use this over aggregated/metadata cardinality. */
  def metaWindow(keyCol: Column): org.apache.spark.sql.expressions.WindowSpec =
    Window.partitionBy(pmod(xxhash64(keyCol), lit(1L)))

  /** Adds `outCol` = 1-based global rank of each row under `sortCols`.
    * When `totalCol` is set, also adds the total row count (derived
    * from the same per-partition counts — no extra scan). Internal
    * columns are dropped; column order of `df` is preserved. */
  def rowNumber(df: DataFrame, outCol: String, numParts: Int,
                sortCols: Seq[Column], totalCol: Option[String] = None): DataFrame = {
    require(sortCols.nonEmpty, "GlobalRank.rowNumber needs at least one sort column")
    val sorted = df.repartitionByRange(math.max(1, numParts), sortCols: _*)
      .withColumn("__pid", spark_partition_id())
    val wOff = metaWindow(col("__pid")).orderBy(col("__pid"))
    val counts = sorted.groupBy(col("__pid")).agg(count(lit(1)).as("__pn"))
    val offsets0 = counts
      .withColumn("__off", coalesce(sum(col("__pn")).over(
        wOff.rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
    val offsets = totalCol.fold(offsets0.select(col("__pid"), col("__off"))) { t =>
      offsets0.withColumn(t, sum(col("__pn")).over(
          wOff.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)))
        .select(col("__pid"), col("__off"), col(t))
    }
    val wLocal = Window.partitionBy(col("__pid")).orderBy(sortCols: _*)
    sorted.withColumn("__rn", row_number().over(wLocal))
      .join(broadcast(offsets), "__pid")
      .withColumn(outCol, col("__off") + col("__rn"))
      .drop("__pid", "__rn", "__off")
  }
}
