package graft.pipeline

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Incremental materialized-view maintenance over a change feed.
  *
  * The reference recomputes its gold aggregates from silver every run
  * (`gold_fact_sales.ipynb` re-reads the joined frame); at 100 TB the
  * production shape is DELTA MAINTENANCE — fold the change feed into
  * the standing aggregate so refresh cost tracks the bytes the commits
  * touched, not the table. SUM and COUNT are self-maintainable under
  * inserts, deletes, and updates (signed folding below); AVG derives
  * as sum/cnt. MIN/MAX are NOT (a deleted extremum needs a partial
  * recompute of its group) — callers wanting them recompute affected
  * groups only, using the feed's group keys as the prune set.
  */
object IncrementalMV {

  /** Fold change-feed rows into a SUM/COUNT aggregate.
    *
    * `mv` holds one row per group: `groupCols`, one summed column per
    * `sumCols` entry (same name as the source column), and `cntCol`
    * (row count). `changes` is [[TxLog.changes]] output (or any frame
    * with `_change_type`). Each change row folds with sign +1
    * (insert, update_postimage) or −1 (delete, update_preimage) — an
    * update whose row MOVES groups therefore decrements the old group
    * and increments the new one with no special casing. Groups whose
    * count reaches zero drop from the view.
    *
    * Exactness: signed folding is exact for integer and decimal sums
    * (the bench queries use decimal); float sums would drift and
    * belong in recompute-land. One shuffle over the DELTA (group the
    * changes) plus one keyed outer join against the view — never a
    * scan of the base table.
    */
  def applyDelta(mv: DataFrame, changes: DataFrame,
                 groupCols: Seq[String], sumCols: Seq[String],
                 cntCol: String = "cnt"): DataFrame = {
    val sign = when(col("_change_type").isin("insert", "update_postimage"),
      lit(1)).otherwise(lit(-1))
    val delta = changes
      .filter(col("_change_type").isin(
        "insert", "delete", "update_preimage", "update_postimage"))
      .groupBy(groupCols.map(col): _*)
      .agg(sum(sign).as(s"__d_$cntCol"),
        sumCols.map(c => sum(sign * col(c)).as(s"__d_$c")): _*)
    val folded = mv.join(delta, groupCols, "full_outer")
    val outCols =
      groupCols.map(col) ++
        sumCols.map { c =>
          val t = mv.schema(c).dataType
          (coalesce(col(c), lit(0).cast(t)) +
            coalesce(col(s"__d_$c"), lit(0).cast(t))).cast(t).as(c)
        } :+
        (coalesce(col(cntCol), lit(0L)) +
          coalesce(col(s"__d_$cntCol"), lit(0L))).cast("long").as(cntCol)
    folded.select(outCols: _*).filter(col(cntCol) > 0)
  }

  /** The recompute `applyDelta` replaces: the same view shape from a
    * full snapshot — used to seed the view and by specs/queries to
    * prove incremental == recompute. */
  def recompute(base: DataFrame, groupCols: Seq[String],
                sumCols: Seq[String], cntCol: String = "cnt"): DataFrame =
    base.groupBy(groupCols.map(col): _*)
      .agg(count(lit(1)).as(cntCol),
        sumCols.map(c => sum(col(c)).cast(base.schema(c).dataType).as(c)): _*)
      .select((groupCols.map(col) ++ sumCols.map(col) :+ col(cntCol)): _*)
}
