package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame, Observation}
import org.apache.spark.sql.functions._

/** Zero-extra-scan pipeline metrics via Spark's Observation API:
  * quality counters ride the SAME job that materializes the frame —
  * `observe()` plants a CollectMetrics node whose aggregates evaluate
  * inline per task and merge on the driver when the action completes.
  * At 100 TB the alternative is a second full scan per metric batch;
  * here the counters are free riders on the write.
  *
  * Used by BOTH [[Ingest.ingest]] branches: the bronze watermark
  * (max Date_ID), row count, and null-key count ride the write job
  * itself — neither the full load nor an incremental batch ever runs
  * a separate scan for its watermark.
  */
object Metrics {

  /** Attach row/null-counter metrics (plus any `extra` aggregates) for
    * `cols` to `df`. Read `observation.get` only AFTER an action has
    * materialized the returned frame. */
  def observed(df: DataFrame, name: String, cols: Seq[String],
               extra: Seq[Column] = Seq.empty): (DataFrame, Observation) = {
    val obs = Observation(name)
    val aggs = count(lit(1)).as("n_rows") +:
      (cols.map(c => sum(when(col(c).isNull, 1L).otherwise(0L)).as(s"null_$c")) ++ extra)
    (df.observe(obs, aggs.head, aggs.tail: _*), obs)
  }
}
