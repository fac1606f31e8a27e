package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Range (interval) join: left rows matched to right rows whose
  * [lo, hi) interval contains the left value.
  *
  * Spark plans a raw inequality join as BroadcastNestedLoop — O(n·m)
  * and only viable when one side broadcasts. The scalable composition
  * is equi-bucketing: intervals explode to the fixed-width buckets they
  * overlap, points map to their bucket, the join becomes an equi-join
  * on bucket, and an exact range filter removes bucket-boundary false
  * candidates. Cost: one shuffle on bucket; candidate count tracks
  * actual interval coverage. Bucket width trades replication of wide
  * intervals against candidate precision — pick ≈ the median interval
  * width.
  */
object RangeJoin {

  /** left.valueCol ∈ [right.loCol, right.hiCol) — inner join.
    * Buckets of `width` on the value axis. */
  def bucketed(left: DataFrame, valueCol: String,
               right: DataFrame, loCol: String, hiCol: String,
               width: Double): DataFrame = {
    val lb = left.withColumn("__bucket",
      floor(col(valueCol) / lit(width)).cast("long"))
    val rb = right.withColumn("__bucket",
      explode(sequence(
        floor(col(loCol) / lit(width)).cast("long"),
        floor(col(hiCol) / lit(width)).cast("long"))))
    lb.join(rb, Seq("__bucket"))
      .filter(col(valueCol) >= col(loCol) && col(valueCol) < col(hiCol))
      .drop("__bucket")
  }
}
