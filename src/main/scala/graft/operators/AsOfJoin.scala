package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** As-of join: for every left row, attach the single right row with the
  * greatest right timestamp ≤ the left timestamp within the same key
  * group (the time-series "latest state as of" lookup).
  *
  * Spark has no native as-of join; per the engine's preference order
  * (compose > custom plan) this is the classic scalable composition:
  * tag both sides, UNION, and take `last(right, ignoreNulls)` over a
  * (key)-partitioned window ordered by (ts, side). One shuffle on the
  * key, one in-partition sort — same cost profile as a sort-merge join,
  * no per-row range probing, no broadcast requirement. Right rows sort
  * before left rows at equal timestamps, giving `>=` (inclusive)
  * semantics, matching ANSI/DuckDB `ASOF JOIN ... ON l.ts >= r.ts`.
  *
  * The right side must be unique per (keys, ts) — dedupe first (as-of
  * ties are ambiguous in every engine).
  */
object AsOfJoin {

  /** @param left      left relation
    * @param right     right relation, unique per (keys, rightTs)
    * @param keys      equi-join key columns (present on both sides)
    * @param leftTs    left event-time column name
    * @param rightTs   right event-time column name
    * @return left columns + right columns (null when no right row is
    *         at-or-before the left timestamp); right's key/ts columns
    *         are dropped (they equal the left's by construction)
    */
  def asofLeft(left: DataFrame, right: DataFrame, keys: Seq[String],
               leftTs: String, rightTs: String): DataFrame = {
    val rightPayload = right.columns.filterNot(c => keys.contains(c) || c == rightTs)
    val l = left
      .withColumn("__ts", col(leftTs))
      .withColumn("__side", lit(1))
    val r = right
      .withColumn("__ts", col(rightTs))
      .withColumn("__side", lit(0))
      .withColumn("__r", struct(rightPayload.map(col).toSeq: _*))
      .select((keys.map(col) :+ col("__ts") :+ col("__side") :+ col("__r")): _*)
    // union by name: left rows get __r = null, right rows get the left
    // payload columns = null — one relation, one shuffle on the keys
    val u = l.unionByName(r, allowMissingColumns = true)
    val w = Window.partitionBy(keys.map(col): _*)
      .orderBy(col("__ts"), col("__side"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val matched = u.withColumn("__match", last(col("__r"), ignoreNulls = true).over(w))
      .filter(col("__side") === 1)
    val outLeft = left.columns.map(col)
    val outRight = rightPayload.map(c => col(s"__match.$c").as(c))
    matched.select((outLeft ++ outRight).toSeq: _*)
  }
}
