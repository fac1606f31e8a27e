package graft.functions

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** The engine's ONE deterministic sampling idiom — the smallest-md5
  * rank draw: per group, keep the `cap` members with the smallest
  * (md5(x), tie) — a content-independent uniform draw that is
  * identical on any cluster size, any run, and on the DuckDB oracle
  * side (`row_number() OVER (PARTITION BY g ORDER BY md5(x), tie)
  * <= cap`). Used by the cosine-calibrator sample cap, the
  * cluster-balanced curation draw, and the stratified samplers.
  *
  * Two execution forms, chosen by whether the cap is a literal:
  *
  *   - [[capConstant]] — a LITERAL cap. The `row_number <= cap` filter
  *     takes Spark's WindowGroupLimit rewrite (constant limits under
  *     `windowGroupLimitThreshold`, default 1000): each input
  *     partition keeps a cap-sized heap map-side, the window shuffle
  *     carries ≤ cap rows per (partition, group), and no full
  *     per-group sort runs anywhere. Callers must keep caps under the
  *     threshold or the guarantee silently degrades to WindowExec.
  *
  *   - [[bottomKIds]] — a PER-GROUP VARIABLE cap (a column, e.g.
  *     isqrt(group size)). WindowGroupLimit does NOT apply to variable
  *     limits — the window form would sort each group's entire member
  *     list in one task. This form is the bounded-heap
  *     [[graft.functions.expressions.BottomKIdsAgg]]: O(k) state per
  *     group, map-side partials, same selected members as the window
  *     formulation (binary-collation md5 ties broken by id).
  */
object Md5Draw {

  /** The draw key for an id-like column: md5 of its string rendering —
    * lowercase hex, whose binary collation equals its numeric order,
    * identical in Spark and DuckDB (`md5(CAST(x AS VARCHAR))`). */
  def drawKey(c: Column): Column = md5(c.cast("string"))

  /** Constant-cap draw: rows of `df` whose rank under (hashCol ASC,
    * tie ASC) within `parts` is ≤ cap, with the rank exposed as `rn`.
    * `cap` MUST be a literal ≤ Spark's windowGroupLimitThreshold
    * (1000) for the WindowGroupLimit heap rewrite — the whole point of
    * routing draws through here (see object doc; plan-pinned in
    * PlanSpec). */
  def capConstant(df: DataFrame, parts: Seq[Column], hashCol: Column,
                  tie: Column, cap: Int): DataFrame = {
    // self-defending contract: past the session's rewrite threshold
    // the rank filter silently degrades to a full per-group WindowExec
    // sort — fail loudly instead (the plan-shape guarantee IS the API)
    val threshold = df.sparkSession.sessionState.conf.windowGroupLimitThreshold
    require(cap <= threshold,
      s"Md5Draw.capConstant cap=$cap exceeds windowGroupLimitThreshold=" +
        s"$threshold — the WindowGroupLimit heap rewrite would not fire")
    df.withColumn("rn", row_number().over(
        Window.partitionBy(parts: _*).orderBy(hashCol, tie)))
      .filter(col("rn") <= lit(cap))
  }

  /** Variable-cap draw: aggregate column selecting, per group, the
    * `kCol` ids smallest under (keyCol ASC, idCol ASC) as an
    * array<bigint> — `explode` it to reproduce the window
    * formulation's rows. `kCol` must be constant within each group
    * (it throws loudly otherwise). */
  def bottomKIds(spark: SparkSession, keyCol: Column, idCol: Column,
                 kCol: Column): Column =
    graft.functions.expressions.BottomKIdsAgg.bottomk_ids(spark, keyCol, idCol, kCol)
}
