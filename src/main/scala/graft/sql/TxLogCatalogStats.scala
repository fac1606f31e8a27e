package graft.sql

import graft.pipeline.TxLog
import org.apache.spark.sql.catalyst.TableIdentifier
import org.apache.spark.sql.catalyst.catalog.{CatalogColumnStat, CatalogStatistics, CatalogStorageFormat, CatalogTable, CatalogTableType}
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.execution.datasources.LogicalRelation
import org.apache.spark.sql.types._

/** The CONSUMER of `ANALYZE TABLE … COMPUTE STATISTICS`: the
  * `graft.stats.*` table properties the command persists
  * ([[graft.sql.TxLogAnalyzeCommand]]) feed Catalyst's cost-based
  * planning, exactly as Spark's own catalog statistics do — a
  * registered TxLog table gets statistics-driven broadcast decisions,
  * join reorder, and filter-selectivity estimation WITHOUT a scan.
  *
  * Mechanism: when a SQL read of a registered table resolves to its
  * current snapshot plan ([[TxLogSql]] read resolution), the plan's
  * parquet relation is stamped with a synthetic catalog-table entry
  * carrying [[CatalogStatistics]] decoded from the properties —
  * rowCount + sizeInBytes at the table level, ndv / null count (and,
  * for plainly-parseable numeric types, min/max) per column.
  * `LogicalRelation.computeStats` serves those to the optimizer.
  *
  * Two deliberate guards:
  *   - Injection happens ONLY when cost-based planning is on
  *     (`spark.sql.cbo.enabled` / `spark.sql.planStats.enabled`).
  *     `CatalogStatistics.toPlanStats` replaces the relation's REAL
  *     file-size estimate with the recorded one even when CBO is off,
  *     so unconditional stamping would let a stale ANALYZE (table
  *     grown 1000× since) under-estimate a huge side below the
  *     broadcast threshold under DEFAULT configs — worse than no
  *     stats. CBO off ⇒ plan untouched ⇒ file-size estimates, Spark's
  *     own catalog behavior.
  *   - Injection requires the snapshot plan to contain EXACTLY ONE
  *     parquet relation. A merge-on-read snapshot (tombstone anti-join
  *     sidecars) or a schema-evolution union resolves to several
  *     relations; stamping each with the FULL table's rowCount would
  *     multiply the estimate and mis-plan the very joins this feature
  *     exists to improve. Conservative skip, never a wrong number.
  *
  * Staleness follows Spark's catalog behavior: statistics recorded at
  * `graft.stats.version` keep serving until the next ANALYZE, however
  * many commits land in between — the per-column
  * `graft.stats.col.<c>.version` keys exist precisely so an operator
  * can judge that staleness and re-ANALYZE.
  *
  * At 100 TB this is the difference between a star join that
  * broadcasts its dimension because the OPTIMIZER knows it is small
  * and one that sort-merges a 100-row table against the fact because
  * the planner only saw unanalyzed file bytes. */
object TxLogCatalogStats {

  private val Fields = Seq("ndv", "nulls", "min", "max", "version")

  /** `plan` with ANALYZE statistics attached to its scan relation, or
    * `plan` unchanged when the table was never analyzed, CBO is off,
    * or the plan is not a single-relation read (guards above).
    * `version` pins the SAME snapshot the caller resolved — reading
    * "current" properties independently would race a concurrent
    * commit and attach version-N+1 stats to a version-N plan. Min/max
    * attach only for numeric columns — their cast-to-string rendering
    * round-trips through Spark's external-string parser; other types'
    * renderings might not, and a planning-time parse failure is worse
    * than a missing bound. */
  def withStats(name: String, t: TxLog, version: Long,
                plan: LogicalPlan): LogicalPlan = {
    val conf = org.apache.spark.sql.internal.SQLConf.get
    if (!conf.cboEnabled && !conf.planStatsEnabled) return plan
    if (plan.collect { case lr: LogicalRelation => lr }.size != 1) return plan
    val props = t.properties(version).toMap
    val rowCount = props.get("graft.stats.numRows")
      .flatMap(s => scala.util.Try(BigInt(s)).toOption)
    if (rowCount.isEmpty) return plan
    val sizeInBytes = props.get("graft.stats.sizeInBytes")
      .flatMap(s => scala.util.Try(BigInt(s)).toOption)
      .filter(_ > 0)
      .getOrElse(rowCount.get.max(1) * 32)
    val byCol: Map[String, Map[String, String]] = props.toSeq.collect {
      case (k, v) if k.startsWith("graft.stats.col.") =>
        val rest = k.stripPrefix("graft.stats.col.")
        Fields.collectFirst {
          case f if rest.endsWith("." + f) =>
            (rest.dropRight(f.length + 1), f -> v)
        }
    }.flatten.groupBy(_._1).map { case (c, kvs) => c -> kvs.map(_._2).toMap }
    def numeric(dt: DataType): Boolean = dt match {
      case ByteType | ShortType | IntegerType | LongType |
           FloatType | DoubleType | _: DecimalType => true
      case _ => false
    }
    def colStat(c: String, dt: DataType): Option[CatalogColumnStat] =
      byCol.get(c).map { m =>
        CatalogColumnStat(
          distinctCount = m.get("ndv").flatMap(s =>
            scala.util.Try(BigInt(s)).toOption),
          min = if (numeric(dt)) m.get("min") else None,
          max = if (numeric(dt)) m.get("max") else None,
          nullCount = m.get("nulls").flatMap(s =>
            scala.util.Try(BigInt(s)).toOption))
      }
    plan.transform {
      case lr: LogicalRelation if lr.catalogTable.isEmpty =>
        val colStats = lr.output.flatMap(a =>
          colStat(a.name, a.dataType).map(a.name -> _)).toMap
        val ct = CatalogTable(
          identifier = TableIdentifier(name.split('.').last),
          tableType = CatalogTableType.EXTERNAL,
          storage = CatalogStorageFormat.empty,
          schema = StructType(lr.output.map(a =>
            StructField(a.name, a.dataType, a.nullable))),
          provider = Some("graft"),
          stats = Some(CatalogStatistics(sizeInBytes, rowCount, colStats)))
        lr.copy(catalogTable = Some(ct))
    }
  }
}
