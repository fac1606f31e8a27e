package graft.sql

import graft.pipeline.TxLog
import org.apache.spark.sql.catalyst.TableIdentifier
import org.apache.spark.sql.catalyst.catalog.{CatalogColumnStat, CatalogStatistics, CatalogStorageFormat, CatalogTable, CatalogTableType}
import org.apache.spark.sql.catalyst.plans.LeftAnti
import org.apache.spark.sql.catalyst.plans.logical
import org.apache.spark.sql.catalyst.plans.logical.{Join, LogicalPlan}
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
  *   - Statistics attach only to DATA relations — parquet relations
  *     that CONTRIBUTE rows. Merge-on-read tombstone sidecars sit
  *     under the right (subtrahend) side of a LeftAnti join: they
  *     subtract rows and keep their real file-size estimates
  *     (delete-volume-bounded — they broadcast on their own). When a
  *     snapshot reads as several data relations (clean-dirs batch scan
  *     unioned with per-dir anti-joins, schema-evolution unions), the
  *     table statistics are APPORTIONED across them by file bytes —
  *     never stamped in full on each, which would multiply the
  *     estimate and mis-plan the very joins this feature exists to
  *     improve. A one-row GDPR delete therefore does not de-CBO a
  *     100 TB table until REORG.
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

  private val Fields = Seq("ndv", "nulls", "min", "max", "hist", "version")

  /** [[CatalogColumnStat]]'s v2 external timestamp format (UTC,
    * 6-digit fraction) — the exact shape the ANALYZE producer renders
    * and the shape validated before attaching a timestamp bound. */
  private val TsExternal = java.time.format.DateTimeFormatter
    .ofPattern("yyyy-MM-dd HH:mm:ss.SSSSSS")

  /** The DATA relations of a snapshot plan: every parquet relation that
    * CONTRIBUTES rows — i.e. not under the right (subtrahend) side of a
    * merge-on-read LeftAnti tombstone join. */
  private def dataRelations(plan: LogicalPlan): Seq[LogicalRelation] = plan match {
    case j: Join if j.joinType == LeftAnti => dataRelations(j.left)
    case lr: LogicalRelation => Seq(lr)
    case other => other.children.flatMap(dataRelations)
  }

  /** `plan` with ANALYZE statistics attached to its data relations, or
    * `plan` unchanged when the table was never analyzed or CBO is off
    * (guards above). `version` pins the SAME snapshot the caller
    * resolved — reading "current" properties independently would race
    * a concurrent commit and attach version-N+1 stats to a version-N
    * plan.
    *
    * A snapshot can read as SEVERAL data relations — clean dirs batch
    * into one scan, each tombstoned dir anti-joins its sidecar, a
    * schema-evolution union keeps per-footer scans — and the recorded
    * rowCount describes their UNION. Stamping each with the full count
    * would multiply the estimate, so the table statistics are
    * APPORTIONED by each relation's file bytes (the only size signal
    * available without a scan): row/null counts scale with the byte
    * share, ndv and min/max attach verbatim (a superset bound is a
    * valid estimate for any subset). The dominant dir gets ~all rows,
    * an empty seed dir ~none — and a one-row GDPR delete no longer
    * de-CBOs a 100 TB table until REORG.
    *
    * Min/max attach for numeric, DATE and TIMESTAMP columns;
    * date/timestamp strings are parse-VALIDATED against the
    * external-string contract first, because a planning-time parse
    * failure inside the optimizer is worse than a missing bound. */
  def withStats(name: String, t: TxLog, version: Long,
                plan: LogicalPlan): LogicalPlan = {
    val conf = org.apache.spark.sql.internal.SQLConf.get
    if (!conf.cboEnabled && !conf.planStatsEnabled) return plan
    val data = dataRelations(plan)
    if (data.isEmpty) return plan
    val props = t.properties(version).toMap
    val rowCount = props.get("graft.stats.numRows")
      .flatMap(s => scala.util.Try(BigInt(s)).toOption)
    if (rowCount.isEmpty) return plan
    val sizeInBytes = props.get("graft.stats.sizeInBytes")
      .flatMap(s => scala.util.Try(BigInt(s)).toOption)
      .filter(_ > 0)
      .getOrElse(rowCount.get.max(1) * 32)
    val bytes = data.map(lr => math.max(lr.relation.sizeInBytes, 1L))
    val totalBytes = BigInt(bytes.sum)
    def share(total: BigInt, i: Int): BigInt = total * bytes(i) / totalBytes
    val byCol: Map[String, Map[String, String]] = props.toSeq.collect {
      case (k, v) if k.startsWith("graft.stats.col.") =>
        val rest = k.stripPrefix("graft.stats.col.")
        Fields.collectFirst {
          case f if rest.endsWith("." + f) =>
            (rest.dropRight(f.length + 1), f -> v)
        }
    }.flatten.groupBy(_._1).map { case (c, kvs) => c -> kvs.map(_._2).toMap }
    // can the optimizer's external-string parser read this bound back?
    // numerics pass through (their cast-to-string rendering is the
    // external form); DATE/TIMESTAMP are parse-validated against the
    // v2 contract (ISO local date; UTC 6-digit-fraction timestamp)
    def bound(dt: DataType, s: Option[String]): Option[String] = dt match {
      case ByteType | ShortType | IntegerType | LongType |
           FloatType | DoubleType | _: DecimalType => s
      case DateType => s.filter(v =>
        scala.util.Try(java.time.LocalDate.parse(v)).isSuccess)
      case TimestampType => s.filter(v =>
        scala.util.Try(java.time.LocalDateTime.parse(v, TsExternal)).isSuccess)
      case _ => None
    }
    // EQUI-HEIGHT histogram for a numeric/DATE/TIMESTAMP column,
    // decoded from the persisted 33-endpoint percentile list: heights
    // scale with the relation's byte share like the row counts do;
    // per-bin ndv is the uniform split except degenerate [v, v] bins,
    // which hold exactly one value. Date/timestamp endpoints are
    // ALREADY in Catalyst's internal units (epoch days / epoch micros
    // — the ANALYZE producer sketches unix_date/unix_micros), which is
    // the axis FilterEstimation/JoinEstimation convert bound literals
    // onto, so they decode exactly like numerics. Validated hard
    // (finite, non-decreasing, 32 bins) — a malformed property yields
    // NO histogram, never a planner error.
    def histOf(dt: DataType, m: Map[String, String],
               i: Int): Option[logical.Histogram] = dt match {
      case ByteType | ShortType | IntegerType | LongType |
           FloatType | DoubleType | _: DecimalType |
           DateType | TimestampType =>
        for {
          s <- m.get("hist")
          ndv <- m.get("ndv").flatMap(x => scala.util.Try(x.toLong).toOption)
          es <- scala.util.Try(s.split(',').map(_.toDouble)).toOption
          if es.length == 33 &&
            es.forall(e => !e.isNaN && !e.isInfinite) &&
            es.lazyZip(es.drop(1)).forall(_ <= _)
          rc <- rowCount
        } yield {
          val nb = es.length - 1
          val nulls = m.get("nulls").flatMap(x =>
            scala.util.Try(BigInt(x)).toOption).getOrElse(BigInt(0))
          val height = share((rc - nulls).max(0), i).toDouble / nb
          val ndvPerBin = math.max(1L, ndv / nb)
          logical.Histogram(height, (0 until nb).map { b =>
            logical.HistogramBin(es(b), es(b + 1),
              if (es(b) == es(b + 1)) 1L else ndvPerBin)
          }.toArray)
        }
      case _ => None
    }
    def colStat(c: String, dt: DataType, i: Int): Option[CatalogColumnStat] =
      byCol.get(c).map { m =>
        CatalogColumnStat(
          distinctCount = m.get("ndv").flatMap(s =>
            scala.util.Try(BigInt(s)).toOption),
          min = bound(dt, m.get("min")),
          max = bound(dt, m.get("max")),
          nullCount = m.get("nulls").flatMap(s =>
            scala.util.Try(BigInt(s)).toOption).map(share(_, i)),
          histogram = histOf(dt, m, i))
      }
    plan.transform {
      case lr: LogicalRelation if data.exists(_ eq lr) =>
        val i = data.indexWhere(_ eq lr)
        val colStats = lr.output.flatMap(a =>
          colStat(a.name, a.dataType, i).map(a.name -> _)).toMap
        val ct = CatalogTable(
          identifier = TableIdentifier(name.split('.').last),
          tableType = CatalogTableType.EXTERNAL,
          storage = CatalogStorageFormat.empty,
          schema = StructType(lr.output.map(a =>
            StructField(a.name, a.dataType, a.nullable))),
          provider = Some("graft"),
          stats = Some(CatalogStatistics(
            share(sizeInBytes, i).max(1), Some(share(rowCount.get, i)), colStats)))
        lr.copy(catalogTable = Some(ct))
    }
  }
}
