package graft.plans

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.logical.{Filter, LocalRelation, LogicalPlan}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.execution.datasources.{HadoopFsRelation, InMemoryFileIndex, LogicalRelation}
import org.apache.spark.sql.types._

/** AUTOMATIC data skipping for SQL reads of registered TxLog tables —
  * the engine's `PrepareDeltaScan` analog, and the piece that turns the
  * manifest's per-dir min/max ranges and Bloom words from explicit APIs
  * (`snapshotPoint`/`snapshotRange`) into something every plain
  * `SELECT … WHERE` gets for free.
  *
  * Mechanism: a registered table's snapshot resolves to parquet scans
  * whose rootPaths sit under the table's `data/` dir. When the
  * optimizer has pushed a Filter down onto such a scan, this rule
  * extracts the simple conjuncts (equality, comparisons, IN over
  * literals), asks the owning [[graft.pipeline.TxLog]] which dirs the
  * committed stats can exclude ([[graft.pipeline.TxLog.skipForScan]]),
  * and swaps the relation's file index for one listing only the
  * surviving dirs — the HadoopFsRelation, its schema, and its output
  * attributes are untouched, so the swap is invisible to everything
  * downstream (Delta's TahoeFileIndex move). A scan every dir of which
  * is excluded becomes the empty LocalRelation.
  *
  * Scope and safety:
  *   - Only scans under a REGISTERED root ([[graft.sql.TxLogSql]])
  *     are candidates — arbitrary parquet reads are never touched.
  *   - Pruning is path-subset-only and conservative: columns without
  *     stats, dirs without range lines, non-literal or unsupported
  *     predicate shapes, and cast mismatches all keep the dir. The
  *     residual Filter ALWAYS stays in the plan, so a wrongly-kept dir
  *     costs I/O, never correctness.
  *   - Strict inequalities widen to inclusive bounds (a dir whose
  *     range touches the bound only at the excluded endpoint is kept —
  *     conservative), and `>`/`<` translate to the same [lo, hi] form.
  *   - Idempotent: a pruned scan re-prunes to itself (`keep` equals
  *     the current path set), so optimizer fixed-point iteration
  *     terminates without re-listing.
  *
  * At 100 TB this is the difference between "the one partition the
  * WHERE names" and "every dir of the table" for ad-hoc SQL — the same
  * structural claim `txlog_point_lookup` proves for the explicit API,
  * now holding for the SQL face (plan-pinned in TxLogSkipScansSpec and
  * oracle-gated by `txlog_sql_auto_skipping`). */
object TxLogSkipScans extends Rule[LogicalPlan] {

  override def apply(plan: LogicalPlan): LogicalPlan = plan transform {
    case f @ Filter(cond, l: LogicalRelation) if !l.isStreaming =>
      l.relation match {
        case h: HadoopFsRelation =>
          owningRoot(h.location.rootPaths.map(_.toString)) match {
            case Some(root) => pruned(f, cond, l, h, root)
            case None => f
          }
        case _ => f
      }
  }

  /** The registered root whose data/ dir contains EVERY scan path —
    * scans mixing tables (never produced by the snapshot reader) are
    * left alone. */
  private def owningRoot(paths: Seq[String]): Option[String] = {
    if (paths.isEmpty) return None
    val norm = paths.map(p => new Path(p).toUri.getPath)
    graft.sql.TxLogSql.registeredRoots.find(r =>
      norm.forall(_.startsWith(new Path(r).toUri.getPath + "/data/")))
  }

  private def pruned(f: Filter, cond: Expression, l: LogicalRelation,
                     h: HadoopFsRelation, root: String): LogicalPlan = {
    val (bounds, points, ins) = PredicateBounds.extract(cond)
    if (bounds.isEmpty && points.isEmpty && ins.isEmpty) return f
    val session = h.sparkSession
    val t = graft.pipeline.TxLog(session, root)
    val paths = h.location.rootPaths.map(_.toString)
    val keep = t.skipForScan(paths, bounds, points, ins)
    if (keep.length == paths.length) f
    // fully pruned → empty relation. Its output must carry the scan's
    // METADATA attributes too: a plan projecting `_metadata.file_path`
    // above this Filter holds a reference already resolved against
    // l.metadataOutput's exprIds, and LocalRelation(l.output) alone
    // would leave it dangling (unresolvable at execution).
    else if (keep.isEmpty)
      LocalRelation(l.output ++ l.metadataOutput, Nil, isStreaming = false)
    else {
      val idx = new InMemoryFileIndex(session, keep.map(new Path(_)),
        Map.empty[String, String], Some(h.dataSchema))
      Filter(cond, l.copy(relation = h.copy(location = idx)(session)))
    }
  }
}
