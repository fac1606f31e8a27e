package graft.plans

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Ascending, Attribute, GenericInternalRow, JoinedRow, SortOrder, UnsafeProjection}
import org.apache.spark.sql.catalyst.plans.logical.{BinaryNode, LogicalPlan}
import org.apache.spark.sql.catalyst.plans.physical.{ClusteredDistribution, Distribution}
import org.apache.spark.sql.execution.{BinaryExecNode, SparkPlan, SparkStrategy}
import org.apache.spark.sql.types.{LongType, TimestampType}

/** Native as-of join — the engine's demonstration of the FULL custom-
  * operator extension path (SURVEY §7.3 preference (c)): a logical
  * plan node, a planner strategy, and a physical merge operator, used
  * when composition (the union+window [[graft.operators.AsOfJoin]])
  * isn't wanted.
  *
  * Physical algorithm: both children are hash-clustered on the keys
  * and sorted by (keys, ts); one forward merge pass per partition then
  * attaches, to each left row, the LAST right row with
  * `right.ts <= left.ts` in its key group — O(|L|+|R|) per partition,
  * no window state, no union materialization, same `>=` (inclusive)
  * tie semantics as DuckDB's `ASOF JOIN ... ON l.ts >= r.ts`.
  */
case class AsOfJoinPlan(left: LogicalPlan, right: LogicalPlan,
                        keys: Seq[String], leftTs: String, rightTs: String)
    extends BinaryNode {

  def rightPayload: Seq[Attribute] =
    right.output.filterNot(a => keys.contains(a.name) || a.name == rightTs)

  override def output: Seq[Attribute] =
    left.output ++ rightPayload.map(_.withNullability(true))

  // the join consumes the key/ts columns even though they are not in
  // `output` — declared here so column pruning cannot strip them from
  // the right child (payload-only output would otherwise prune them)
  override def references: org.apache.spark.sql.catalyst.expressions.AttributeSet =
    org.apache.spark.sql.catalyst.expressions.AttributeSet(
      (left.output ++ right.output).filter(a =>
        keys.contains(a.name) || a.name == leftTs || a.name == rightTs))

  override protected def withNewChildrenInternal(
      newLeft: LogicalPlan, newRight: LogicalPlan): LogicalPlan =
    copy(left = newLeft, right = newRight)
}

/** Planner rule: [[AsOfJoinPlan]] → [[AsOfJoinExec]]. Registered at
  * runtime via `spark.experimental.extraStrategies` (or statically via
  * [[graft.GraftExtensions]]). */
object AsOfJoinStrategy extends SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case p: AsOfJoinPlan =>
      AsOfJoinExec(planLater(p.left), planLater(p.right),
        p.keys, p.leftTs, p.rightTs) :: Nil
    case _ => Nil
  }
}

case class AsOfJoinExec(left: SparkPlan, right: SparkPlan,
                        keys: Seq[String], leftTs: String, rightTs: String)
    extends BinaryExecNode {

  private def attr(side: SparkPlan, name: String): Attribute =
    side.output.find(_.name == name).getOrElse(
      throw new IllegalArgumentException(
        s"as-of join: column $name missing from ${side.output.map(_.name)}"))

  private def leftKeyAttrs = keys.map(attr(left, _))
  private def rightKeyAttrs = keys.map(attr(right, _))
  private def leftTsAttr = attr(left, leftTs)
  private def rightTsAttr = attr(right, rightTs)
  private def payloadAttrs =
    right.output.filterNot(a => keys.contains(a.name) || a.name == rightTs)

  override def output: Seq[Attribute] =
    left.output ++ payloadAttrs.map(_.withNullability(true))

  // hash-cluster both sides on the keys (EnsureRequirements aligns the
  // two children to compatible partitionings, as for sort-merge join)
  override def requiredChildDistribution: Seq[Distribution] =
    Seq(ClusteredDistribution(leftKeyAttrs), ClusteredDistribution(rightKeyAttrs))

  // sort within partitions by (keys..., ts) so one forward pass works
  override def requiredChildOrdering: Seq[Seq[SortOrder]] = Seq(
    (leftKeyAttrs :+ leftTsAttr).map(SortOrder(_, Ascending)),
    (rightKeyAttrs :+ rightTsAttr).map(SortOrder(_, Ascending)))

  override def outputOrdering: Seq[SortOrder] =
    (leftKeyAttrs :+ leftTsAttr).map(SortOrder(_, Ascending))

  private def tsOrdinal(side: SparkPlan, a: Attribute): Int = {
    require(a.dataType == LongType || a.dataType == TimestampType,
      s"as-of ts column must be long/timestamp, got ${a.dataType}")
    side.output.indexWhere(_.exprId == a.exprId)
  }

  override protected def doExecute(): RDD[InternalRow] = {
    val lKeyExprs = leftKeyAttrs
    val rKeyExprs = rightKeyAttrs
    val lOut = left.output
    val rOut = right.output
    val pAttrs = payloadAttrs
    val lTsOrd = tsOrdinal(left, leftTsAttr)
    val rTsOrd = tsOrdinal(right, rightTsAttr)
    val keyTypes = lKeyExprs.map(_.dataType)

    left.execute().zipPartitions(right.execute()) { (lIter, rIter) =>
      val lKeyProj = UnsafeProjection.create(lKeyExprs, lOut)
      val rKeyProj = UnsafeProjection.create(rKeyExprs, rOut)
      val payloadProj = UnsafeProjection.create(pAttrs, rOut)
      val keyOrd: Ordering[InternalRow] =
        org.apache.spark.sql.catalyst.expressions.RowOrdering
          .createNaturalAscendingOrdering(keyTypes)
      val nullPayload = new GenericInternalRow(pAttrs.size)
      val joined = new JoinedRow
      val rBuf = rIter.buffered

      new Iterator[InternalRow] {
        // last right row (copied) whose ts <= current left ts, + its key
        private var matched: InternalRow = _
        private var matchedKey: InternalRow = _

        override def hasNext: Boolean = lIter.hasNext

        override def next(): InternalRow = {
          val lRow = lIter.next()
          val lKey = lKeyProj(lRow)
          val lTs = lRow.getLong(lTsOrd)
          // a remembered match from a previous key group is stale
          if (matchedKey != null && keyOrd.compare(matchedKey, lKey) != 0) {
            matched = null; matchedKey = null
          }
          // advance the right side: skip smaller key groups entirely,
          // absorb same-key rows with ts <= left ts (the LAST one wins
          // — rows arrive ts-ascending)
          var advancing = true
          while (advancing && rBuf.hasNext) {
            val rKey = rKeyProj(rBuf.head)
            val c = keyOrd.compare(rKey, lKey)
            if (c < 0) rBuf.next()
            else if (c == 0 && rBuf.head.getLong(rTsOrd) <= lTs) {
              matched = rBuf.next().copy()
              matchedKey = lKey.copy()
            } else advancing = false
          }
          if (matched != null) joined(lRow, payloadProj(matched))
          else joined(lRow, nullPayload)
        }
      }
    }
  }

  override protected def withNewChildrenInternal(
      newLeft: SparkPlan, newRight: SparkPlan): SparkPlan =
    copy(left = newLeft, right = newRight)
}

object NativeAsOfJoin {

  /** Column-API entry: registers the strategy on the session (idempotent)
    * and plans the custom node over the two analyzed children. Semantics
    * and contract identical to [[graft.operators.AsOfJoin.asofLeft]]
    * (right side unique per (keys, ts)). */
  def asofLeft(left: DataFrame, right: DataFrame, keys: Seq[String],
               leftTs: String, rightTs: String): DataFrame = {
    val spark = left.sparkSession
    if (!spark.experimental.extraStrategies.contains(AsOfJoinStrategy))
      spark.experimental.extraStrategies =
        spark.experimental.extraStrategies :+ AsOfJoinStrategy
    org.apache.spark.sql.graft.GraftSqlBridge.ofRows(spark,
      AsOfJoinPlan(left.queryExecution.analyzed, right.queryExecution.analyzed,
        keys, leftTs, rightTs))
  }
}
