package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.aggregate.BaseAggregateExec
import org.apache.spark.sql.execution.window.WindowExec
import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec

/** Shared plan-shape assertions — the WindowExec tripwire.
  *
  * A partition-less `WindowExec` funnels its whole input through ONE
  * task; the engine's sanctioned uses all sit over AGGREGATED children
  * (broadcast-offset frames of `numParts` rows, distinct-brand frames —
  * metadata cardinality, not data cardinality). Any global window whose
  * subtree contains no aggregate is reading raw-table cardinality and
  * is exactly the 100× scale regression the r3 verdict flagged.
  */
object PlanChecks {

  private def physical(df: DataFrame) = df.queryExecution.sparkPlan

  /** All partition-less WindowExec nodes in the physical plan. */
  def globalWindows(df: DataFrame): Seq[WindowExec] =
    physical(df).collect {
      case w: WindowExec if w.partitionSpec.isEmpty => w
      case a: AdaptiveSparkPlanExec => a.executedPlan.collect {
        case w: WindowExec if w.partitionSpec.isEmpty => w
      }
    }.flatMap {
      case w: WindowExec => Seq(w)
      case ws: Seq[_] => ws.collect { case w: WindowExec => w }
    }

  /** Asserts every partition-less window sits over an aggregated
    * (metadata-cardinality) subtree. Returns the number checked so
    * callers can also assert coverage. */
  def assertGlobalWindowsAreMetadataOnly(name: String, df: DataFrame): Int = {
    val wins = globalWindows(df)
    wins.foreach { w =>
      val overAggregate = w.child.exists {
        case _: BaseAggregateExec => true
        case _ => false
      }
      assert(overAggregate,
        s"$name: partition-less WindowExec over a NON-aggregated child — " +
          s"this moves full-cardinality data to a single task:\n${w.treeString.take(2000)}")
    }
    wins.length
  }
}
