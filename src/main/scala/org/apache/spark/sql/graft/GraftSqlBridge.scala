package org.apache.spark.sql.graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.classic

/** Package-injection bridge: `Dataset.ofRows` is `private[sql]`, and a
  * library registering its own logical plans needs exactly that one
  * constructor. Declaring this object under `org.apache.spark.sql`
  * (the standard extension-library technique) exposes it to the graft
  * operators without touching any other internal API. */
object GraftSqlBridge {
  def ofRows(spark: SparkSession, plan: LogicalPlan): DataFrame =
    classic.Dataset.ofRows(spark.asInstanceOf[classic.SparkSession], plan)
}
