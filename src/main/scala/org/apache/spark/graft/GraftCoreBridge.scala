package org.apache.spark.graft

/** Package-injection bridge into spark-core (same technique as
  * [[org.apache.spark.sql.graft.GraftSqlBridge]]): the listener bus's
  * `waitUntilEmpty` is `private[spark]`, and per-query metric
  * attribution in `graft.Bench` needs exactly that one drain — task
  * events are delivered asynchronously, so without a drain a query's
  * trailing task metrics would be billed to the next query. */
object GraftCoreBridge {
  def drainListenerBus(sc: org.apache.spark.SparkContext): Unit =
    sc.listenerBus.waitUntilEmpty()
}
