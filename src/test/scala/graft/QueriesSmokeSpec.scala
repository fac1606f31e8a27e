package graft

/** Every declared query must run end-to-end on sf0.001 (the driver's t1
  * smoke shape): no analysis errors, no runtime failures. Value
  * correctness is the DuckDB oracle's job (Verify + driver t2). */
class QueriesSmokeSpec extends SparkTestBase
    with org.scalatest.BeforeAndAfterAll {

  // Captures WindowExec's "No Partition Defined" WARN for the duration
  // of this suite: every sanctioned single-partition window goes
  // through GlobalRank.metaWindow (non-empty partitionSpec → no
  // warning), so ANY occurrence during the full query sweep is an
  // accidental global window — the last test asserts the count is 0.
  private val windowWarns = new java.util.concurrent.atomic.AtomicInteger(0)
  private val warnAppender = {
    val a = new org.apache.logging.log4j.core.appender.AbstractAppender(
      "graft-windowexec-warn-capture", null, null, false,
      org.apache.logging.log4j.core.config.Property.EMPTY_ARRAY) {
      override def append(e: org.apache.logging.log4j.core.LogEvent): Unit =
        if (e.getLevel == org.apache.logging.log4j.Level.WARN &&
          e.getMessage.getFormattedMessage.contains("No Partition Defined"))
          windowWarns.incrementAndGet()
    }
    a.start()
    org.apache.logging.log4j.LogManager
      .getLogger("org.apache.spark.sql.execution.window.WindowExec")
      .asInstanceOf[org.apache.logging.log4j.core.Logger].addAppender(a)
    a
  }

  test("entry returns rows") {
    assert(warnAppender.isStarted) // force appender init before any query
    assert(SparkEntry.entry(spark).count() > 0)
  }

  test("every query has a unique name and oracle keys ⊆ query keys") {
    val names = SparkEntry.packs.map(_.name)
    assert(names.distinct.size === names.size)
    assert(SparkEntry.oracleSql.keySet.subsetOf(SparkEntry.queries.keySet))
  }

  SparkEntry.packs.foreach { q =>
    test(s"query ${q.name} executes on sf0.001") {
      val df = q.run(spark, sf("0.001"))
      assert(df.count() >= 0)
      // WindowExec tripwire: any partition-less window in a declared
      // query must sit over aggregated (metadata-cardinality) input —
      // a full-corpus frame under a global window is the single-task
      // scale regression the r3 verdict flagged, and it must not be
      // able to reappear silently.
      PlanChecks.assertGlobalWindowsAreMetadataOnly(q.name, df)
    }
  }

  test("the full query sweep logged ZERO WindowExec global-window warnings") {
    assert(windowWarns.get() === 0,
      s"${windowWarns.get()} partition-less WindowExec executions during the " +
        "sweep — route metadata-frame windows through GlobalRank.metaWindow")
  }

  // Detach in afterAll, not inside the final test, so a mid-suite abort
  // cannot leak the appender onto the global logger. NOTE: the capture
  // assumes suites run sequentially in one JVM (true under Test/fork
  // with parallel execution off) — enabling testForkedParallel would
  // let other suites' windows poison the counter.
  override def afterAll(): Unit = {
    org.apache.logging.log4j.LogManager
      .getLogger("org.apache.spark.sql.execution.window.WindowExec")
      .asInstanceOf[org.apache.logging.log4j.core.Logger]
      .removeAppender(warnAppender)
    warnAppender.stop()
    super.afterAll()
  }
}
