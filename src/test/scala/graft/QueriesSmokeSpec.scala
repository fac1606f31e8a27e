package graft

/** Every declared query must run end-to-end on sf0.001 (the driver's t1
  * smoke shape): no analysis errors, no runtime failures. Value
  * correctness is the DuckDB oracle's job (Verify + driver t2). */
class QueriesSmokeSpec extends SparkTestBase {

  test("entry returns rows") {
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
}
