package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** Shared local SparkSession for all suites (one JVM per forked test
  * run; getOrCreate dedups across suites). */
trait SparkTestBase extends AnyFunSuite {
  lazy val spark: SparkSession = SparkTestBase.session
  def sf(s: String): String = s"/root/testdata/sf$s"
  def tmpDir(name: String): String = {
    val d = s"/root/repo/target/tmp/test_$name"
    org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(d))
    d
  }

  /** Scoped session confs: set, run, restore (unset keys restored to
    * unset). The plan-shape pins use this to steer broadcast/CBO
    * selection through the STATISTICS path rather than query hints. */
  def withConf[T](pairs: (String, String)*)(f: => T): T = {
    val saved = pairs.map { case (k, _) => k -> spark.conf.getOption(k) }
    pairs.foreach { case (k, v) => spark.conf.set(k, v) }
    try f finally saved.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None) => spark.conf.unset(k)
    }
  }
}

object SparkTestBase {
  lazy val session: SparkSession = {
    val s = SparkSession.builder()
      .master("local[8]")
      .appName("graft-test")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      // session setup, not per-query mutation: legacy nanos-vintage
      // events.parquet reads as raw long (see Tables.loadEvents)
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      // the engine's own extensions: native functions, as-of planning,
      // HOF rewrite, TxLog SQL DML — the production session shape
      .config("spark.sql.extensions", "graft.GraftExtensions")
      // TypedImperativeAggregate heaps/sketches carry O(k) state per
      // group: the default 128-group fallback to SORT-based
      // aggregation re-introduces exactly the per-group sort the
      // bounded-heap operators exist to avoid (measured 2x on
      // sim_knn_classify at sf1 with 800 query groups)
      .config("spark.sql.objectHashAggregate.sortBased.fallbackThreshold", "65536")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    s
  }
}
