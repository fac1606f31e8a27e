package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Evidence harness for the corpus-scaled SRP sizing
  * ([[ops.VectorQueries.srpBits]]): per sf dir, print the corpus
  * size, the derived plane count, per-bucket occupancy stats, and the
  * within-bucket UNORDERED PAIR count (Σ c·(c−1)/2 — the cosine
  * evaluations the bucketed family performs) — under both the scaled
  * bits and the old fixed 8 planes, so the linear-vs-quadratic
  * candidate-volume claim is a measured table, not an argument.
  *
  * Usage: runMain graft.SrpOccupancy [dir ...]
  */
object SrpOccupancy {
  def main(args: Array[String]): Unit = {
    val dirs = if (args.nonEmpty) args.toSeq
      else Seq("/root/testdata/sf0.1", "/root/repo/target/sf1",
        "/root/repo/target/sf3")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    graft.plans.VectorHofRewrite.install(spark)

    println("| dir | n | bits | buckets used | mean occ | max occ | pairs (scaled) | pairs (fixed 8) |")
    for (dir <- dirs) {
      val e = ops.Tables.load(spark, dir, "embeddings")
      val n = e.count()
      val bits = ops.VectorQueries.srpBits(n)
      def pairStats(b: Int) = {
        val occ = e.select(graft.functions.VectorFunctions
            .srpBucket(col("embedding"), b).as("bucket"))
          .groupBy(col("bucket")).agg(count(lit(1)).as("c"))
        occ.agg(count(lit(1)), avg(col("c")), max(col("c")),
            sum(expr("c * (c - 1) div 2")))
          .head()
      }
      val s = pairStats(bits)
      val f8 = pairStats(8)
      println(f"| $dir | $n | $bits | ${s.getLong(0)} | ${s.getDouble(1)}%.1f " +
        f"| ${s.getLong(2)} | ${s.getLong(3)} | ${f8.getLong(3)} |")
    }
    spark.stop()
  }
}
