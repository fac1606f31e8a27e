package graft.operators

import graft.SparkTestBase
import org.apache.spark.sql.functions._

class RangeJoinSpec extends SparkTestBase {
  import spark.implicits._

  private lazy val points = Seq.tabulate(500)(i => (i.toLong, i * 0.37))
    .toDF("pid", "v")
  private lazy val intervals = Seq(
    (1L, 0.0, 10.0), (2L, 5.0, 50.0), (3L, 49.9, 50.1),
    (4L, 100.0, 200.0), (5L, 150.0, 151.0))
    .toDF("iid", "lo", "hi")

  test("bucketed range join equals the naive inequality join") {
    val naive = points.join(intervals, $"v" >= $"lo" && $"v" < $"hi")
      .select("pid", "iid")
    val bucketed = RangeJoin.bucketed(points, "v", intervals, "lo", "hi", width = 7.0)
      .select("pid", "iid")
    assert(bucketed.count() === naive.count())
    assert(bucketed.exceptAll(naive).count() === 0)
    assert(naive.exceptAll(bucketed).count() === 0)
  }

  test("interval boundaries: lo inclusive, hi exclusive") {
    val p = Seq((1L, 10.0), (2L, 19.999), (3L, 20.0)).toDF("pid", "v")
    val iv = Seq((1L, 10.0, 20.0)).toDF("iid", "lo", "hi")
    val hit = RangeJoin.bucketed(p, "v", iv, "lo", "hi", width = 4.0)
      .select("pid").collect().map(_.getLong(0)).sorted
    assert(hit === Array(1L, 2L))
  }
}
