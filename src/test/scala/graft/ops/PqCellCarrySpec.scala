package graft.ops

import graft.SparkTestBase
import org.apache.spark.sql.functions._

/** Equivalence proof for the IVF-PQ cell-carry (r18 verdict item 3):
  * `pqTrainedCodes` over an input carrying a `cell` column must train
  * the IDENTICAL codebooks and emit the IDENTICAL (vec_id, s, cent_id)
  * codes as the cell-less input, with `cell` appearing verbatim on
  * every code row — eliminating the old N-sized codes⟷assignment join
  * in `sim_ivfpq_adc` / `servedIvfPqRoot` without touching what either
  * query computes. Holds because `cell` is functionally dependent on
  * `vec_id` (one coarse cell per vector), so adding it to the encode
  * grouping key leaves the (vec_id, s) groups bit-identical, and
  * training itself runs on a cell-stripped view. */
class PqCellCarrySpec extends SparkTestBase {

  test("cell-carried codes == cell-less codes + the (vec_id → cell) map; codebooks identical") {
    import spark.implicits._
    val rnd = new scala.util.Random(7)
    val vecs = (0L until 120L).map { id =>
      (id, id % 4, Array.fill(64)(rnd.nextFloat() * 2f - 1f))
    }
    val withCell = vecs.toDF("vec_id", "cell", "embedding")
    val bare = withCell.select(col("vec_id"), col("embedding"))

    val (codesBare, booksBare) = VectorQueries.pqTrainedCodes(spark, bare)
    val (codesCell, booksCell) = VectorQueries.pqTrainedCodes(spark, withCell)

    assert(codesCell.columns.toSeq == Seq("vec_id", "cell", "s", "cent_id"))
    def codeSet(d: org.apache.spark.sql.DataFrame) =
      d.select(col("vec_id"), col("s"), col("cent_id")).collect()
        .map(r => (r.getLong(0), r.getInt(1), r.getLong(2))).toSet
    assert(codeSet(codesCell) == codeSet(codesBare))
    // the carried cell is the input's (vec_id → cell) value on every row
    assert(codesCell.filter(col("cell") =!= col("vec_id") % 4).count() == 0)
    def bookSet(d: org.apache.spark.sql.DataFrame) =
      d.collect().map(r => (r.getInt(0), r.getLong(1),
        r.getSeq[Float](2).toVector)).toSet
    assert(bookSet(booksCell) == bookSet(booksBare))
  }
}
