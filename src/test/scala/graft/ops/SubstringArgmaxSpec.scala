package graft.ops

import graft.SparkTestBase
import org.apache.spark.sql.execution.aggregate.SortAggregateExec
import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
import org.apache.spark.sql.functions._

/** Order-preservation proof for `dedup_substring_removal`'s packed
  * argmax (r18 verdict item 4): the struct-max argmax
  * `max(struct(cut_len, -cut_pos, -id_a, cut_pos))` forced a
  * SortAggregate (struct buffers are not mutable-fixed-width); the
  * replacement packs the pick order into one BIGINT —
  * `cut_len·2³¹ + (2³¹−1−cut_pos)` — so plain `max()` hash-aggregates.
  *
  * Two properties gate the rewrite:
  *   1. the pack is ORDER-ISOMORPHIC to (cut_len DESC, cut_pos ASC)
  *      over the valid domain (both fields non-negative, < 2³¹ — token
  *      offsets into a split() array, which Spark Int-indexes);
  *   2. dropping the old third tie-break key (id_a ASC) cannot change
  *      the output, because it only ordered rows whose (cut_len,
  *      cut_pos) already matched — and the query selects nothing else.
  */
class SubstringArgmaxSpec extends SparkTestBase {
  private val posMask = (1L << 31) - 1

  test("scalar pack comparison equals lexicographic (cut_len DESC, cut_pos ASC), boundaries included") {
    def pack(l: Long, p: Long) = (l << 31) + (posMask - p)
    val lens = Seq(12L, 13L, 1000L, 1L << 20, posMask - 1, posMask)
    val poss = Seq(0L, 1L, 2L, 1L << 20, posMask - 1, posMask)
    for (l1 <- lens; p1 <- poss; l2 <- lens; p2 <- poss) {
      if (l1 == l2 && p1 == p2)
        assert(pack(l1, p1) == pack(l2, p2))
      else {
        val lexGreater = if (l1 != l2) l1 > l2 else p1 < p2
        assert((pack(l1, p1) > pack(l2, p2)) == lexGreater,
          s"pack order diverges from lex order at ($l1,$p1) vs ($l2,$p2)")
      }
    }
  }

  test("packed DataFrame argmax equals the struct-max form, id_a ties included") {
    import spark.implicits._
    val rnd = new scala.util.Random(42)
    val rows = (1 to 4000).map { _ =>
      val doc = rnd.nextInt(40).toLong
      val len = 12L + (rnd.nextInt(3) match {
        case 0 => 0L // deliberate ties on the minimum length
        case 1 => rnd.nextInt(5).toLong
        case _ => rnd.nextInt(100000).toLong
      })
      val pos = rnd.nextInt(4) match {
        case 0 => 0L
        case 1 => posMask - rnd.nextInt(3) // extreme valid offsets
        case _ => rnd.nextInt(1000).toLong // dense → (len,pos) ties with distinct id_a
      }
      (doc, len, pos, rnd.nextLong().abs)
    }
    val df = rows.toDF("doc_id", "cut_len", "cut_pos", "id_a")
    val structForm = df.groupBy(col("doc_id"))
      .agg(max(struct(col("cut_len"), (-col("cut_pos")).as("np"),
        (-col("id_a")).as("ni"), col("cut_pos"))).as("m"))
      .select(col("doc_id"), col("m.cut_len").as("cut_len"),
        col("m.cut_pos").as("cut_pos"))
    val packedForm = df.groupBy(col("doc_id"))
      .agg(max(shiftleft(col("cut_len"), 31)
        + (lit(posMask) - col("cut_pos"))).as("m"))
      .select(col("doc_id"), shiftright(col("m"), 31).as("cut_len"),
        (lit(posMask) - col("m").bitwiseAND(lit(posMask))).as("cut_pos"))
    def rowsOf(d: org.apache.spark.sql.DataFrame) =
      d.orderBy("doc_id").collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
    assert(rowsOf(packedForm) == rowsOf(structForm))
  }

  test("dedup_substring_removal plans with NO SortAggregate at sf0.001") {
    val df = graft.SparkEntry.queries("dedup_substring_removal")(spark, sf("0.001"))
    def sortAggs(p: org.apache.spark.sql.execution.SparkPlan): Seq[SortAggregateExec] =
      p.collect {
        case s: SortAggregateExec => Seq(s)
        case a: AdaptiveSparkPlanExec => sortAggs(a.executedPlan)
      }.flatten
    val found = sortAggs(df.queryExecution.sparkPlan)
    assert(found.isEmpty,
      s"expected hash-aggregable argmax, found SortAggregate:\n" +
        found.map(_.treeString.take(500)).mkString("\n"))
    // and the rewritten query still returns the full result set
    assert(df.count() > 0)
  }
}
