package graft.functions.expressions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, GenericInternalRow}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._

/** Bounded-heap grouped TOP-K over (score, id) PAIRS — the ranked
  * retrieval shape: per group keep the k pairs largest under the total
  * order (score DESC, id ASC) and emit them sorted, so
  * `posexplode(...)` reproduces exactly the rows of
  * `row_number().over(Window.partitionBy(g).orderBy(score.desc, id))
  * <= k` WITHOUT the per-group full sort. The window formulation puts
  * each group's ENTIRE candidate set through one task's sort — for a
  * broadcast-queries × corpus-scan top-k (the ANN ground-truth
  * baseline) that is one full corpus sort PER QUERY at scale. Here
  * per-group state is a k-slot binary min-heap (O(k) regardless of
  * group size), partial aggregation pushes heaps map-side so each
  * partition contributes ≤ k pairs per group to the shuffle, and the
  * merge is a k-way heap offer.
  *
  * Deterministic by construction: ids are compared as the tie-break, so
  * the retained multiset under the total order is unique whatever the
  * row order, partitioning, or merge order.
  *
  * Output: array<struct<score:double, id:bigint>> sorted by
  * (score DESC, id ASC).
  */
case class TopKPairAgg(score: Expression, id: Expression, k: Int,
                       mutableAggBufferOffset: Int = 0,
                       inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[TopKPairAgg.PairHeap] {

  override def children: Seq[Expression] = Seq(score, id)
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(
    StructType(Seq(
      StructField("score", DoubleType, nullable = false),
      StructField("id", LongType, nullable = false))),
    containsNull = false)
  override def prettyName: String = "topk_pair_agg"

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    if (score.dataType != DoubleType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"topk_pair_agg requires a DOUBLE score column, got ${score.dataType.sql}")
    else if (id.dataType != LongType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"topk_pair_agg requires a BIGINT id column, got ${id.dataType.sql}")
    else org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess

  override def createAggregationBuffer(): TopKPairAgg.PairHeap =
    new TopKPairAgg.PairHeap(k)

  override def update(buf: TopKPairAgg.PairHeap, input: InternalRow): TopKPairAgg.PairHeap = {
    val s = score.eval(input)
    val i = id.eval(input)
    if (s != null && i != null)
      buf.offer(s.asInstanceOf[Double], i.asInstanceOf[Long])
    buf
  }

  override def merge(a: TopKPairAgg.PairHeap, b: TopKPairAgg.PairHeap): TopKPairAgg.PairHeap = {
    var i = 0
    while (i < b.size) { a.offer(b.scores(i), b.ids(i)); i += 1 }
    a
  }

  override def eval(buf: TopKPairAgg.PairHeap): Any = {
    val (ss, is) = buf.sortedDesc
    val rows = new Array[Any](ss.length)
    var i = 0
    while (i < ss.length) {
      rows(i) = new GenericInternalRow(Array[Any](ss(i), is(i)))
      i += 1
    }
    new GenericArrayData(rows)
  }

  override def serialize(buf: TopKPairAgg.PairHeap): Array[Byte] = {
    val bb = java.nio.ByteBuffer.allocate(4 + 16 * buf.size)
    bb.putInt(buf.size)
    var i = 0
    while (i < buf.size) { bb.putDouble(buf.scores(i)); bb.putLong(buf.ids(i)); i += 1 }
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): TopKPairAgg.PairHeap = {
    val bb = java.nio.ByteBuffer.wrap(bytes)
    val n = bb.getInt
    val h = new TopKPairAgg.PairHeap(k)
    var i = 0
    while (i < n) { val s = bb.getDouble; val id = bb.getLong; h.offer(s, id); i += 1 }
    h
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): TopKPairAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): TopKPairAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): Expression =
    copy(score = newChildren(0), id = newChildren(1))
}

object TopKPairAgg {

  /** k-bounded binary min-heap over (score, id) pairs ordered by
    * (score ASC, id DESC): the ROOT is the weakest retained pair under
    * the ranking order (score DESC, id ASC), so admission is a single
    * root comparison. Parallel primitive arrays — no boxing in the
    * update path. */
  final class PairHeap(k: Int) {
    val scores = new Array[Double](k)
    val ids = new Array[Long](k)
    var size = 0

    /** a is WEAKER than b under the ranking order (lower score, or
      * equal score and higher id). Scores compare under Spark's SQL
      * total order ([[org.apache.spark.sql.catalyst.util.SQLOrderingUtil]]:
      * NaN greatest, -0.0 = 0.0) — raw `<`/`==` would never admit a
      * NaN once the heap fills (and could corrupt heap order while
      * filling), silently diverging from the `row_number().over(
      * orderBy(desc))` window semantics this aggregate replaces, where
      * a NaN cosine (zero-norm embedding) ranks FIRST. */
    private def weaker(sa: Double, ia: Long, sb: Double, ib: Long): Boolean = {
      val c = org.apache.spark.sql.catalyst.util.SQLOrderingUtil.compareDoubles(sa, sb)
      c < 0 || (c == 0 && ia > ib)
    }

    def offer(s: Double, i: Long): Unit =
      if (size < k) { scores(size) = s; ids(size) = i; size += 1; siftUp(size - 1) }
      else if (weaker(scores(0), ids(0), s, i)) {
        scores(0) = s; ids(0) = i; siftDown(0)
      }

    private def siftUp(i0: Int): Unit = {
      var i = i0
      while (i > 0 && weaker(scores(i), ids(i), scores((i - 1) / 2), ids((i - 1) / 2))) {
        swap(i, (i - 1) / 2); i = (i - 1) / 2
      }
    }

    private def siftDown(i0: Int): Unit = {
      var i = i0
      var continue = true
      while (continue) {
        val l = 2 * i + 1; val r = 2 * i + 2
        var m = i
        if (l < size && weaker(scores(l), ids(l), scores(m), ids(m))) m = l
        if (r < size && weaker(scores(r), ids(r), scores(m), ids(m))) m = r
        if (m == i) continue = false
        else { swap(i, m); i = m }
      }
    }

    private def swap(i: Int, j: Int): Unit = {
      val ts = scores(i); scores(i) = scores(j); scores(j) = ts
      val ti = ids(i); ids(i) = ids(j); ids(j) = ti
    }

    /** Pairs sorted by (score DESC, id ASC) — the ranking order, under
      * the same SQL total order as [[weaker]] (NaN first). */
    def sortedDesc: (Array[Double], Array[Long]) = {
      val idx = (0 until size).sortWith { (a, b) =>
        val c = org.apache.spark.sql.catalyst.util.SQLOrderingUtil
          .compareDoubles(scores(a), scores(b))
        c > 0 || (c == 0 && ids(a) < ids(b))
      }
      (idx.map(scores).toArray, idx.map(ids).toArray)
    }
  }

  /** Validated builder for the SQL registry (same contract as
    * [[TopKAgg.fromExprs]]). */
  def fromExprs(exprs: Seq[Expression]): TopKPairAgg = {
    def fail(msg: String): Nothing =
      throw new org.apache.spark.sql.AnalysisException(
        errorClass = "INTERNAL_ERROR",
        messageParameters = Map("message" -> s"topk_pair_agg: $msg"))
    if (exprs.length != 3)
      fail(s"expects exactly 3 arguments (score, id, k), got ${exprs.length}")
    if (!exprs(2).foldable)
      fail("k must be a constant integer literal")
    exprs(2).eval(InternalRow.empty) match {
      case i: java.lang.Integer if i > 0 => TopKPairAgg(exprs(0), exprs(1), i)
      case other => fail(s"k must be a positive INT literal, got $other")
    }
  }

  def register(spark: org.apache.spark.sql.SparkSession): Unit =
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "topk_pair_agg", fromExprs, "scala_udf")

  /** `topk_pair_agg(score, id, k)` — array<struct<score,id>> of the k
    * pairs largest under (score DESC, id ASC). */
  def topk_pair_agg(spark: org.apache.spark.sql.SparkSession,
                    scoreCol: org.apache.spark.sql.Column,
                    idCol: org.apache.spark.sql.Column,
                    k: Int): org.apache.spark.sql.Column = {
    register(spark)
    org.apache.spark.sql.functions.call_function("topk_pair_agg", scoreCol, idCol,
      org.apache.spark.sql.functions.lit(k))
  }
}
