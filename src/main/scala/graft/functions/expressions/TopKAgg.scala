package graft.functions.expressions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}

/** Bounded-heap grouped TOP-K as a custom aggregate
  * (`TypedImperativeAggregate`): the buffer is a k-slot binary min-heap
  * of the largest values seen, so per-group state is O(k) REGARDLESS of
  * group size — the sketch-shaped alternative to `row_number().over(
  * Window.partitionBy(g).orderBy(v.desc)) <= k`, which must sort every
  * group's full row set. Partial aggregation pushes the heaps map-side
  * (each partition contributes at most k values per group to the
  * shuffle), and the merge is a k-way heap offer.
  *
  * Deterministic by construction: the result is the top-k MULTISET of a
  * commutative reduction — row order, partitioning, and merge order
  * cannot change it (ties at the boundary keep identical VALUES either
  * way). Output: array<long> sorted descending.
  */
case class TopKAgg(child: Expression, k: Int,
                   mutableAggBufferOffset: Int = 0,
                   inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[TopKAgg.Heap] {

  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "topk_agg"

  // update() reads the child as a Long — anything else must fail at
  // analysis with a readable message, not at execution with a
  // ClassCastException (the function is SQL-registered, so arbitrary
  // column types reach it).
  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    if (child.dataType == LongType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"topk_agg requires a BIGINT value column, got ${child.dataType.sql}")

  override def createAggregationBuffer(): TopKAgg.Heap = new TopKAgg.Heap(k)

  override def update(buf: TopKAgg.Heap, input: InternalRow): TopKAgg.Heap = {
    val v = child.eval(input)
    if (v != null) buf.offer(v.asInstanceOf[Long])
    buf
  }

  override def merge(a: TopKAgg.Heap, b: TopKAgg.Heap): TopKAgg.Heap = {
    var i = 0
    while (i < b.size) { a.offer(b.values(i)); i += 1 }
    a
  }

  override def eval(buf: TopKAgg.Heap): Any =
    new GenericArrayData(buf.sortedDesc)

  override def serialize(buf: TopKAgg.Heap): Array[Byte] = {
    val bb = java.nio.ByteBuffer.allocate(4 + 8 * buf.size)
    bb.putInt(buf.size)
    var i = 0
    while (i < buf.size) { bb.putLong(buf.values(i)); i += 1 }
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): TopKAgg.Heap = {
    val bb = java.nio.ByteBuffer.wrap(bytes)
    val n = bb.getInt
    val h = new TopKAgg.Heap(k)
    var i = 0
    while (i < n) { h.offer(bb.getLong); i += 1 }
    h
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): TopKAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): TopKAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): Expression =
    copy(child = newChildren.head)
}

object TopKAgg {

  /** k-bounded binary MIN-heap over longs: the root is the smallest
    * retained value, so admission is a single root comparison and
    * replacement is O(log k). */
  final class Heap(k: Int) {
    val values = new Array[Long](k)
    var size = 0

    def offer(v: Long): Unit =
      if (size < k) { values(size) = v; size += 1; siftUp(size - 1) }
      else if (v > values(0)) { values(0) = v; siftDown(0) }

    private def siftUp(i0: Int): Unit = {
      var i = i0
      while (i > 0 && values((i - 1) / 2) > values(i)) {
        swap(i, (i - 1) / 2); i = (i - 1) / 2
      }
    }

    private def siftDown(i0: Int): Unit = {
      var i = i0
      var continue = true
      while (continue) {
        val l = 2 * i + 1; val r = 2 * i + 2
        var m = i
        if (l < size && values(l) < values(m)) m = l
        if (r < size && values(r) < values(m)) m = r
        if (m == i) continue = false
        else { swap(i, m); i = m }
      }
    }

    private def swap(i: Int, j: Int): Unit = {
      val t = values(i); values(i) = values(j); values(j) = t
    }

    def sortedDesc: Array[Long] = values.take(size).sorted(Ordering[Long].reverse)
  }

  /** Validated builder for the SQL registries (same contract as
    * [[MinHashAgg.fromExprs]]): arity, foldability, and type of `k`
    * fail at analysis time with a clear message. */
  def fromExprs(exprs: Seq[Expression]): TopKAgg = {
    def fail(msg: String): Nothing =
      throw new org.apache.spark.sql.AnalysisException(
        errorClass = "INTERNAL_ERROR",
        messageParameters = Map("message" -> s"topk_agg: $msg"))
    if (exprs.length != 2)
      fail(s"expects exactly 2 arguments (value, k), got ${exprs.length}")
    if (!exprs(1).foldable)
      fail("k must be a constant integer literal")
    exprs(1).eval(InternalRow.empty) match {
      case i: java.lang.Integer if i > 0 => TopKAgg(exprs.head, i)
      case other => fail(s"k must be a positive INT literal, got $other")
    }
  }

  def register(spark: org.apache.spark.sql.SparkSession): Unit =
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "topk_agg", fromExprs, "scala_udf")

  def topk_agg(spark: org.apache.spark.sql.SparkSession,
               valueCol: org.apache.spark.sql.Column, k: Int): org.apache.spark.sql.Column = {
    register(spark)
    org.apache.spark.sql.functions.call_function("topk_agg", valueCol,
      org.apache.spark.sql.functions.lit(k))
  }
}
