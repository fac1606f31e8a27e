package graft.functions.expressions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Bounded-heap grouped BOTTOM-K over (sortKey, id) with a PER-GROUP
  * VARIABLE bound k: per group keep the k ids smallest under
  * (sortKey ASC, id ASC) — exactly the rows of
  * `row_number().over(Window.partitionBy(g).orderBy(key, id)) <= k`
  * where k is a COLUMN constant within each group (e.g. a per-cluster
  * budget like isqrt(cluster size)).
  *
  * Why this exists: Spark's WindowGroupLimit rewrite — the thing that
  * makes a `row_number <= cap` filter run as a per-partition bounded
  * heap instead of a full per-group sort — applies to CONSTANT limits
  * only. A variable cap (`rn <= k_c`) falls back to WindowExec: every
  * group's entire member list sorts in ONE task, so a selection over
  * nlist=64 clusters runs as 64 single-task linear sorts however many
  * executors exist. This aggregate restores the bounded-heap plan for
  * the variable-cap case: per-group state is a k-slot heap (O(k)
  * regardless of group size), partial aggregation pushes heaps
  * map-side so each input partition contributes ≤ k entries per group
  * to the shuffle, and the merge is a k-way heap offer — the same
  * contract [[TopKPairAgg]] gives constant-k ranked retrieval.
  *
  * Sort keys compare as unsigned bytes — identical to Spark's and
  * DuckDB's binary STRING collation, so a lowercase-hex md5 draw
  * selects the same members as the window/oracle formulation. NULL
  * keys and ids are skipped (they cannot win an ASC draw; the draw
  * keys in this engine are never null). k must be constant within the
  * group — a mixed-k group throws loudly rather than mis-sampling.
  *
  * Output: array<bigint> of the retained ids sorted by (key ASC,
  * id ASC) — `explode(...)` reproduces the window formulation's rows.
  */
case class BottomKIdsAgg(key: Expression, id: Expression, k: Expression,
                         mutableAggBufferOffset: Int = 0,
                         inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[BottomKIdsAgg.BottomHeap] {

  override def children: Seq[Expression] = Seq(key, id, k)
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "bottomk_ids_agg"

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    if (key.dataType != StringType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"bottomk_ids_agg requires a STRING sort key, got ${key.dataType.sql}")
    else if (id.dataType != LongType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"bottomk_ids_agg requires a BIGINT id column, got ${id.dataType.sql}")
    else if (k.dataType != LongType && k.dataType != IntegerType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"bottomk_ids_agg requires a BIGINT/INT per-group bound, got ${k.dataType.sql}")
    else org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess

  override def createAggregationBuffer(): BottomKIdsAgg.BottomHeap =
    new BottomKIdsAgg.BottomHeap

  private def kOf(input: InternalRow): Int = k.eval(input) match {
    case null => throw new IllegalStateException(
      "bottomk_ids_agg: NULL per-group bound k")
    case i: java.lang.Integer => i.intValue()
    case l: java.lang.Long =>
      if (l > Int.MaxValue) throw new IllegalStateException(
        s"bottomk_ids_agg: bound k=$l exceeds Int.MaxValue")
      else l.intValue()
  }

  override def update(buf: BottomKIdsAgg.BottomHeap,
                      input: InternalRow): BottomKIdsAgg.BottomHeap = {
    buf.ensure(kOf(input))
    val kv = key.eval(input)
    val iv = id.eval(input)
    if (kv != null && iv != null) {
      val u = kv.asInstanceOf[UTF8String]
      // copy out of the unsafe-row buffer the UTF8String points into
      buf.offer(java.util.Arrays.copyOfRange(u.getBytes, 0, u.numBytes),
        iv.asInstanceOf[Long])
    }
    buf
  }

  override def merge(a: BottomKIdsAgg.BottomHeap,
                     b: BottomKIdsAgg.BottomHeap): BottomKIdsAgg.BottomHeap =
    if (b.k < 0) a
    else if (a.k < 0) b
    else {
      a.ensure(b.k)
      var i = 0
      while (i < b.size) { a.offer(b.keys(i), b.ids(i)); i += 1 }
      a
    }

  override def eval(buf: BottomKIdsAgg.BottomHeap): Any = {
    val sorted = buf.sortedAscIds
    val arr = new Array[Any](sorted.length)
    var i = 0
    while (i < sorted.length) { arr(i) = sorted(i); i += 1 }
    new GenericArrayData(arr)
  }

  override def serialize(buf: BottomKIdsAgg.BottomHeap): Array[Byte] = {
    var bytes = 8
    var i = 0
    while (i < buf.size) { bytes += 12 + buf.keys(i).length; i += 1 }
    val bb = java.nio.ByteBuffer.allocate(bytes)
    bb.putInt(buf.k)
    bb.putInt(buf.size)
    i = 0
    while (i < buf.size) {
      bb.putInt(buf.keys(i).length); bb.put(buf.keys(i)); bb.putLong(buf.ids(i))
      i += 1
    }
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): BottomKIdsAgg.BottomHeap = {
    val bb = java.nio.ByteBuffer.wrap(bytes)
    val h = new BottomKIdsAgg.BottomHeap
    val kv = bb.getInt
    if (kv >= 0) h.ensure(kv)
    val n = bb.getInt
    var i = 0
    while (i < n) {
      val len = bb.getInt
      val kb = new Array[Byte](len); bb.get(kb)
      h.offer(kb, bb.getLong)
      i += 1
    }
    h
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): BottomKIdsAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): BottomKIdsAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): Expression =
    copy(key = newChildren(0), id = newChildren(1), k = newChildren(2))
}

object BottomKIdsAgg {

  /** k-bounded binary MAX-heap over (key, id) pairs under (key ASC,
    * id ASC): the ROOT is the weakest retained entry — the LARGEST
    * under the draw order — so admission is one root comparison. The
    * bound k arrives from the first row/merge ([[ensure]]) and must
    * stay constant within the group. */
  final class BottomHeap {
    var k: Int = -1
    var keys: Array[Array[Byte]] = _
    var ids: Array[Long] = _
    var size = 0

    def ensure(kv: Int): Unit =
      if (k < 0) {
        if (kv < 0) throw new IllegalStateException(
          s"bottomk_ids_agg: negative bound k=$kv")
        k = kv
        keys = new Array[Array[Byte]](kv)
        ids = new Array[Long](kv)
      } else if (k != kv) throw new IllegalStateException(
        s"bottomk_ids_agg: bound k is not constant within the group ($k vs $kv)")

    /** a is WORSE (greater, i.e. retained more weakly) than b under the
      * draw order (key ASC, id ASC). Keys compare as unsigned bytes —
      * Spark's and DuckDB's binary string collation. */
    private def worse(ka: Array[Byte], ia: Long, kb: Array[Byte], ib: Long): Boolean = {
      val c = java.util.Arrays.compareUnsigned(ka, kb)
      c > 0 || (c == 0 && ia > ib)
    }

    def offer(kb: Array[Byte], i: Long): Unit =
      if (k > 0) {
        if (size < k) { keys(size) = kb; ids(size) = i; size += 1; siftUp(size - 1) }
        else if (worse(keys(0), ids(0), kb, i)) {
          keys(0) = kb; ids(0) = i; siftDown(0)
        }
      }

    private def siftUp(i0: Int): Unit = {
      var i = i0
      while (i > 0 && worse(keys(i), ids(i), keys((i - 1) / 2), ids((i - 1) / 2))) {
        swap(i, (i - 1) / 2); i = (i - 1) / 2
      }
    }

    private def siftDown(i0: Int): Unit = {
      var i = i0
      var continue = true
      while (continue) {
        val l = 2 * i + 1; val r = 2 * i + 2
        var m = i
        if (l < size && worse(keys(l), ids(l), keys(m), ids(m))) m = l
        if (r < size && worse(keys(r), ids(r), keys(m), ids(m))) m = r
        if (m == i) continue = false
        else { swap(i, m); i = m }
      }
    }

    private def swap(i: Int, j: Int): Unit = {
      val tk = keys(i); keys(i) = keys(j); keys(j) = tk
      val ti = ids(i); ids(i) = ids(j); ids(j) = ti
    }

    /** Retained ids sorted by (key ASC, id ASC) — the draw order, so
      * the exploded rows equal the window formulation's. */
    def sortedAscIds: Array[Long] = {
      val idx = (0 until size).sortWith { (a, b) =>
        val c = java.util.Arrays.compareUnsigned(keys(a), keys(b))
        c < 0 || (c == 0 && ids(a) < ids(b))
      }
      idx.map(ids).toArray
    }
  }

  /** Validated builder for the SQL registry. Unlike the constant-k
    * heaps, k is a per-row EXPRESSION (constant within each group),
    * so foldability is deliberately NOT required. */
  def fromExprs(exprs: Seq[Expression]): BottomKIdsAgg = {
    if (exprs.length != 3)
      throw new org.apache.spark.sql.AnalysisException(
        errorClass = "INTERNAL_ERROR",
        messageParameters = Map("message" ->
          s"bottomk_ids_agg: expects exactly 3 arguments (key, id, k), got ${exprs.length}"))
    BottomKIdsAgg(exprs(0), exprs(1), exprs(2))
  }

  def register(spark: org.apache.spark.sql.SparkSession): Unit =
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "bottomk_ids_agg", fromExprs, "scala_udf")

  /** `bottomk_ids_agg(key, id, k)` — array<bigint> of the per-group k
    * ids smallest under (key ASC, id ASC), k constant within a group. */
  def bottomk_ids(spark: org.apache.spark.sql.SparkSession,
                  keyCol: org.apache.spark.sql.Column,
                  idCol: org.apache.spark.sql.Column,
                  kCol: org.apache.spark.sql.Column): org.apache.spark.sql.Column = {
    register(spark)
    org.apache.spark.sql.functions.call_function("bottomk_ids_agg", keyCol, idCol, kCol)
  }
}
