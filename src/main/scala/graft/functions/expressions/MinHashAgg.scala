package graft.functions.expressions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}

/** One-pass MinHash signature as a custom aggregate
  * (`TypedImperativeAggregate`): the buffer is the k-slot running-min
  * array; each input shingle hash updates all k permutation minima via
  * cheap splitmix64 re-hashes. Compared with the k-separate-`min`
  * formulation ([[graft.dedup.MinHashLSH.signatures]]), the partial
  * aggregation carries ONE buffer per group instead of k aggregate
  * states, and the merge is an elementwise min — the natural sketch
  * shape (same pattern as HLL/quantile sketches).
  *
  * Input: one long per row (the shingle's 64-bit hash). Output:
  * array<long> of k permutation minima. Deterministic: permutation p of
  * hash h is splitmix64(h + GOLDEN·(p+1)) — order-independent (min is
  * commutative), so signatures are stable under any row order or
  * partitioning.
  */
case class MinHashAgg(child: Expression, k: Int,
                      mutableAggBufferOffset: Int = 0,
                      inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[Array[Long]] {

  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "minhash_agg"

  override def createAggregationBuffer(): Array[Long] =
    Array.fill(k)(Long.MaxValue)

  @inline private def splitmix64(x0: Long): Long = {
    var z = x0 + 0x9e3779b97f4a7c15L
    z = (z ^ (z >>> 30)) * 0xbf58476d1ce4e5b9L
    z = (z ^ (z >>> 27)) * 0x94d049bb133111ebL
    z ^ (z >>> 31)
  }

  override def update(buf: Array[Long], input: InternalRow): Array[Long] = {
    val v = child.eval(input)
    if (v != null) {
      val h = v.asInstanceOf[Long]
      var p = 0
      while (p < k) {
        val hp = splitmix64(h + 0x9e3779b97f4a7c15L * (p + 1))
        if (hp < buf(p)) buf(p) = hp
        p += 1
      }
    }
    buf
  }

  override def merge(a: Array[Long], b: Array[Long]): Array[Long] = {
    var p = 0
    while (p < k) { if (b(p) < a(p)) a(p) = b(p); p += 1 }
    a
  }

  override def eval(buf: Array[Long]): Any = new GenericArrayData(buf)

  override def serialize(buf: Array[Long]): Array[Byte] = {
    val bb = java.nio.ByteBuffer.allocate(8 * k)
    buf.foreach(bb.putLong)
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): Array[Long] = {
    val bb = java.nio.ByteBuffer.wrap(bytes)
    Array.fill(k)(bb.getLong)
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): MinHashAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): MinHashAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): Expression =
    copy(child = newChildren.head)
}

object MinHashAgg {
  /** Validated builder for the SQL registries: arity, foldability, and
    * type of `k` are checked up front so a misuse like `minhash_agg(h)`
    * or `minhash_agg(h, k_col)` is a clear analysis-time error, not an
    * IndexOutOfBounds/ClassCastException from deep in planning. */
  def fromExprs(exprs: Seq[Expression]): MinHashAgg = {
    def fail(msg: String): Nothing =
      throw new org.apache.spark.sql.AnalysisException(
        errorClass = "INTERNAL_ERROR",
        messageParameters = Map("message" -> s"minhash_agg: $msg"))
    if (exprs.length != 2)
      fail(s"expects exactly 2 arguments (hash, k), got ${exprs.length}")
    if (!exprs(1).foldable)
      fail("k must be a constant integer literal")
    exprs(1).eval(InternalRow.empty) match {
      case i: java.lang.Integer if i > 0 => MinHashAgg(exprs.head, i)
      case other => fail(s"k must be a positive INT literal, got $other")
    }
  }

  /** Register `minhash_agg(hash, k)` for SQL + call_function use. */
  def register(spark: org.apache.spark.sql.SparkSession): Unit =
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "minhash_agg", fromExprs, "scala_udf")

  def minhash_agg(spark: org.apache.spark.sql.SparkSession,
                  hashCol: org.apache.spark.sql.Column, k: Int): org.apache.spark.sql.Column = {
    register(spark)
    org.apache.spark.sql.functions.call_function("minhash_agg", hashCol,
      org.apache.spark.sql.functions.lit(k))
  }
}
