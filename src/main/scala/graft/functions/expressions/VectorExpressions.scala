package graft.functions.expressions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, FloatType}

/** Native Catalyst expressions for the embedding hot path.
  *
  * This is the one place in the engine where a custom `Expression` is
  * genuinely warranted (SURVEY §7.3): the higher-order-function cosine
  * (`zip_with` + `aggregate`) materializes an intermediate array per
  * pair, which an ANN join evaluates millions of times. The native form
  * is a single allocation-free loop over both `ArrayData`, with
  * `doGenCode` keeping it inside whole-stage codegen.
  *
  * Semantics are BIT-IDENTICAL to the HOF form (and the DuckDB oracle):
  * each accumulator (dot, ‖a‖², ‖b‖²) is an independent sequential
  * left fold in double precision; interleaving them in one loop does
  * not change any accumulator's addition order.
  */
case class CosineSimilarity(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = DoubleType
  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    // BOTH children must be array<float>: getFloat on a double-backed
    // ArrayData would silently read the wrong bytes, not throw.
    def ok(t: DataType): Boolean = t match {
      case ArrayType(FloatType, _) => true
      case _ => false
    }
    if (ok(left.dataType) && ok(right.dataType))
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
      s"cosine_sim expects array<float> inputs, got ${left.dataType} / ${right.dataType}")
  }
  override def prettyName: String = "cosine_sim"

  override protected def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = math.min(x.numElements(), y.numElements())
    var dot = 0.0; var na = 0.0; var nb = 0.0
    var i = 0
    while (i < n) {
      val xi = x.getFloat(i).toDouble
      val yi = y.getFloat(i).toDouble
      dot += xi * yi; na += xi * xi; nb += yi * yi
      i += 1
    }
    dot / (math.sqrt(na) * math.sqrt(nb))
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val dot = ctx.freshName("dot")
      val na = ctx.freshName("na")
      val nb = ctx.freshName("nb")
      val xi = ctx.freshName("xi")
      val yi = ctx.freshName("yi")
      s"""
         |int $n = java.lang.Math.min($a.numElements(), $b.numElements());
         |double $dot = 0.0; double $na = 0.0; double $nb = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  double $xi = (double) $a.getFloat($i);
         |  double $yi = (double) $b.getFloat($i);
         |  $dot += $xi * $yi; $na += $xi * $xi; $nb += $yi * $yi;
         |}
         |${ev.value} = $dot / (java.lang.Math.sqrt($na) * java.lang.Math.sqrt($nb));
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

/** Squared L2 distance — the PQ/ADC hot path's metric. Same contract
  * as [[CosineSimilarity]]: allocation-free loop, whole-stage codegen,
  * bit-identical to the HOF form (one sequential fold of (x−y)²) and
  * to the DuckDB oracle's `list_sum(list_transform(list_zip(...)))`.
  *
  * Null elements poison the HOF fold to null, so they do here too; the
  * per-element check is emitted only when the static array type says
  * `containsNull`, keeping the branch-free loop for non-null-typed
  * inputs. */
case class L2Squared(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true
  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    def ok(t: DataType): Boolean = t match {
      case ArrayType(FloatType, _) => true
      case _ => false
    }
    if (ok(left.dataType) && ok(right.dataType))
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
      s"l2_sq expects array<float> inputs, got ${left.dataType} / ${right.dataType}")
  }
  override def prettyName: String = "l2_sq"

  private def mayHaveNullElems(t: DataType): Boolean = t match {
    case ArrayType(_, containsNull) => containsNull
    case _ => false
  }
  private lazy val leftNullable = mayHaveNullElems(left.dataType)
  private lazy val rightNullable = mayHaveNullElems(right.dataType)

  override protected def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = math.min(x.numElements(), y.numElements())
    var acc = 0.0
    var i = 0
    while (i < n) {
      if ((leftNullable && x.isNullAt(i)) || (rightNullable && y.isNullAt(i)))
        return null
      val d = x.getFloat(i).toDouble - y.getFloat(i).toDouble
      acc += d * d
      i += 1
    }
    acc
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val acc = ctx.freshName("acc")
      val d = ctx.freshName("d")
      val nullElemCheck = (leftNullable, rightNullable) match {
        case (true, true) =>
          s"if ($a.isNullAt($i) || $b.isNullAt($i)) { ${ev.isNull} = true; break; }"
        case (true, false) =>
          s"if ($a.isNullAt($i)) { ${ev.isNull} = true; break; }"
        case (false, true) =>
          s"if ($b.isNullAt($i)) { ${ev.isNull} = true; break; }"
        case (false, false) => ""
      }
      s"""
         |int $n = java.lang.Math.min($a.numElements(), $b.numElements());
         |double $acc = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  $nullElemCheck
         |  double $d = (double) $a.getFloat($i) - (double) $b.getFloat($i);
         |  $acc += $d * $d;
         |}
         |if (!${ev.isNull}) { ${ev.value} = $acc; }
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

object VectorExpressions {

  /** Register in the session's function registry (idempotent); the
    * public `call_function` route then builds Columns over the native
    * expression — Spark 4 keeps Expression→Column constructors
    * private[sql]. */
  def register(spark: org.apache.spark.sql.SparkSession): Unit =
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "cosine_sim", exprs => {
        if (exprs.length != 2)
          throw new org.apache.spark.sql.AnalysisException(
            errorClass = "INTERNAL_ERROR",
            messageParameters =
              Map("message" -> s"cosine_sim expects 2 arguments, got ${exprs.length}"))
        CosineSimilarity(exprs.head, exprs(1))
      }, "scala_udf")

  /** Column API for the native cosine (session must be registered —
    * [[register]] is cheap and idempotent, call it per query). */
  def cosine_sim(spark: org.apache.spark.sql.SparkSession,
                 a: Column, b: Column): Column = {
    register(spark)
    org.apache.spark.sql.functions.call_function("cosine_sim", a, b)
  }

  def registerL2(spark: org.apache.spark.sql.SparkSession): Unit =
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "l2_sq", exprs => {
        if (exprs.length != 2)
          throw new org.apache.spark.sql.AnalysisException(
            errorClass = "INTERNAL_ERROR",
            messageParameters =
              Map("message" -> s"l2_sq expects 2 arguments, got ${exprs.length}"))
        L2Squared(exprs.head, exprs(1))
      }, "scala_udf")

  /** Column API for the native squared-L2 distance. */
  def l2_sq(spark: org.apache.spark.sql.SparkSession,
            a: Column, b: Column): Column = {
    registerL2(spark)
    org.apache.spark.sql.functions.call_function("l2_sq", a, b)
  }
}
