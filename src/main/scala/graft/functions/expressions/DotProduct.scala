package graft.functions.expressions

import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, FloatType}

/** Native dot product over numeric arrays — the rewrite target of
  * [[graft.plans.VectorHofRewrite]].
  *
  * Semantics are EXACTLY the higher-order-function form
  * `aggregate(zip_with(a, b, (x, y) => x*y), 0d, _+_)`:
  *   - null if either array is null (BinaryExpression null intercept);
  *   - null if the lengths differ (`zip_with` pads the shorter side
  *     with nulls, the products go null, and the fold absorbs them —
  *     so the HOF result is null, and so is this);
  *   - null if ANY element is null (the null product poisons the fold
  *     the same way). The per-element check is emitted only when the
  *     static array type says `containsNull` — a non-null-typed input
  *     keeps the branch-free loop;
  *   - otherwise one sequential left fold in double precision — the
  *     identical addition order, hence bit-identical results.
  *
  * Unlike [[CosineSimilarity]]/[[L2Squared]] (float-only, min-length),
  * each side may independently be `array<float>` or `array<double>`:
  * the SRP hyperplane projection dots a float embedding against a
  * double literal matrix ([[graft.functions.VectorFunctions.srpBucket]]).
  */
case class DotProduct(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true

  private def elem(t: DataType): Option[DataType] = t match {
    case ArrayType(FloatType, _) => Some(FloatType)
    case ArrayType(DoubleType, _) => Some(DoubleType)
    case _ => None
  }

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    if (elem(left.dataType).isDefined && elem(right.dataType).isDefined)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
      s"dot_product expects array<float|double> inputs, got ${left.dataType} / ${right.dataType}")

  override def prettyName: String = "dot_product"

  private lazy val leftFloat = elem(left.dataType).contains(FloatType)
  private lazy val rightFloat = elem(right.dataType).contains(FloatType)
  private def mayHaveNullElems(t: DataType): Boolean = t match {
    case ArrayType(_, containsNull) => containsNull
    case _ => false
  }
  private lazy val leftNullable = mayHaveNullElems(left.dataType)
  private lazy val rightNullable = mayHaveNullElems(right.dataType)

  override protected def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = x.numElements()
    if (n != y.numElements()) null
    else {
      var acc = 0.0
      var i = 0
      while (i < n) {
        if ((leftNullable && x.isNullAt(i)) || (rightNullable && y.isNullAt(i)))
          return null
        val xi = if (leftFloat) x.getFloat(i).toDouble else x.getDouble(i)
        val yi = if (rightFloat) y.getFloat(i).toDouble else y.getDouble(i)
        acc += xi * yi
        i += 1
      }
      acc
    }
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val acc = ctx.freshName("acc")
      val getX = if (leftFloat) s"(double) $a.getFloat($i)" else s"$a.getDouble($i)"
      val getY = if (rightFloat) s"(double) $b.getFloat($i)" else s"$b.getDouble($i)"
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
         |int $n = $a.numElements();
         |if ($n != $b.numElements()) {
         |  ${ev.isNull} = true;
         |} else {
         |  double $acc = 0.0;
         |  for (int $i = 0; $i < $n; $i++) {
         |    $nullElemCheck
         |    $acc += ($getX) * ($getY);
         |  }
         |  if (!${ev.isNull}) { ${ev.value} = $acc; }
         |}
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}
