package graft.plans

import graft.functions.expressions.{DotProduct, L2Squared}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.{ArrayType, DoubleType, FloatType}

/** Optimizer rule: rewrite the declarative higher-order-function vector
  * idioms ([[graft.functions.VectorFunctions]]) into the engine's
  * native codegen'd expressions.
  *
  * A user writes the natural Spark form —
  * `aggregate(zip_with(a, b, (x, y) => x * y), 0d, _ + _)` — and the
  * engine recognizes it the way Catalyst recognizes its own algebra:
  *
  *   - HOF dot product                  → [[DotProduct]] (each side
  *     `array<float>` or `array<double>`; semantics identical incl.
  *     null-on-ragged and null-on-null-element — a null slot poisons
  *     the HOF fold to null, and the natives emit the matching
  *     `isNullAt` check whenever the static type says `containsNull` —
  *     see the expression's scaladoc)
  *   - HOF squared-L2 (`(x-y)*(x-y)` fold) → [[L2Squared]] behind an
  *     equal-length guard (the native min-length loop is only
  *     HOF-equal when lengths match; the guard If returns null exactly
  *     where the HOF form does)
  *
  * The composed cosine (`dot / (sqrt·sqrt)`) is deliberately NOT fused
  * into [[CosineSimilarity]]: the surrounding `Divide` node carries
  * mode-dependent zero-divisor semantics (ANSI error / legacy null)
  * that the native's Java division (NaN) would silently change. Its
  * three inner folds still rewrite to [[DotProduct]] loops, which is
  * where the per-element lambda-interpreter cost lives; the fused
  * single-pass form stays available explicitly as `cosine_sim`.
  *
  * Why it matters at scale: the HOF form materializes an intermediate
  * array per pair and folds it element-by-element through Catalyst's
  * lambda interpreter; an ANN join evaluates that millions of times
  * per task. The natives are single allocation-free loops inside
  * whole-stage codegen — same bits, ~an order of magnitude less work —
  * and the rewrite makes the FAST path the DEFAULT path for anyone
  * using the engine's public Column API (or writing the idiom by
  * hand). Registered statically via [[graft.GraftExtensions]]
  * (`injectOptimizerRule`) and lazily per session via [[install]].
  */
object VectorHofRewrite extends Rule[LogicalPlan] {

  /** Idempotently append to the session's experimental optimizations
    * (the same lazy-injection pattern as [[NativeAsOfJoin]]'s
    * strategy). */
  def install(spark: SparkSession): Unit =
    if (!spark.experimental.extraOptimizations.contains(VectorHofRewrite))
      spark.experimental.extraOptimizations =
        spark.experimental.extraOptimizations :+ VectorHofRewrite

  private def stripCast(e: Expression): Expression = e match {
    case Cast(c, DoubleType, _, _) => c
    case _ => e
  }

  private def isVar(e: Expression, v: NamedLambdaVariable): Boolean =
    stripCast(e) match {
      case n: NamedLambdaVariable => n.exprId == v.exprId
      case _ => false
    }

  private def numericArray(e: Expression): Boolean = e.dataType match {
    case ArrayType(FloatType, _) | ArrayType(DoubleType, _) => true
    case _ => false
  }

  private def floatArray(e: Expression): Boolean = e.dataType match {
    case ArrayType(FloatType, _) => true
    case _ => false
  }

  /** `aggregate(zip_with(l, r, (x, y) => x * y), 0.0, _ + _)` with
    * optional float→double casts inside the lambda and an identity
    * finish (what the 3-arg `aggregate` builder emits). */
  private object HofDot {
    def unapply(e: Expression): Option[(Expression, Expression)] = e match {
      case ArrayAggregate(
            ZipWith(l, r,
              LambdaFunction(Multiply(mx, my, _),
                Seq(lx: NamedLambdaVariable, ly: NamedLambdaVariable), _)),
            Literal(0.0, DoubleType),
            LambdaFunction(Add(ax, ay, _),
              Seq(acc: NamedLambdaVariable, x: NamedLambdaVariable), _),
            LambdaFunction(fin: NamedLambdaVariable, Seq(fv: NamedLambdaVariable), _))
          if isVar(mx, lx) && isVar(my, ly) &&
            isVar(ax, acc) && isVar(ay, x) &&
            fin.exprId == fv.exprId &&
            numericArray(l) && numericArray(r) =>
        Some((l, r))
      case _ => None
    }
  }

  /** Same shape with a `(x - y) * (x - y)` lambda body (both factors
    * the same subtraction — the `val d = ...; d * d` builder). */
  private object HofL2 {
    def unapply(e: Expression): Option[(Expression, Expression)] = e match {
      case ArrayAggregate(
            ZipWith(l, r,
              LambdaFunction(Multiply(Subtract(s1x, s1y, _), Subtract(s2x, s2y, _), _),
                Seq(lx: NamedLambdaVariable, ly: NamedLambdaVariable), _)),
            Literal(0.0, DoubleType),
            LambdaFunction(Add(ax, ay, _),
              Seq(acc: NamedLambdaVariable, x: NamedLambdaVariable), _),
            LambdaFunction(fin: NamedLambdaVariable, Seq(fv: NamedLambdaVariable), _))
          if isVar(s1x, lx) && isVar(s1y, ly) &&
            isVar(s2x, lx) && isVar(s2y, ly) &&
            isVar(ax, acc) && isVar(ay, x) &&
            fin.exprId == fv.exprId =>
        Some((l, r))
      case _ => None
    }
  }

  /** Equal-length guard: the native min-length loop only matches the
    * HOF's null-on-ragged semantics when lengths agree; `Size` of a
    * null array is null, so the guard collapses to null exactly where
    * the HOF form does. */
  private def guarded(a: Expression, b: Expression, native: Expression): Expression =
    If(EqualTo(Size(a, legacySizeOfNull = false), Size(b, legacySizeOfNull = false)),
      native, Literal(null, DoubleType))

  override def apply(plan: LogicalPlan): LogicalPlan = plan.transformAllExpressions {
    case HofL2(a, b) if floatArray(a) && floatArray(b) =>
      guarded(a, b, L2Squared(a, b))
    case HofDot(a, b) =>
      DotProduct(a, b)
  }
}
