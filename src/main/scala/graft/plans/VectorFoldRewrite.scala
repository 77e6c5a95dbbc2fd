package graft.plans

import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType}
import graft.functions.DotProduct

/** Optimizer rule: rewrite the canonical higher-order-function dot
  * product
  *
  *   aggregate(zip_with(a, b, (x, y) -> x * y), 0d, (acc, v) -> acc + v)
  *
  * into the codegen'd native kernel `vec_dot(a, b)` — the §2.9 ladder's
  * `Rule[LogicalPlan]` rung: a SQL/Column user who writes the standard
  * fold gets the zero-allocation loop the Column API's `dot()` helper
  * uses, without knowing the kernel exists (VectorExpressionsSpec pins
  * the bit-equality of the two forms).
  *
  * Soundness. The rewrite fires only when BOTH inputs are
  * `array<double>` with `containsNull = false` and both are
  * deterministic. Under that contract the lambda form's full semantics
  * are:
  *
  *   - equal lengths → the left-to-right fold = `DotProduct` exactly
  *     (same index-order IEEE additions);
  *   - unequal lengths → `zip_with` pads the shorter side with null, the
  *     multiply yields null elements, and the non-null-safe `+` fold
  *     poisons the sum → NULL;
  *   - either array NULL → NULL.
  *
  * All three branches are therefore exactly
  * `If(size(a) = size(b), vec_dot(a, b), NULL)` — the null-array case
  * falls through the If's null/false predicate to the NULL branch (and
  * under `legacySizeOfNull` both-null gives −1 = −1 → `vec_dot`'s
  * null-safe eval returns NULL just the same). Because no
  * `ArrayAggregate` survives in the output, the rule is idempotent, so
  * it is safe in any fixed-point batch. Production injection
  * (`GraftExtensions.injectOptimizerRule`) registers it into the
  * operator-optimization batches (`extendedOperatorOptimizationRules`);
  * only the experimental `GraftBridge` path the spec uses lands in the
  * "User Provided Optimizers" batch.
  *
  * Cost note: the output references each input expression three times
  * (two `Size`s + `DotProduct`) where the fold evaluated each once — for
  * an expensive deterministic input (a transform/slice, not a bare
  * attribute) this can triple per-row evaluation unless
  * common-subexpression elimination catches it. Acceptable here because
  * every catalog call site feeds bare column attributes; revisit the
  * guard (restrict to `Attribute` inputs) if profiling ever shows this
  * rewrite on a hot path with computed inputs.
  *
  * Guards that must NOT fire the rewrite: a non-identity finish lambda,
  * a zero literal other than +0.0 (−0.0 changes the empty-array sum
  * bits), element-nullable arrays (the kernel reads primitives), any
  * multiply/add tree that is not exactly the two lambda variables
  * (commutative matching is safe — IEEE `*` and `+` are bitwise
  * commutative), and non-deterministic inputs (the rewrite references
  * them twice). Disable with `spark.graft.rewriteVectorFolds=false`
  * (VectorExpressionsSpec's lambda-path parity cases rely on the
  * un-rewritten form).
  */
object VectorFoldRewrite extends Rule[LogicalPlan] {

  private val ConfKey = "spark.graft.rewriteVectorFolds"

  override def apply(plan: LogicalPlan): LogicalPlan =
    // anything but (case-insensitive) "true" disables: a kill switch must
    // degrade gracefully, not crash every query at optimization time the
    // way String.toBoolean would on "0"/"off"
    if (!conf.getConfString(ConfKey, "true").equalsIgnoreCase("true")) plan
    else plan.transformAllExpressions {
      case agg: ArrayAggregate =>
        rewrite(agg).getOrElse(agg)
    }

  private def rewrite(agg: ArrayAggregate): Option[Expression] = for {
    (a, b) <- zipWithMultiply(agg.argument)
    if isDoubleArrayNoNulls(a.dataType) && isDoubleArrayNoNulls(b.dataType)
    if a.deterministic && b.deterministic
    if isPositiveZeroDouble(agg.zero)
    if isPlainAdd(agg.merge)
    if isIdentity(agg.finish)
  } yield If(EqualTo(new Size(a), new Size(b)), DotProduct(a, b),
    Literal(null, DoubleType))

  /** Match zip_with(a, b, (x, y) -> x * y) where the multiply operands
    * are exactly the lambda's two variables, in either order. */
  private def zipWithMultiply(e: Expression): Option[(Expression, Expression)] =
    e match {
      case zw: ZipWith => zw.function match {
        case lf: LambdaFunction if lf.arguments.length == 2 =>
          lf.function match {
            case m: Multiply if operandsAreVars(m.left, m.right, lf.arguments) =>
              Some((zw.left, zw.right))
            case _ => None
          }
        case _ => None
      }
      case _ => None
    }

  private def isPlainAdd(merge: Expression): Boolean = merge match {
    case lf: LambdaFunction if lf.arguments.length == 2 =>
      lf.function match {
        case a: Add => operandsAreVars(a.left, a.right, lf.arguments)
        case _ => false
      }
    case _ => false
  }

  private def isIdentity(finish: Expression): Boolean = finish match {
    case lf: LambdaFunction if lf.arguments.length == 1 =>
      (lf.function, lf.arguments.head) match {
        case (v: NamedLambdaVariable, arg: NamedLambdaVariable) =>
          v.exprId == arg.exprId
        case _ => false
      }
    case _ => false
  }

  /** Both operands are the lambda's own two variables (each used once,
    * either order — IEEE * and + are bitwise commutative). */
  private def operandsAreVars(l: Expression, r: Expression,
      args: Seq[NamedExpression]): Boolean = (l, r) match {
    case (lv: NamedLambdaVariable, rv: NamedLambdaVariable) =>
      val ids = args.collect { case v: NamedLambdaVariable => v.exprId }.toSet
      lv.exprId != rv.exprId && ids == Set(lv.exprId, rv.exprId)
    case _ => false
  }

  private def isPositiveZeroDouble(e: Expression): Boolean = e match {
    case Literal(v: Double, DoubleType) =>
      java.lang.Double.doubleToRawLongBits(v) == 0L
    case _ => false
  }

  private def isDoubleArrayNoNulls(dt: DataType): Boolean = dt match {
    case ArrayType(DoubleType, containsNull) => !containsNull
    case _ => false
  }
}
