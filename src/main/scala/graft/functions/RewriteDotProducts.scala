package graft.functions

import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.{ArrayType, DoubleType}

/** Optimizer rule: rewrite the idiomatic higher-order-function dot
  * product
  *
  * {{{ aggregate(zip_with(a, b, (x, y) -> x * y), 0.0D, (acc, v) -> acc + v) }}}
  *
  * into the native codegen'd [[ArrayDotProduct]]. Both `ArrayAggregate`
  * and `ZipWith` are `CodegenFallback` — a query written with the
  * built-in route breaks its whole-stage-codegen span and evaluates a
  * boxed lambda per element, which profiling showed is a 10–100×
  * penalty on vector workloads. Users (and SQL authors) can keep
  * writing the declarative form; the plan gets the tight loop.
  *
  * The rewrite fires only when the semantics are provably identical:
  *  - both inputs are `array<double>` with `containsNull = false`
  *    (ArrayDotProduct skips null ELEMENTS; the HOF form would return
  *    a null sum — so nullable elements are left alone);
  *  - the zip lambda is exactly `x * y` (either order) over its two
  *    arguments, the zero is literal `0.0`, the merge lambda is
  *    exactly `acc + v` (either order), and the finish lambda is the
  *    identity.
  *
  * Injected by [[GraftExtensions]] via `injectOptimizerRule`.
  */
object RewriteDotProducts extends Rule[LogicalPlan] {

  private def isDoubleArrayNoNulls(e: Expression): Boolean = e.dataType match {
    case ArrayType(DoubleType, containsNull) => !containsNull
    case _ => false
  }

  /** lambda is (p0, p1) -> p0 ⊕ p1 (either argument order) */
  private def isBinOp(fn: LambdaFunction,
                      matchOp: PartialFunction[Expression, (Expression, Expression)]): Boolean =
    fn.arguments match {
      case Seq(p0: NamedLambdaVariable, p1: NamedLambdaVariable) =>
        matchOp.lift(fn.function) match {
          case Some((l: NamedLambdaVariable, r: NamedLambdaVariable)) =>
            (l.exprId == p0.exprId && r.exprId == p1.exprId) ||
            (l.exprId == p1.exprId && r.exprId == p0.exprId)
          case _ => false
        }
      case _ => false
    }

  private def isIdentity(fn: LambdaFunction): Boolean = fn.arguments match {
    case Seq(p: NamedLambdaVariable) => fn.function match {
      case v: NamedLambdaVariable => v.exprId == p.exprId
      case _ => false
    }
    case _ => false
  }

  private val zeroD = Literal(0.0, DoubleType)

  override def apply(plan: LogicalPlan): LogicalPlan =
    plan.transformAllExpressions {
      case ArrayAggregate(
            ZipWith(a, b, zip: LambdaFunction),
            zero, merge: LambdaFunction, finish: LambdaFunction)
          if zero.semanticEquals(zeroD) &&
            isDoubleArrayNoNulls(a) && isDoubleArrayNoNulls(b) &&
            isBinOp(zip, { case Multiply(l, r, _) => (l, r) }) &&
            isBinOp(merge, { case Add(l, r, _) => (l, r) }) &&
            isIdentity(finish) =>
        ArrayDotProduct(a, b)
    }
}
