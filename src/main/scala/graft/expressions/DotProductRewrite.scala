package graft.expressions

import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.{ArrayType, DoubleType}

/** Optimizer rule: rewrite the idiomatic higher-order-function dot
  * product
  *
  *   aggregate(zip_with(a, b, (x, y) -> x * y), 0.0, (acc, x) -> acc + x)
  *
  * into the native codegen [[DotProduct]]. The HOF form is what a user
  * naturally writes with `org.apache.spark.sql.functions`; interpreted
  * lambda evaluation makes it ~4× slower than the generated loop, and
  * the fold order is identical (left-to-right, 0.0 init), so the
  * rewrite is bit-preserving on clean inputs (x*y == y*x and
  * 0.0 + x1 == x1 in IEEE, so either lambda-argument order qualifies
  * only when the multiply references both zip sides — enforced below)
  * AND on degenerate ones: [[DotProduct]] implements the HOF's null
  * semantics exactly (NULL on length mismatch — zip_with null-pads —
  * and on null elements), so the rule is safe to inject globally via
  * spark.sql.extensions even for user queries over ragged or
  * null-bearing arrays. Injected by [[graft.GraftExtensions]] via
  * injectOptimizerRule.
  */
object DotProductRewrite extends Rule[LogicalPlan] {

  private def isDoubleArray(e: Expression): Boolean = e.dataType match {
    case ArrayType(DoubleType, _) => true
    case _ => false
  }

  /** identity finish lambda: (acc) -> acc */
  private def isIdentity(f: Expression): Boolean = f match {
    case LambdaFunction(v: NamedLambdaVariable,
        Seq(arg: NamedLambdaVariable), _) => v.exprId == arg.exprId
    case _ => false
  }

  /** merge lambda (acc, x) -> acc + x in either argument order */
  private def isSumMerge(f: Expression): Boolean = f match {
    case LambdaFunction(Add(l: NamedLambdaVariable, r: NamedLambdaVariable, _),
        Seq(a: NamedLambdaVariable, b: NamedLambdaVariable), _) =>
      Set(l.exprId, r.exprId) == Set(a.exprId, b.exprId)
    case _ => false
  }

  /** zip lambda (x, y) -> x * y over both zip arguments */
  private def isProduct(f: Expression): Boolean = f match {
    case LambdaFunction(Multiply(l: NamedLambdaVariable, r: NamedLambdaVariable, _),
        Seq(a: NamedLambdaVariable, b: NamedLambdaVariable), _) =>
      Set(l.exprId, r.exprId) == Set(a.exprId, b.exprId)
    case _ => false
  }

  override def apply(plan: LogicalPlan): LogicalPlan =
    plan.transformAllExpressions {
      case ArrayAggregate(ZipWith(a, b, zipF), zero: Literal, mergeF, finishF)
          if zero.value == 0.0d && isDoubleArray(a) && isDoubleArray(b) &&
            isProduct(zipF) && isSumMerge(mergeF) && isIdentity(finishF) =>
        DotProduct(a, b)
    }
}
