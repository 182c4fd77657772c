package graft.plans

import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.{ArrayType, DoubleType}

import graft.functions.DotProductExpr

/** Optimizer rewrite: recognize the declarative dot-product idiom
  *
  * {{{ aggregate(zip_with(a, b, (x, y) -> x * y), 0d, (acc, v) -> acc + v) }}}
  *
  * and replace it with the native [[DotProductExpr]] kernel — users who
  * write the composable higher-order form get the codegen'd loop
  * automatically (the HOF form evaluates on the interpreted expression
  * path; see HashImpl's scaladoc for the measured cost).
  *
  * Precondition encoded in the match: both arrays are `array<double>`,
  * the zip and merge lambdas use exactly their own two bound parameters,
  * and the fold is exactly (0.0, +) with an identity finish. The kernel
  * ([[graft.functions.HashImpl.dotChecked]]) reproduces the HOF form's
  * null semantics exactly — null on length mismatch (zip_with pads with
  * nulls) and on any null element — so the rewrite is semantics-preserving
  * on every input.
  */
object VectorizeHofRule extends Rule[LogicalPlan] {

  private def isDoubleArray(e: Expression): Boolean = e.dataType match {
    case ArrayType(DoubleType, _) => true
    case _ => false
  }

  private def isIdentityFinish(f: Expression): Boolean = f match {
    case LambdaFunction(v: NamedLambdaVariable, Seq(arg: NamedLambdaVariable), _) =>
      v.exprId == arg.exprId
    case _ => false
  }

  /** True iff `p` and `q` are exactly the lambda's two bound parameters,
    * one each, in either order. Rejects `(x, y) -> x * x` (one param used
    * twice), merge lambdas like `(acc, v) -> v + v`, and operands that
    * capture an OUTER lambda's variable (their exprIds belong to a
    * different binder) — any of which would make the rewrite change
    * results. */
  private def bindsBothParams(p: NamedLambdaVariable, q: NamedLambdaVariable,
                              args: Seq[NamedExpression]): Boolean = args match {
    case Seq(u: NamedLambdaVariable, v: NamedLambdaVariable) =>
      Set(p.exprId, q.exprId) == Set(u.exprId, v.exprId)
    case _ => false
  }

  override def apply(plan: LogicalPlan): LogicalPlan = plan.transformAllExpressions {
    case ArrayAggregate(
        ZipWith(a, b,
          LambdaFunction(Multiply(mx: NamedLambdaVariable, my: NamedLambdaVariable, _), zipArgs, _)),
        Literal(0.0, DoubleType),
        LambdaFunction(Add(ax: NamedLambdaVariable, ay: NamedLambdaVariable, _), mergeArgs, _),
        finish)
        if isDoubleArray(a) && isDoubleArray(b) && isIdentityFinish(finish)
          && bindsBothParams(mx, my, zipArgs) && bindsBothParams(ax, ay, mergeArgs) =>
      DotProductExpr(a, b)
  }
}
