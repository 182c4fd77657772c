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
  * Precondition encoded in the match: both arrays are `array<double>` and
  * the fold is exactly (0.0, +) with an identity finish. Note one
  * semantic edge: `zip_with` pads length-mismatched arrays with nulls
  * (making the fold null), while the kernel folds to the shorter length —
  * equal-length embedding columns, the only place the idiom appears, are
  * unaffected.
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

  override def apply(plan: LogicalPlan): LogicalPlan = plan.transformAllExpressions {
    case ArrayAggregate(
        ZipWith(a, b,
          LambdaFunction(Multiply(_: NamedLambdaVariable, _: NamedLambdaVariable, _), _, _)),
        Literal(0.0, DoubleType),
        LambdaFunction(Add(_: NamedLambdaVariable, _: NamedLambdaVariable, _), _, _),
        finish)
        if isDoubleArray(a) && isDoubleArray(b) && isIdentityFinish(finish) =>
      DotProductExpr(a, b)
  }
}
