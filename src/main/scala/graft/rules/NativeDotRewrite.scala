package graft.rules

import graft.expressions.DotProduct
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.{ArrayType, DoubleType}

/** Catalyst optimizer rule: rewrite the interpreted higher-order-function
  * dot-product idiom
  *
  * {{{ aggregate(zip_with(a, b, (x, y) -> x * y), 0.0D, (acc, v) -> acc + v) }}}
  *
  * into the native codegen [[DotProduct]] expression. Higher-order functions
  * are evaluated interpreted (per-element lambda dispatch); anything built
  * on `Similarity.dot` — cosine scoring in ANN, embedding dedup — silently
  * gains the fused primitive loop in sessions with GraftExtensions
  * installed, with zero caller changes. The match is deliberately narrow
  * (double arrays, literal 0.0 seed, pure multiply-then-add lambdas,
  * identity finish); anything else is left untouched.
  */
object NativeDotRewrite extends Rule[LogicalPlan] {

  private def isDoubleArray(e: Expression): Boolean = e.dataType match {
    case ArrayType(DoubleType, _) => true
    case _ => false
  }

  override def apply(plan: LogicalPlan): LogicalPlan =
    plan.transformAllExpressions {
      case ArrayAggregate(
            ZipWith(l, r,
              LambdaFunction(Multiply(_: NamedLambdaVariable,
                _: NamedLambdaVariable, _), _, _)),
            Literal(0.0, DoubleType),
            LambdaFunction(Add(_: NamedLambdaVariable,
              _: NamedLambdaVariable, _), _, _),
            LambdaFunction(fin: NamedLambdaVariable, Seq(finArg), _))
          if isDoubleArray(l) && isDoubleArray(r) && fin.exprId == finArg.exprId =>
        DotProduct(l, r)
    }
}
