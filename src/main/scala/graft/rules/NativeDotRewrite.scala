package graft.rules

import graft.expressions.{DotProduct, SqDist}
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
      // the multiply must reference TWO DISTINCT lambda variables — a
      // degenerate user lambda like (x, y) -> x * x is element-wise
      // squaring of the LEFT array only, not a dot product, and rewriting
      // it would silently change results
      // the accumulate lambda gets the same discipline (r18 ADVICE): its
      // Add must reference BOTH of the lambda's own two arguments, each
      // exactly once — (acc, e) -> e + e is a doubling fold, not a sum,
      // and rewriting it would change results
      // ... and the multiply's variables must BE the zip lambda's own
      // two arguments (not merely distinct): a nested HOF capturing an
      // OUTER lambda's variable — transform(ws, t -> aggregate(
      // zip_with(a, b, (x, y) -> x * t), ...)) — is a scaled fold of
      // one array, not a dot product, and must be left untouched
      case ArrayAggregate(
            ZipWith(l, r,
              LambdaFunction(Multiply(m1: NamedLambdaVariable,
                m2: NamedLambdaVariable, _),
                Seq(zx: NamedLambdaVariable, zy: NamedLambdaVariable), _)),
            Literal(0.0, DoubleType),
            LambdaFunction(Add(a1: NamedLambdaVariable,
              a2: NamedLambdaVariable, _),
              Seq(acc: NamedLambdaVariable, el: NamedLambdaVariable), _),
            LambdaFunction(fin: NamedLambdaVariable, Seq(finArg), _))
          if isDoubleArray(l) && isDoubleArray(r) &&
            m1.exprId != m2.exprId &&
            Set(m1.exprId, m2.exprId) == Set(zx.exprId, zy.exprId) &&
            a1.exprId != a2.exprId &&
            Set(a1.exprId, a2.exprId) == Set(acc.exprId, el.exprId) &&
            fin.exprId == finArg.exprId =>
        DotProduct(l, r)
      // Similarity.sqDist's (x-y)*(x-y) fold — same seed/accumulate
      // shape, the squared-difference lambda must reference ONE (x, y)
      // pair — the SAME pair on both sides of the multiply, and x, y
      // DISTINCT variables ((x - x) * (x - x) is constant zero, not a
      // squared distance)
      // — and, as above, the (x, y) pair must BE the zip lambda's own
      // two arguments, so an outer-lambda capture ((x - t) * (x - t))
      // can never be rewritten into a squared distance
      case ArrayAggregate(
            ZipWith(l, r,
              LambdaFunction(Multiply(
                Subtract(x1: NamedLambdaVariable, y1: NamedLambdaVariable, _),
                Subtract(x2: NamedLambdaVariable, y2: NamedLambdaVariable, _),
                _),
                Seq(zx: NamedLambdaVariable, zy: NamedLambdaVariable), _)),
            Literal(0.0, DoubleType),
            LambdaFunction(Add(a1: NamedLambdaVariable,
              a2: NamedLambdaVariable, _),
              Seq(acc: NamedLambdaVariable, el: NamedLambdaVariable), _),
            LambdaFunction(fin: NamedLambdaVariable, Seq(finArg), _))
          if isDoubleArray(l) && isDoubleArray(r) &&
            x1.exprId == x2.exprId && y1.exprId == y2.exprId &&
            x1.exprId != y1.exprId &&
            Set(x1.exprId, y1.exprId) == Set(zx.exprId, zy.exprId) &&
            a1.exprId != a2.exprId &&
            Set(a1.exprId, a2.exprId) == Set(acc.exprId, el.exprId) &&
            fin.exprId == finArg.exprId =>
        SqDist(l, r)
    }
}
