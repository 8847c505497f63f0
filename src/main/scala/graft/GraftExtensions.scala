package graft

import graft.expressions.{CosineSimilarity, LshBucket}
import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Cast, Expression, ExpressionInfo, Literal}
import org.apache.spark.sql.types.{ArrayType, DoubleType, IntegerType, LongType}

/** SparkSessionExtensions entry point: registers the engine's native
  * Catalyst expressions into the session's function registry so they are
  * callable from SQL text and `call_function`.
  *
  * Activate with `.config("spark.sql.extensions", "graft.GraftExtensions")`
  * (Bench/Verify/test sessions do).
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    // auto-accelerate the HOF dot-product idiom into the native expression
    ext.injectOptimizerRule(_ => graft.rules.NativeDotRewrite)
    ext.injectFunction((
      new FunctionIdentifier("cosine_sim"),
      new ExpressionInfo(classOf[CosineSimilarity].getName, "cosine_sim"),
      (children: Seq[Expression]) => {
        require(children.size == 2, "cosine_sim(arrayA, arrayB)")
        // accept array<float>/array<int>/... by casting up front
        val toDouble = (e: Expression) => e.dataType match {
          case ArrayType(DoubleType, _) => e
          case _ => Cast(e, ArrayType(DoubleType))
        }
        CosineSimilarity(toDouble(children.head), toDouble(children(1)))
      }))
    ext.injectFunction((
      new FunctionIdentifier("lsh_bucket"),
      new ExpressionInfo(classOf[LshBucket].getName, "lsh_bucket"),
      (children: Seq[Expression]) => {
        require(children.size == 3, "lsh_bucket(vec, numPlanesLiteral, offset)")
        val planes = children(1) match {
          case Literal(v: Int, IntegerType) => v
          case other => throw new IllegalArgumentException(
            s"lsh_bucket: numPlanes must be an integer literal, got $other")
        }
        val vec = children.head.dataType match {
          case ArrayType(DoubleType, _) => children.head
          case _ => Cast(children.head, ArrayType(DoubleType))
        }
        val offset = children(2).dataType match {
          case LongType => children(2)
          case _ => Cast(children(2), LongType)
        }
        LshBucket(vec, offset, planes)
      }))
  }
}
