package graft.expressions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, LongType}

/** Native Catalyst expression: `numPlanes`-bit random-hyperplane LSH bucket
  * of a vector (bit p = sign of dot(v, r_{offset+p}), packed MSB-first).
  *
  * Replaces the nested higher-order-function formulation in
  * [[graft.ops.Similarity.lshBucketHof]] — `transform(sequence, p ->
  * aggregate(zip_with(...)))` — which Spark evaluates fully INTERPRETED:
  * per-plane per-element lambda dispatch with boxed accumulators, the hot
  * inner loop of every LSH query/dedup scan. Here the planes×dims loop is a
  * tight primitive Java loop fused into whole-stage codegen.
  *
  * The plane family is the same portable integer arithmetic (h = (73856093
  * (offset+p) + 19349663 i) mod 1000003; component = ((h²+h) mod 1000003) /
  * 500000 − 1), same fold order, so buckets are bit-identical to the HOF
  * form and to the DuckDB oracle's re-derivation.
  */
case class LshBucket(vec: Expression, offset: Expression, numPlanes: Int)
    extends BinaryExpression {

  override def left: Expression = vec
  override def right: Expression = offset

  override def checkInputDataTypes(): TypeCheckResult =
    (vec.dataType, offset.dataType) match {
      case (ArrayType(DoubleType, _), LongType) if numPlanes >= 1 && numPlanes <= 62 =>
        TypeCheckResult.TypeCheckSuccess
      case _ => TypeCheckResult.TypeCheckFailure(
        s"lsh_bucket expects (array<double>, bigint) with 1 <= planes <= 62, " +
          s"got (${vec.dataType.simpleString}, ${offset.dataType.simpleString}), " +
          s"planes=$numPlanes")
    }

  override def dataType: DataType = LongType

  override def prettyName: String = "lsh_bucket"

  override protected def nullSafeEval(v: Any, off: Any): Any = {
    val a = v.asInstanceOf[ArrayData]
    val base = off.asInstanceOf[Long]
    val n = a.numElements()
    var bucket = 0L
    var p = 0
    while (p < numPlanes) {
      val plane = base + p
      var dot = 0.0
      var i = 0
      while (i < n) {
        val h = java.lang.Math.floorMod(
          plane * 73856093L + i.toLong * 19349663L, 1000003L)
        dot += a.getDouble(i) *
          (java.lang.Math.floorMod(h * h + h, 1000003L).toDouble / 500000.0 - 1.0)
        i += 1
      }
      bucket = bucket * 2L + (if (dot >= 0.0) 1L else 0L)
      p += 1
    }
    bucket
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (v, off) => {
      val n = ctx.freshName("n")
      val p = ctx.freshName("p")
      val i = ctx.freshName("i")
      val plane = ctx.freshName("plane")
      val dot = ctx.freshName("dot")
      val h = ctx.freshName("h")
      val bucket = ctx.freshName("bucket")
      s"""
         |int $n = $v.numElements();
         |long $bucket = 0L;
         |for (int $p = 0; $p < $numPlanes; $p++) {
         |  long $plane = $off + $p;
         |  double $dot = 0.0;
         |  for (int $i = 0; $i < $n; $i++) {
         |    long $h = java.lang.Math.floorMod(
         |      $plane * 73856093L + ((long) $i) * 19349663L, 1000003L);
         |    $dot += $v.getDouble($i) *
         |      (((double) java.lang.Math.floorMod($h * $h + $h, 1000003L))
         |        / 500000.0 - 1.0);
         |  }
         |  $bucket = $bucket * 2L + ($dot >= 0.0 ? 1L : 0L);
         |}
         |${ev.value} = $bucket;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): LshBucket =
    copy(vec = newLeft, offset = newRight)
}
