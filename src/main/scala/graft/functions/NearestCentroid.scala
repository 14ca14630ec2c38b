package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/** IVF cell assignment: index of the centroid with the maximal exact
  * scaled-integer dot product against the input vector (ties → lowest
  * index). `centroids` is a plan-time literal ARRAY<ARRAY<BIGINT>> —
  * the coarse codebook is metadata-sized (C·dim longs), so shipping it
  * inside the expression keeps assignment a pure per-row projection:
  * no shuffle, no join, corpus scanned once. Same native-loop
  * discipline as [[HyperplaneBuckets]]. */
case class NearestCentroid(left: Expression, right: Expression)
    extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(LongType, _), ArrayType(ArrayType(LongType, _), _)) =>
        TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires (ARRAY<BIGINT>, ARRAY<ARRAY<BIGINT>>), " +
          s"got (${l.catalogString}, ${r.catalogString})")
    }
  override def dataType: DataType = IntegerType
  override def prettyName: String = "nearest_centroid"

  override protected def nullSafeEval(vec: Any, cents: Any): Any =
    NearestCentroid.compute(vec.asInstanceOf[ArrayData],
      cents.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (v, c) =>
      s"${ev.value} = graft.functions.NearestCentroid.compute($v, $c);")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): NearestCentroid =
    copy(left = newLeft, right = newRight)
}

object NearestCentroid {
  def compute(vec: ArrayData, cents: ArrayData): Int = {
    val dim = vec.numElements()
    val c = cents.numElements()
    var best = 0
    var bestDot = Long.MinValue
    var i = 0
    while (i < c) {
      val cent = cents.getArray(i)
      var dot = 0L
      var d = 0
      while (d < dim) {
        dot += vec.getLong(d) * cent.getLong(d)
        d += 1
      }
      if (dot > bestDot) { bestDot = dot; best = i }
      i += 1
    }
    best
  }
}
