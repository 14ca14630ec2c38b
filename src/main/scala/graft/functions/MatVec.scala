package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._

/** Dense matrix × vector as ONE codegen'd projection:
  * `out(i) = Σ_j mat(i)(j) · vec(j)` — the apply step of a learned
  * orthogonal rotation (OPQ, [[graft.ops.Similarity.opqRotation]]).
  * `mat` is a plan-time literal ARRAY<ARRAY<DOUBLE>> — a d×d rotation
  * is metadata-sized (64² doubles = 32 KB), so shipping it inside the
  * expression keeps rotation a pure per-row map: no join, no shuffle,
  * corpus scanned once, whole-stage codegen intact (the
  * [[NearestCentroid]] discipline; a `transform`+`aggregate` lambda
  * chain for the same math would leave codegen and allocate per
  * element). */
case class MatVec(left: Expression, right: Expression)
    extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(DoubleType, _), ArrayType(ArrayType(DoubleType, _), _)) =>
        TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires (ARRAY<DOUBLE>, ARRAY<ARRAY<DOUBLE>>), " +
          s"got (${l.catalogString}, ${r.catalogString})")
    }
  override def dataType: DataType = ArrayType(DoubleType, containsNull = false)
  override def prettyName: String = "mat_vec"

  override protected def nullSafeEval(vec: Any, mat: Any): Any =
    MatVec.compute(vec.asInstanceOf[ArrayData],
      mat.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (v, m) =>
      s"${ev.value} = graft.functions.MatVec.compute($v, $m);")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): MatVec =
    copy(left = newLeft, right = newRight)
}

object MatVec {
  def compute(vec: ArrayData, mat: ArrayData): GenericArrayData = {
    val rows = mat.numElements()
    val dim = vec.numElements()
    val out = new Array[Any](rows)
    var i = 0
    while (i < rows) {
      val row = mat.getArray(i)
      require(row.numElements() == dim,
        s"mat_vec: matrix row $i has ${row.numElements()} columns, " +
          s"vector has $dim")
      var acc = 0.0
      var j = 0
      while (j < dim) {
        acc += row.getDouble(j) * vec.getDouble(j)
        j += 1
      }
      out(i) = acc
      i += 1
    }
    new GenericArrayData(out)
  }
}
