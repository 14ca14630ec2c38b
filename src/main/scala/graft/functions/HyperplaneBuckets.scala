package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._

/** Native Catalyst expression for multi-table random-hyperplane LSH
  * signatures — the custom-Expression tier of the operator preference
  * order (compose built-ins → custom Expression → custom plan).
  *
  * Semantics are IDENTICAL to the array-HOF formulation it replaces
  * (graft.ops.Similarity r4 history) and to the DuckDB oracle mirror:
  * for plane p ∈ [0, planes·tables) and dimension d,
  * weight(p,d) = ((d·2654435761 + p·40503 + 104729) mod 1000003
  * mod 2001) − 1000; bit j of table t's bucket is the sign of the
  * projection on plane t·planes+j.
  *
  * Why an Expression: the HOF pipeline (`aggregate` carrying a
  * 32-slot `zip_with` accumulator) is CodegenFallback — ~dims×planes
  * interpreted lambda dispatches per row (≈2k for 64-dim×32 planes),
  * dominated by megamorphic eval() calls that the JIT can't sink.
  * Here both the interpreted path and the codegen path call one
  * static monomorphic method with two tight primitive loops —
  * whole-stage codegen keeps the row loop fused, and the JVM compiles
  * the inner loops after a few thousand rows.
  */
case class HyperplaneBuckets(child: Expression, planes: Int, tables: Int)
    extends UnaryExpression {

  require(planes >= 1 && planes <= 62, "planes must fit a long bucket")
  require(tables >= 1, "need at least one table")

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(LongType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires ARRAY<BIGINT>, got ${other.catalogString}")
  }
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "hyperplane_buckets"

  override protected def nullSafeEval(input: Any): Any =
    HyperplaneBuckets.compute(input.asInstanceOf[ArrayData], planes, tables)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.HyperplaneBuckets.compute($c, $planes, $tables);")

  override protected def withNewChildInternal(newChild: Expression): HyperplaneBuckets =
    copy(child = newChild)
}

object HyperplaneBuckets {

  /** All `tables` bucket signatures of a scaled-int vector in one
    * pass. Exact integer arithmetic — bit-stable anywhere. */
  def compute(vec: ArrayData, planes: Int, tables: Int): GenericArrayData = {
    val total = planes * tables
    val n = vec.numElements()
    val acc = new Array[Long](total)
    var d = 0
    while (d < n) {
      val x = vec.getLong(d)
      val dMix = d.toLong * 2654435761L
      var p = 0
      while (p < total) {
        val mixed = (dMix + p.toLong * 40503L + 104729L) % 1000003L
        acc(p) += x * ((mixed % 2001L) - 1000L)
        p += 1
      }
      d += 1
    }
    val out = new Array[Long](tables)
    var t = 0
    while (t < tables) {
      var bucket = 0L
      var j = 0
      while (j < planes) {
        if (acc(t * planes + j) > 0) bucket |= (1L << j)
        j += 1
      }
      out(t) = bucket
      t += 1
    }
    new GenericArrayData(out)
  }
}
