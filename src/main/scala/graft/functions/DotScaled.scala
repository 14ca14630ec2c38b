package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/** Exact dot product of two pre-scaled BIGINT vectors as ONE native
  * loop — the codegen replacement for the
  * `aggregate(zip_with(a, b, _*_), 0L, _+_)` HOF formulation that
  * every similarity hot path was paying for: interpreted HOFs
  * dispatch a megamorphic lambda per ELEMENT (the WordShingles /
  * TokenSegments lesson, third instance), so a 64-dim dot costs ~128
  * lambda calls where this is a fused multiply-add loop inside
  * whole-stage codegen. Arithmetic is IDENTICAL to the HOF form and
  * to the DuckDB mirror ([[graft.ops.Similarity.dotPreScaledSql]]):
  * plain long multiply-accumulate, same overflow envelope (|x| ≤ 10⁶
  * per component ⇒ |dot| ≤ dim·10¹², safe to dim ≈ 9·10⁶). */
case class DotScaled(left: Expression, right: Expression)
    extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(LongType, _), ArrayType(LongType, _)) =>
        TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires (ARRAY<BIGINT>, ARRAY<BIGINT>), " +
          s"got (${l.catalogString}, ${r.catalogString})")
    }
  override def dataType: DataType = LongType
  override def prettyName: String = "dot_scaled"

  override protected def nullSafeEval(a: Any, b: Any): Any =
    DotScaled.compute(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) =>
      s"${ev.value} = graft.functions.DotScaled.compute($a, $b);")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): DotScaled =
    copy(left = newLeft, right = newRight)
}

/** Int8-code dot product (ARRAY<INT> × ARRAY<INT> → BIGINT) — the
  * [[DotScaled]] loop for quantized vectors; 64·127² peaks ≈ 10⁶,
  * far inside long range, matching [[graft.ops.Similarity.dotInt8Sql]].
  */
case class DotInt8(left: Expression, right: Expression)
    extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(IntegerType, _), ArrayType(IntegerType, _)) =>
        TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires (ARRAY<INT>, ARRAY<INT>), " +
          s"got (${l.catalogString}, ${r.catalogString})")
    }
  override def dataType: DataType = LongType
  override def prettyName: String = "dot_int8"

  override protected def nullSafeEval(a: Any, b: Any): Any =
    DotInt8.compute(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) =>
      s"${ev.value} = graft.functions.DotInt8.compute($a, $b);")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): DotInt8 =
    copy(left = newLeft, right = newRight)
}

object DotInt8 {
  def compute(a: ArrayData, b: ArrayData): Long = {
    val n = a.numElements()
    require(n == b.numElements(),
      s"dot_int8: dimension mismatch ($n vs ${b.numElements()})")
    var dot = 0L
    var i = 0
    while (i < n) {
      dot += a.getInt(i).toLong * b.getInt(i)
      i += 1
    }
    dot
  }
}

object DotScaled {
  /** FAIL-LOUD on ragged dimensions: the HOF form this expression
    * replaced null-padded (zip_with) and so surfaced unequal lengths
    * as a visible NULL; a silent truncation here would instead yield
    * a plausible-looking partial dot product. All engine vectors are
    * fixed-dim by construction, so the check never fires on the
    * exercised paths (SimilaritySpec pins equal-dim equivalence) —
    * it exists to make a dimension bug an error, not a wrong answer. */
  def compute(a: ArrayData, b: ArrayData): Long = {
    val n = a.numElements()
    require(n == b.numElements(),
      s"dot_scaled: dimension mismatch ($n vs ${b.numElements()})")
    var dot = 0L
    var i = 0
    while (i < n) {
      dot += a.getLong(i) * b.getLong(i)
      i += 1
    }
    dot
  }
}
