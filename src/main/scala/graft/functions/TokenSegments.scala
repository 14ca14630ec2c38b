package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Native fixed-width token segmentation: the NON-overlapping sibling
  * of [[WordShingles]] (stride w instead of 1) — ceil(n/w) windows of
  * w single-space tokens, last window ragged, for the boilerplate
  * line-dedup family ([[graft.ops.LineDedup]]).
  *
  * Exists for the same reason WordShingles does: the HOF build
  * (`transform(sequence(...), g -> array_join(slice(split(..)..)))`)
  * re-evaluates the inlined `split` per lambda element after
  * CollapseProject — O(segments · tokens) per row, measured 12×/decade
  * superlinear on q_line_dedup at sf1 — where this is one codegen'd
  * pass and every segment is a zero-copy contiguous byte slice
  * (a space byte cannot occur inside a multi-byte UTF-8 sequence).
  *
  * Semantics pinned to the HOF/DuckDB formulation: split on single
  * space KEEPING empties, so "" yields one "" segment and texts
  * shorter than w tokens yield the whole text as one segment.
  */
case class TokenSegments(child: Expression, w: Int)
    extends UnaryExpression {

  require(w >= 1, "segment width must be positive")

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires STRING, got ${other.catalogString}")
  }
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def prettyName: String = "token_segments"

  override protected def nullSafeEval(input: Any): Any =
    TokenSegments.compute(input.asInstanceOf[UTF8String], w)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.TokenSegments.compute($c, $w);")

  override protected def withNewChildInternal(newChild: Expression): TokenSegments =
    copy(child = newChild)
}

object TokenSegments {
  def compute(text: UTF8String, w: Int): GenericArrayData = {
    val b = text.getBytes
    val starts = scala.collection.mutable.ArrayBuffer[Int](0)
    var i = 0
    while (i < b.length) {
      if (b(i) == ' ') starts += i + 1
      i += 1
    }
    val n = starts.length
    val nSegs = (n + w - 1) / w
    def tokenEnd(t: Int): Int =
      if (t == n - 1) b.length else starts(t + 1) - 1
    val out = new Array[Any](nSegs)
    var g = 0
    while (g < nSegs) {
      val from = starts(g * w)
      val until = tokenEnd(math.min(g * w + w, n) - 1)
      out(g) = UTF8String.fromBytes(b, from, until - from)
      g += 1
    }
    new GenericArrayData(out)
  }
}
