package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types._

/** 2-D Hilbert-curve index of a grid point: maps (x, y) on the
  * [0, 2^bits)² grid to its distance along the order-`bits` Hilbert
  * curve. The classic iterative xy→d walk (one quadrant decision +
  * gray-code rotation per bit level, highest level first) — pure
  * integer compares/shifts/adds, so the value is bit-identical
  * cross-engine and the DuckDB oracle replays the same walk as one
  * chained CTE per level ([[graft.ops.Layout.hilbertLevelsSql]]).
  *
  * Why beside the Morton interleave ([[graft.ops.Layout.zValueN]]):
  * both give every dimension a say in file boundaries, but Morton
  * takes long diagonal jumps at quadrant seams, so an equal-range
  * file can cover two far-apart rectangles and its min/max box goes
  * wide; the Hilbert curve is seam-continuous (adjacent d ⇒ adjacent
  * cells), files stay compact, and box probes touch fewer of them —
  * the reason lakehouse clustering is moving Morton → Hilbert.
  * Same native-loop discipline as [[HyperplaneBuckets]]. */
case class HilbertIndex(left: Expression, right: Expression, bits: Int)
    extends BinaryExpression {

  require(bits >= 1 && 2 * bits <= 62, s"2*bits must fit a long: $bits")

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (LongType, LongType) => TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires (BIGINT, BIGINT), " +
          s"got (${l.catalogString}, ${r.catalogString})")
    }
  override def dataType: DataType = LongType
  override def prettyName: String = "hilbert_index"

  override protected def nullSafeEval(x: Any, y: Any): Any =
    HilbertIndex.compute(x.asInstanceOf[Long], y.asInstanceOf[Long], bits)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (x, y) =>
      s"${ev.value} = graft.functions.HilbertIndex.compute($x, $y, $bits);")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): HilbertIndex =
    copy(left = newLeft, right = newRight)
}

object HilbertIndex {
  /** Out-of-range coordinates raise rather than silently alias distant
    * rows into one curve cell (the zValueN in-expression guard
    * posture). */
  def compute(x0: Long, y0: Long, bits: Int): Long = {
    val lim = 1L << bits
    if (x0 < 0 || x0 >= lim || y0 < 0 || y0 >= lim)
      throw new IllegalArgumentException(
        s"hilbert_index: point ($x0, $y0) outside [0, $lim)^2")
    var x = x0
    var y = y0
    var d = 0L
    var s = 1L << (bits - 1)
    while (s > 0) {
      val rx = if ((x & s) > 0) 1L else 0L
      val ry = if ((y & s) > 0) 1L else 0L
      d += s * s * ((3L * rx) ^ ry)
      // rotate the sub-quadrant so the next level walks it canonically;
      // the flip is within the FULL grid (lim-1-x, the canonical walk)
      // so coordinates never go negative while higher processed bits
      // are still set — only bits below s are read after this level
      if (ry == 0L) {
        if (rx == 1L) {
          x = lim - 1 - x
          y = lim - 1 - y
        }
        val t = x; x = y; y = t
      }
      s >>= 1
    }
    d
  }
}
