package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types._

/** Membership of a BIGINT key in a SORTED, DISJOINT set of closed
  * ranges — binary search instead of the `key BETWEEN lo AND hi OR …`
  * chain. A curve cover of an unaligned probe box runs to ~10² ranges
  * per probe ([[graft.ops.Layout.hilbertCover]]), so the OR chain
  * costs ~2·ranges comparisons per row per probe where this does
  * ~log₂(ranges): the q_hilbert_probe 16-probe batch dropped 7.5 s →
  * 1.1 s at sf0.1 when its projected flags switched over. The
  * bounds live OUTSIDE the expression tree (one reference object per
  * probe, ~2·ranges longs), so codegen stays tiny no matter how
  * fragmented the cover is — the OR form at 900 ranges is ~1800
  * comparison nodes of generated Java.
  *
  * Kept DELIBERATELY out of scan filters: plain BETWEEN disjunctions
  * are what parquet row-group min/max pruning understands
  * ([[graft.ops.Layout.coverPredicate]] stays the pushdown form);
  * this is the projection/flag form for batched probe evaluation
  * where nothing pushes down anyway.
  *
  * `bounds` is the flattened cover `[lo0, hi0, lo1, hi1, …]`,
  * required sorted and disjoint at construction — fail loud, a
  * silently unsorted cover would turn binary search into wrong
  * answers, not slow ones.
  */
case class InSortedRanges(child: Expression, bounds: Seq[Long])
    extends UnaryExpression {

  require(bounds.nonEmpty && bounds.length % 2 == 0,
    s"in_sorted_ranges: bounds must be non-empty (lo, hi) pairs, " +
      s"got ${bounds.length} values")
  require(bounds.grouped(2).forall(p => p(0) <= p(1)),
    "in_sorted_ranges: every range needs lo <= hi")
  require(bounds.grouped(2).sliding(2).forall {
    case Seq(a, b) => a(1) < b(0)
    case _ => true
  }, "in_sorted_ranges: ranges must be sorted and disjoint")

  @transient private lazy val arr: Array[Long] = bounds.toArray

  override def checkInputDataTypes(): TypeCheckResult =
    child.dataType match {
      case LongType => TypeCheckResult.TypeCheckSuccess
      case t => TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires BIGINT, got ${t.catalogString}")
    }
  override def dataType: DataType = BooleanType
  override def prettyName: String = "in_sorted_ranges"

  override protected def nullSafeEval(key: Any): Any =
    InSortedRanges.contains(arr, key.asInstanceOf[Long])

  override protected def doGenCode(ctx: CodegenContext,
                                   ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("bounds", arr, "long[]")
    nullSafeCodeGen(ctx, ev, k =>
      s"${ev.value} = graft.functions.InSortedRanges.contains($ref, $k);")
  }

  override protected def withNewChildInternal(
      newChild: Expression): InSortedRanges = copy(child = newChild)
}

object InSortedRanges {
  /** Greatest range start ≤ key by binary search over the even
    * (lo) slots, then one upper-bound check. */
  def contains(bounds: Array[Long], key: Long): Boolean = {
    var lo = 0
    var hi = bounds.length / 2 - 1
    var found = -1
    while (lo <= hi) {
      val mid = (lo + hi) >>> 1
      if (bounds(2 * mid) <= key) { found = mid; lo = mid + 1 }
      else hi = mid - 1
    }
    found >= 0 && key <= bounds(2 * found + 1)
  }
}
