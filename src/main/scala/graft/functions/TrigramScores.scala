package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Native language-ID scoring: every profile's rank-weighted trigram
  * counts over ONE pass per pattern across the text bytes, in a
  * single expression evaluation.
  *
  * The Column formulation costs one `replace` per trigram — 30 full
  * scans each allocating a rewritten copy of the text per row. This
  * computes the identical numbers (non-overlapping counts — advance by
  * the pattern length on match, exactly `replace`'s semantics; none of
  * the profiles self-overlap, and ASCII patterns cannot start
  * mid-codepoint in UTF-8, so byte matching equals the oracle's
  * char-length arithmetic) with zero allocations beyond the output
  * array. Input must already be lowercased (compose with `lower`).
  * Same codegen discipline as [[SimHashBits]]: tight primitive loops
  * behind one static call inside whole-stage codegen.
  *
  * Output: ARRAY<BIGINT> of scores, one per profile, in input order.
  */
case class TrigramScores(child: Expression, profiles: Seq[Seq[String]])
    extends UnaryExpression {

  require(profiles.nonEmpty && profiles.forall(_.nonEmpty),
    "profiles must be non-empty")
  require(profiles.forall(_.forall(_.forall(_ < 0x80))),
    "profiles must be ASCII so byte matching equals char matching")

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires STRING, got ${other.catalogString}")
  }
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "trigram_scores"

  @transient private lazy val compiled: Array[Array[Array[Byte]]] =
    profiles.map(_.map(_.getBytes("UTF-8")).toArray).toArray

  override protected def nullSafeEval(input: Any): Any =
    TrigramScores.compute(input.asInstanceOf[UTF8String], compiled)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("trigramProfiles", compiled, "byte[][][]")
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.TrigramScores.compute($c, $ref);")
  }

  override protected def withNewChildInternal(newChild: Expression): TrigramScores =
    copy(child = newChild)
}

object TrigramScores {
  def compute(s: UTF8String, profiles: Array[Array[Array[Byte]]]): ArrayData = {
    val bytes = s.getBytes
    val out = new Array[Long](profiles.length)
    var l = 0
    while (l < profiles.length) {
      val trigs = profiles(l)
      val n = trigs.length
      var score = 0L
      var t = 0
      while (t < n) {
        val pat = trigs(t)
        val plen = pat.length
        val limit = bytes.length - plen
        var cnt = 0L
        var i = 0
        while (i <= limit) {
          var j = 0
          while (j < plen && bytes(i + j) == pat(j)) j += 1
          if (j == plen) { cnt += 1; i += plen } else i += 1
        }
        score += (n - t).toLong * cnt // rank weight, same as the SQL
        t += 1
      }
      out(l) = score
      l += 1
    }
    new GenericArrayData(out)
  }
}
