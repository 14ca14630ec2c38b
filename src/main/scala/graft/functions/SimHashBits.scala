package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/** Native SimHash vote-and-pack: bit j of the signature is the sign of
  * Σ_h (2·bit_j(h) − 1) over the feature-hash array. Identical
  * arithmetic to the interpreted fold it replaces
  * ([[graft.ops.Dedup.simhash]] r4 history) and to the DuckDB mirror
  * ([[graft.ops.Dedup.simhashFromHashesSql]]); the feature hashing
  * itself (md5-derived 60-bit values) stays in built-in expressions.
  * Same rationale as [[HyperplaneBuckets]]: the HOF fold costs
  * features×bits interpreted lambda dispatches per row; this is two
  * tight primitive loops behind one static call inside whole-stage
  * codegen. */
case class SimHashBits(child: Expression, bits: Int)
    extends UnaryExpression {

  require(bits >= 1 && bits <= 62, "signature must fit a long")

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(LongType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires ARRAY<BIGINT>, got ${other.catalogString}")
  }
  override def dataType: DataType = LongType
  override def prettyName: String = "simhash_bits"

  override protected def nullSafeEval(input: Any): Any =
    SimHashBits.compute(input.asInstanceOf[ArrayData], bits)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.SimHashBits.compute($c, $bits);")

  override protected def withNewChildInternal(newChild: Expression): SimHashBits =
    copy(child = newChild)
}

object SimHashBits {
  def compute(hashes: ArrayData, bits: Int): Long = {
    val votes = new Array[Int](bits)
    val n = hashes.numElements()
    var i = 0
    while (i < n) {
      val h = hashes.getLong(i)
      var j = 0
      while (j < bits) {
        if (((h >> j) & 1L) != 0L) votes(j) += 1 else votes(j) -= 1
        j += 1
      }
      i += 1
    }
    var sig = 0L
    var j = 0
    while (j < bits) {
      if (votes(j) > 0) sig |= (1L << j)
      j += 1
    }
    sig
  }
}
