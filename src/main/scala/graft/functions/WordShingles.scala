package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Native word-k-gram shingles. Semantics identical to the HOF
  * formulation it replaces (split on single space keeping empties,
  * texts shorter than k words yield the whole text as the one shingle,
  * distinct keeps first occurrence — [[graft.ops.Dedup.shingles]])
  * and to the DuckDB mirror. `distinct = false` keeps every
  * occurrence in order — the frequency-work variant
  * ([[graft.ops.TextOps.bigrams]]): an interpreted
  * `transform(sequence(...), i -> concat_ws(element_at...))` build
  * re-evaluates the inlined `split` per lambda element after
  * CollapseProject (O(tokens²) per row — the same pathology measured
  * on the minhash path), where this stays one codegen'd pass.
  *
  * Two structural wins over the built-in pipeline (split + transform
  * + slice + concat_ws + array_distinct, interpreted per element):
  * every shingle between single-space-separated tokens is a CONTIGUOUS
  * byte range of the input, so k-grams are zero-copy slices (a space
  * byte can never occur inside a multi-byte UTF-8 sequence, making
  * byte scanning safe), and the whole build is one pass behind a
  * static call inside whole-stage codegen. */
case class WordShingles(child: Expression, k: Int,
                        distinct: Boolean = true)
    extends UnaryExpression {

  require(k >= 1, "shingle size must be positive")

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires STRING, got ${other.catalogString}")
  }
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def prettyName: String = "word_shingles"

  override protected def nullSafeEval(input: Any): Any =
    WordShingles.compute(input.asInstanceOf[UTF8String], k, distinct)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.WordShingles.compute($c, $k, $distinct);")

  override protected def withNewChildInternal(newChild: Expression): WordShingles =
    copy(child = newChild)
}

object WordShingles {
  def compute(text: UTF8String, k: Int,
              distinct: Boolean = true): GenericArrayData = {
    val b = text.getBytes
    // token boundaries: split on ' ' keeping empty tokens (matches
    // split(text, " ") exactly, including consecutive/trailing spaces)
    val starts = scala.collection.mutable.ArrayBuffer[Int](0)
    var i = 0
    while (i < b.length) {
      if (b(i) == ' ') starts += i + 1
      i += 1
    }
    val n = starts.length // number of tokens
    if (n < k) {
      // distinct (dedup family): degenerate short doc IS its one
      // shingle. Non-distinct (frequency work): a doc with fewer than
      // k tokens has zero k-gram occurrences — an empty list, so
      // callers need no external guard (and pay no second split).
      return if (distinct) new GenericArrayData(Array[Any](text))
      else new GenericArrayData(Array.empty[Any])
    }
    def tokenEnd(t: Int): Int =
      if (t == n - 1) b.length else starts(t + 1) - 1
    if (distinct) {
      val seen = new java.util.LinkedHashSet[UTF8String]()
      var t = 0
      while (t <= n - k) {
        val from = starts(t)
        val until = tokenEnd(t + k - 1)
        seen.add(UTF8String.fromBytes(b, from, until - from))
        t += 1
      }
      val out = new Array[Any](seen.size)
      val it = seen.iterator()
      var j = 0
      while (it.hasNext) { out(j) = it.next(); j += 1 }
      new GenericArrayData(out)
    } else {
      val out = new Array[Any](n - k + 1)
      var t = 0
      while (t <= n - k) {
        val from = starts(t)
        val until = tokenEnd(t + k - 1)
        out(t) = UTF8String.fromBytes(b, from, until - from)
        t += 1
      }
      new GenericArrayData(out)
    }
  }
}
