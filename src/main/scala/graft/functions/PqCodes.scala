package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._

/** Product-quantization primitives — the three per-row loops PQ needs,
  * each a native codegen expression in the [[NearestCentroid]] /
  * [[DotScaled]] discipline (static JIT-friendly compute, exact int64
  * arithmetic, no HOF lambda dispatch in the hot path):
  *
  *  - [[NearestCentroidL2]]: argmin squared-L2 sub-vector assignment
  *    (PQ quantizes by Euclidean distortion, NOT the spherical argmax
  *    dot of IVF assignment — renormalizing sub-vectors would destroy
  *    the magnitudes ADC reconstruction depends on);
  *  - [[PqLut]]: the per-QUERY lookup table — dot of each query
  *    sub-vector against every centroid of its sub-space, flattened
  *    to m·k longs, computed ONCE per query row;
  *  - [[PqAdc]]: asymmetric-distance scoring — per (query, code) pair
  *    just m table lookups + adds, the loop that runs N·Q times and
  *    is the whole point of PQ: the corpus side touches only m-byte
  *    codes, never the 4·dim-byte vectors.
  */
case class NearestCentroidL2(left: Expression, right: Expression)
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
  override def prettyName: String = "nearest_centroid_l2"

  override protected def nullSafeEval(vec: Any, cents: Any): Any =
    NearestCentroidL2.compute(vec.asInstanceOf[ArrayData],
      cents.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (v, c) =>
      s"${ev.value} = graft.functions.NearestCentroidL2.compute($v, $c);")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): NearestCentroidL2 =
    copy(left = newLeft, right = newRight)
}

object NearestCentroidL2 {
  /** Index of the centroid at minimal exact squared L2 distance
    * (ties → lowest index). Components are scaled ints ≤ 10^6, so a
    * squared diff is ≤ 4·10^12 and even 1000-dim sums sit far inside
    * int64. */
  def compute(vec: ArrayData, cents: ArrayData): Int = {
    val dim = vec.numElements()
    val c = cents.numElements()
    // reachable from the public SQL surface: an empty centroid list
    // must be a typed error, not a valid-looking index 0 (ADVICE r11)
    if (c == 0)
      throw new IllegalArgumentException(
        "nearest_centroid_l2: empty centroid list")
    var best = 0
    var bestDist = Long.MaxValue
    var i = 0
    while (i < c) {
      val cent = cents.getArray(i)
      var dist = 0L
      var d = 0
      while (d < dim) {
        val diff = vec.getLong(d) - cent.getLong(d)
        dist += diff * diff
        d += 1
      }
      if (dist < bestDist) { bestDist = dist; best = i }
      i += 1
    }
    best
  }
}

case class PqLut(left: Expression, right: Expression)
    extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(LongType, _),
            ArrayType(ArrayType(ArrayType(LongType, _), _), _)) =>
        TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires (ARRAY<BIGINT>, " +
          s"ARRAY<ARRAY<ARRAY<BIGINT>>>), " +
          s"got (${l.catalogString}, ${r.catalogString})")
    }
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "pq_lut"

  override protected def nullSafeEval(vec: Any, books: Any): Any =
    PqLut.compute(vec.asInstanceOf[ArrayData], books.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (v, b) =>
      s"${ev.value} = graft.functions.PqLut.compute($v, $b);")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): PqLut =
    copy(left = newLeft, right = newRight)
}

object PqLut {
  /** lut[s·k + j] = dot(query sub-vector s, books[s][j]). The books
    * literal defines the split: m sub-spaces of the centroids' own
    * width; a query whose length isn't m·dsub is a hard error (a
    * silent misread would score garbage). */
  def compute(vec: ArrayData, books: ArrayData): GenericArrayData = {
    val m = books.numElements()
    // loud typed errors on degenerate books — pq_lut(v, array()) is
    // reachable from SQL and must not surface as a raw out-of-bounds
    // (ADVICE r11)
    if (m == 0)
      throw new IllegalArgumentException("pq_lut: empty codebook list")
    if (books.getArray(0).numElements() == 0)
      throw new IllegalArgumentException(
        "pq_lut: sub-space 0 has no centroids")
    val k = books.getArray(0).numElements()
    val dsub = books.getArray(0).getArray(0).numElements()
    if (vec.numElements() != m * dsub)
      throw new IllegalArgumentException(
        s"pq_lut: query dim ${vec.numElements()} != m*dsub = ${m * dsub}")
    val out = new Array[Long](m * k)
    var s = 0
    while (s < m) {
      val book = books.getArray(s)
      val base = s * dsub
      var j = 0
      while (j < k) {
        val cent = book.getArray(j)
        var dot = 0L
        var d = 0
        while (d < dsub) {
          dot += vec.getLong(base + d) * cent.getLong(d)
          d += 1
        }
        out(s * k + j) = dot
        j += 1
      }
      s += 1
    }
    new GenericArrayData(out)
  }
}

case class PqAdc(left: Expression, right: Expression)
    extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(LongType, _), ArrayType(IntegerType, _)) =>
        TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires (ARRAY<BIGINT> lut, ARRAY<INT> codes), " +
          s"got (${l.catalogString}, ${r.catalogString})")
    }
  override def dataType: DataType = LongType
  override def prettyName: String = "pq_adc"

  override protected def nullSafeEval(lut: Any, codes: Any): Any =
    PqAdc.compute(lut.asInstanceOf[ArrayData], codes.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (l, c) =>
      s"${ev.value} = graft.functions.PqAdc.compute($l, $c);")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): PqAdc =
    copy(left = newLeft, right = newRight)
}

object PqAdc {
  /** Σ_s lut[s·k + codes[s]] — the approximate scaled dot product of
    * the query against the code's reconstruction, m lookups + adds.
    * k is derived (lut carries m·k entries for codes' m), so the two
    * arrays are self-describing together; a code outside [0, k) is a
    * hard error, not a misread. */
  def compute(lut: ArrayData, codes: ArrayData): Long = {
    val m = codes.numElements()
    // SQL-reachable degenerate shapes fail typed: an empty code list
    // has no k to derive, and a lut that isn't a whole number of
    // k-strides means the two arrays disagree on geometry (ADVICE r11)
    if (m == 0)
      throw new IllegalArgumentException("pq_adc: empty code list")
    if (lut.numElements() % m != 0)
      throw new IllegalArgumentException(
        s"pq_adc: lut length ${lut.numElements()} is not a multiple " +
          s"of the codes' m=$m")
    val k = lut.numElements() / m
    var sum = 0L
    var s = 0
    while (s < m) {
      val code = codes.getInt(s)
      if (code < 0 || code >= k)
        throw new IllegalArgumentException(
          s"pq_adc: code $code outside [0, $k) at sub-space $s")
      sum += lut.getLong(s * k + code)
      s += 1
    }
    sum
  }
}
