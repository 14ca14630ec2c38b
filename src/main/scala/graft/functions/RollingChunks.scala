package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Content-defined chunking (CDC): split a byte stream at
  * rolling-hash boundaries instead of fixed offsets, so an insertion
  * near the start of a file shifts only the chunks it touches — every
  * later boundary re-synchronizes because the cut decision depends
  * ONLY on the last `window` bytes. Chunk-level dedup over the
  * resulting content hashes is how blob corpora (crawl archives,
  * image/video dumps) dedupe shared regions that whole-file checksums
  * can't see and that byte-offset chunking destroys.
  *
  * Boundary rule (polynomial Rabin over a sliding window):
  * h_i = (h_{i-1}·A + b_i) mod M with the outgoing byte removed once
  * the window fills; cut AFTER byte i when the chunk has at least
  * `minLen` bytes and h_i ≡ 0 (mod D), or unconditionally at
  * `maxLen`; the remainder is the tail chunk. The hash is NOT reset
  * at cuts — locality is the whole point. All arithmetic is exact
  * integer mod 1e9+7, replayable in ANSI SQL: the DuckDB oracle
  * re-walks the same bytes with a recursive CTE carrying (h, start).
  *
  * Per chunk: (offset, len, md5 of the chunk's UPPERCASE HEX — hex,
  * not raw bytes, because DuckDB's md5 is VARCHAR-only and a blob
  * cast would choke on non-UTF8; both engines hash the same string).
  * Empty input yields an empty array. One interpreted pass per row
  * behind a static call — the WordShingles/TokenSegments discipline.
  */
case class RollingChunks(child: Expression, window: Int, divisor: Int,
                         minLen: Int, maxLen: Int)
    extends UnaryExpression {

  require(window >= 2 && window <= 256, s"window out of range: $window")
  require(divisor >= 2, s"divisor must be >= 2: $divisor")
  require(minLen >= window && maxLen > minLen,
    s"need window <= minLen < maxLen: $window/$minLen/$maxLen")

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case BinaryType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires BINARY, got ${other.catalogString}")
  }
  override def dataType: DataType = ArrayType(StructType(Seq(
    StructField("offset", LongType, nullable = false),
    StructField("len", LongType, nullable = false),
    StructField("chunk_md5", StringType, nullable = false))),
    containsNull = false)
  override def prettyName: String = "rolling_chunks"

  override protected def nullSafeEval(input: Any): Any =
    RollingChunks.compute(input.asInstanceOf[Array[Byte]],
      window, divisor, minLen, maxLen)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.RollingChunks.compute(" +
        s"$c, $window, $divisor, $minLen, $maxLen);")

  override protected def withNewChildInternal(newChild: Expression): RollingChunks =
    copy(child = newChild)
}

object RollingChunks {
  val A = 257L
  val M = 1000000007L
  private val HexChars = "0123456789ABCDEF".toCharArray

  def compute(bytes: Array[Byte], window: Int, divisor: Int,
              minLen: Int, maxLen: Int): GenericArrayData = {
    val n = bytes.length
    if (n == 0) return new GenericArrayData(Array.empty[Any])
    // A^(window-1) mod M, for removing the outgoing byte
    var pow = 1L
    var p = 0
    while (p < window - 1) { pow = pow * A % M; p += 1 }
    val out = scala.collection.mutable.ArrayBuffer[Any]()
    def emit(start: Int, end: Int): Unit = { // [start, end] inclusive
      val len = end - start + 1
      val hex = new Array[Byte](2 * len)
      var j = 0
      while (j < len) {
        val b = bytes(start + j) & 0xFF
        hex(2 * j) = HexChars(b >> 4).toByte
        hex(2 * j + 1) = HexChars(b & 0xF).toByte
        j += 1
      }
      val md = java.security.MessageDigest.getInstance("MD5").digest(hex)
      val sb = new java.lang.StringBuilder(32)
      md.foreach(x => sb.append(f"${x & 0xFF}%02x"))
      out += InternalRow(start.toLong, len.toLong,
        UTF8String.fromString(sb.toString))
    }
    var h = 0L
    var cstart = 0
    var i = 0
    while (i < n) {
      val b = (bytes(i) & 0xFF).toLong
      if (i >= window) {
        val outgoing = (bytes(i - window) & 0xFF).toLong
        h = (h - outgoing * pow % M + M) % M
      }
      h = (h * A + b) % M
      val len = i - cstart + 1
      if ((len >= minLen && h % divisor == 0L) || len >= maxLen) {
        emit(cstart, i)
        cstart = i + 1
      }
      i += 1
    }
    if (cstart < n) emit(cstart, n - 1)
    new GenericArrayData(out.toArray)
  }
}
