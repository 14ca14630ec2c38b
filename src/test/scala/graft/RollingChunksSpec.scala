package graft

import org.scalacheck.{Gen, Prop, Test => SCTest}
import graft.functions.RollingChunks
import graft.queries.BinaryQueries

/** Content-defined chunking: partition/bounds invariants over random
  * inputs, and the locality properties that make CDC worth having —
  * an insertion or edit disturbs only nearby chunks.
  */
class RollingChunksSpec extends SparkSpec {

  private val W = 16; private val D = 256
  private val MinL = 64; private val MaxL = 1024

  private def chunksOf(bytes: Array[Byte]): Seq[(Long, Long, String)] =
    RollingChunks.compute(bytes, W, D, MinL, MaxL).array.toSeq.map { a =>
      val r = a.asInstanceOf[org.apache.spark.sql.catalyst.InternalRow]
      (r.getLong(0), r.getLong(1), r.getUTF8String(2).toString)
    }

  test("chunks exactly partition the input; every non-tail chunk in " +
    "[minLen, maxLen], tail in [1, maxLen]") {
    val p = Prop.forAll(Gen.choose(0, 6000), Gen.choose(0L, 1L << 62)) {
      (n, seed) =>
        val rnd = new scala.util.Random(seed)
        val bytes = Array.fill(n)(rnd.nextInt().toByte)
        val cs = chunksOf(bytes)
        val partitions = cs.foldLeft((true, 0L)) {
          case ((ok, expect), (off, len, _)) =>
            (ok && off == expect && len >= 1, off + len)
        }
        val bounds = cs.dropRight(1).forall(c =>
          c._2 >= MinL && c._2 <= MaxL) &&
          cs.lastOption.forall(_._2 <= MaxL)
        (n == 0 && cs.isEmpty) ||
          (partitions._1 && partitions._2 == n.toLong && bounds)
    }
    val res = SCTest.check(
      SCTest.Parameters.default.withMinSuccessfulTests(80), p)
    assert(res.passed, res.toString)
  }

  test("shift resistance: a 101-byte inserted prefix leaves most " +
    "chunk hashes intact at shifted offsets") {
    val base = BinaryQueries.blobBytes(3, 4000)
    val shifted = BinaryQueries.blobBytes(77, 101) ++ base
    val a = chunksOf(base).map(_._3)
    val b = chunksOf(shifted).map(_._3)
    val shared = a.toSet.intersect(b.toSet).size
    assert(shared >= (a.size * 6) / 10,
      s"only $shared of ${a.size} chunk hashes survived the prefix " +
        "insertion — boundaries failed to re-synchronize")
    // and fixed-offset chunking would share NOTHING: every aligned
    // 256-byte slice differs once the stream is shifted by 101
    val fixedA = base.grouped(256).map(_.toSeq).toSet
    val fixedB = shifted.grouped(256).map(_.toSeq).toSet
    assert(fixedA.intersect(fixedB).isEmpty)
  }

  test("a single-byte edit disturbs at most the chunks overlapping " +
    "its window") {
    val base = BinaryQueries.blobBytes(5, 5000)
    val edited = base.clone(); edited(2500) = (edited(2500) ^ 0x5A).toByte
    val a = chunksOf(base)
    val b = chunksOf(edited)
    val onlyA = a.map(_._3).diff(b.map(_._3))
    val onlyB = b.map(_._3).diff(a.map(_._3))
    assert(onlyA.size <= 3 && onlyB.size <= 3,
      s"edit blast radius too wide: ${onlyA.size}/${onlyB.size}")
    // chunks before the edit are byte-identical INCLUDING offsets
    assert(a.takeWhile(c => c._1 + c._2 <= 2500) ==
      b.takeWhile(c => c._1 + c._2 <= 2500))
  }

  test("sub-minLen input is one tail chunk; empty input is no chunks") {
    assert(chunksOf(Array.empty[Byte]).isEmpty)
    val tiny = chunksOf(BinaryQueries.blobBytes(99, 40))
    assert(tiny.map(c => (c._1, c._2)) == Seq((0L, 40L)))
  }
}
