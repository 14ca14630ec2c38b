package graft

import org.apache.spark.sql.functions._
import graft.functions.{HyperplaneBuckets, NearestCentroid, SimHashBits}
import graft.ops.Dedup

/** The native Catalyst expressions are load-bearing (every LSH/dedup
  * query runs through them): pin their semantics against independent
  * reference implementations and exercise the codegen path + null
  * handling through real DataFrames. */
class FunctionsSpec extends SparkSpec {

  // ---- WordShingles ----------------------------------------------------

  /** Reference implementation: the pre-native HOF semantics
    * (split on single space keeping empties; short text → whole text;
    * distinct keeps first occurrence). */
  private def refShingles(text: String, k: Int): Seq[String] = {
    val toks = text.split(" ", -1).toSeq
    if (toks.length < k) Seq(text)
    else toks.sliding(k).map(_.mkString(" ")).toSeq.distinct
  }

  private def shinglesOf(text: String, k: Int): Seq[String] = {
    val s = spark; import s.implicits._
    Seq(text).toDF("t")
      .select(Dedup.shingles(col("t"), k).as("sh"))
      .head().getSeq[String](0)
  }

  test("shingles: basics, short text, consecutive spaces, dedup") {
    assert(shinglesOf("a b c d", 3) == Seq("a b c", "b c d"))
    assert(shinglesOf("a b", 3) == Seq("a b"))
    assert(shinglesOf("", 3) == Seq(""))
    assert(shinglesOf("a  b c", 3) == Seq("a  b", " b c"))
    assert(shinglesOf("x x x x", 3) == Seq("x x x"))
  }

  test("shingles match the reference semantics on random token streams (seeded property)") {
    val rnd = new scala.util.Random(42)
    (1 to 40).foreach { _ =>
      val toks = Seq.fill(rnd.nextInt(10))(
        if (rnd.nextInt(4) == 0) "" else rnd.alphanumeric.take(1 + rnd.nextInt(4)).mkString)
      val text = toks.mkString(" ")
      val k = 1 + rnd.nextInt(4)
      assert(shinglesOf(text, k) == refShingles(text, k), s"text='$text' k=$k")
    }
  }

  test("null text yields null shingles through the codegen path") {
    val s = spark; import s.implicits._
    val out = Seq(Option.empty[String]).toDF("t")
      .select(Dedup.shingles(col("t"), 3).as("sh")).head()
    assert(out.isNullAt(0))
  }

  test("non-distinct mode keeps every occurrence in order") {
    val s = spark; import s.implicits._
    import org.apache.spark.sql.graftbridge.Bridge
    def ngrams(text: String, k: Int): Seq[String] =
      Seq(text).toDF("t").select(Bridge.column(
          graft.functions.WordShingles(Bridge.expression(col("t")), k,
            distinct = false)).as("sh"))
        .head().getSeq[String](0)
    assert(ngrams("x x x x", 3) == Seq("x x x", "x x x"))
    assert(ngrams("a b a b", 2) == Seq("a b", "b a", "a b"))
    // frequency semantics: a doc with < k tokens has ZERO k-gram
    // occurrences (unlike the distinct/dedup convention of [text])
    assert(ngrams("a b", 3) == Seq.empty)
    assert(ngrams("solo", 2) == Seq.empty)
    // count parity with the distinct build's source positions
    val rnd = new scala.util.Random(7)
    (1 to 20).foreach { _ =>
      val toks = Seq.fill(2 + rnd.nextInt(8))(s"w${rnd.nextInt(3)}")
      val text = toks.mkString(" ")
      val got = ngrams(text, 2)
      assert(got == toks.sliding(2).map(_.mkString(" ")).toSeq,
        s"text='$text'")
    }
  }

  // ---- HyperplaneBuckets ----------------------------------------------

  /** Independent mirror of the plane-weight mix + sign packing. */
  private def refBuckets(v: Seq[Long], planes: Int, tables: Int): Seq[Long] =
    (0 until tables).map { t =>
      (0 until planes).map { j =>
        val p = t * planes + j
        val proj = v.zipWithIndex.map { case (x, d) =>
          val mixed = (d.toLong * 2654435761L + p.toLong * 40503L + 104729L) % 1000003L
          x * ((mixed % 2001L) - 1000L)
        }.sum
        if (proj > 0) 1L << j else 0L
      }.sum
    }

  test("hyperplane buckets match the reference arithmetic (seeded property)") {
    val s = spark; import s.implicits._
    val rnd = new scala.util.Random(7)
    val vecs = Seq.fill(20)(Seq.fill(8)(rnd.nextLong() % 1000000L))
    val got = vecs.toDF("v")
      .select(org.apache.spark.sql.graftbridge.Bridge.column(
        HyperplaneBuckets(
          org.apache.spark.sql.graftbridge.Bridge.expression(col("v")),
          8, 4)).as("b"))
      .collect().map(_.getSeq[Long](0))
    vecs.zip(got).foreach { case (v, g) =>
      assert(g == refBuckets(v, 8, 4), s"vec=$v")
    }
  }

  // ---- SimHashBits -----------------------------------------------------

  private def refSimhash(hs: Seq[Long], bits: Int): Long =
    (0 until bits).map { j =>
      val vote = hs.map(h => if (((h >> j) & 1L) != 0) 1 else -1).sum
      if (vote > 0) 1L << j else 0L
    }.sum

  test("simhash bits match the reference vote-and-pack (seeded property)") {
    val s = spark; import s.implicits._
    val rnd = new scala.util.Random(11)
    val lists = Seq.fill(20)(
      Seq.fill(rnd.nextInt(30))(rnd.nextLong().abs % (1L << 60)))
    val got = lists.toDF("h")
      .select(org.apache.spark.sql.graftbridge.Bridge.column(
        SimHashBits(
          org.apache.spark.sql.graftbridge.Bridge.expression(col("h")),
          60)).as("s"))
      .collect().map(_.getLong(0))
    lists.zip(got).foreach { case (hs, g) =>
      assert(g == refSimhash(hs, 60), s"hashes=$hs")
    }
  }

  // ---- SQL registration (SparkSessionExtensions) -----------------------

  test("the native expressions are callable from SQL") {
    val sh = spark.sql("SELECT word_shingles('a b c d', 3) AS sh")
      .head().getSeq[String](0)
    assert(sh == Seq("a b c", "b c d"))
    val sim = spark.sql("SELECT simhash_bits(array(1L, 3L, 3L), 2) AS s")
      .head().getLong(0)
    assert(sim == 3L) // bit0 votes +3, bit1 votes +1 → both set
    val hb = spark.sql(
      "SELECT hyperplane_buckets(array(1000000L, -500000L), 8, 4) AS b")
      .head().getSeq[Long](0)
    assert(hb == refBuckets(Seq(1000000L, -500000L), 8, 4))
    val nc = spark.sql(
      "SELECT nearest_centroid(array(5L, 1L), array(array(1L, 0L), array(0L, 1L))) AS c")
      .head().getInt(0)
    assert(nc == 0)
    // 'ab' ×2 at weight 2, 'cd' ×1 at weight 1 → score 5; second
    // profile counts 'zz' → 0
    val tg = spark.sql(
      "SELECT trigram_scores('ab ab cd', array(array('ab','cd'), array('zz'))) AS t")
      .head().getSeq[Long](0)
    assert(tg == Seq(5L, 0L))
    val l2 = spark.sql(
      "SELECT nearest_centroid_l2(array(2L, 2L), " +
        "array(array(2L, 0L), array(2L, 3L))) AS c")
      .head().getInt(0)
    assert(l2 == 1) // dists 4 vs 1
    // books: sub0 {(1,0),(0,1)}, sub1 {(2,2),(5,0)}; query (3,4,10,1)
    // → lut [3,4,22,50]; codes (1,0) pick lut[1]=4 and lut[2]=22
    val adc = spark.sql(
      "SELECT pq_adc(pq_lut(array(3L, 4L, 10L, 1L), " +
        "array(array(array(1L, 0L), array(0L, 1L)), " +
        "array(array(2L, 2L), array(5L, 0L)))), array(1, 0)) AS s")
      .head().getLong(0)
    assert(adc == 26L)
  }

  // ---- NearestCentroid -------------------------------------------------

  test("nearest centroid: argmax with lowest-index tie-break") {
    val s = spark; import s.implicits._
    val cents = typedLit(Seq(Seq(1L, 0L), Seq(0L, 1L), Seq(1L, 0L)))
    def assignOf(v: Seq[Long]): Int =
      Seq(v).toDF("v")
        .select(org.apache.spark.sql.graftbridge.Bridge.column(
          NearestCentroid(
            org.apache.spark.sql.graftbridge.Bridge.expression(col("v")),
            org.apache.spark.sql.graftbridge.Bridge.expression(cents)))
          .as("c"))
        .head().getInt(0)
    assert(assignOf(Seq(5L, 1L)) == 0)  // dot: 5,1,5 → first max wins
    assert(assignOf(Seq(1L, 5L)) == 1)
    assert(assignOf(Seq(3L, 3L)) == 0)  // tie across all → lowest index
  }
}
