package graft

import org.apache.spark.sql.functions._
import org.apache.spark.unsafe.types.UTF8String
import org.scalacheck.{Gen, Prop, Test => SCTest}
import graft.functions.{TokenSegments, WordShingles}
import graft.ops.Layout

/** Property-based checks for the pure computation kernels, against
  * independent reference implementations. Two execution shapes:
  * JVM-level kernels (TokenSegments, WordShingles) run hundreds of
  * ScalaCheck cases directly; Column-level kernels (Morton
  * interleave) evaluate MANY random rows through ONE Spark job and
  * compare against a per-row Scala reference — property coverage
  * without paying job latency per sample.
  */
class KernelPropertySpec extends SparkSpec {

  private def check(name: String, p: Prop, minOk: Int = 300): Unit = {
    val res = SCTest.check(
      SCTest.Parameters.default.withMinSuccessfulTests(minOk), p)
    assert(res.passed, s"$name failed: $res")
  }

  // text with runs of spaces, empties, unicode multi-byte chars, and
  // punctuation — the token-boundary edge cases
  private val genText: Gen[String] =
    Gen.listOf(Gen.frequency(
      3 -> Gen.const(' '),
      6 -> Gen.alphaNumChar,
      1 -> Gen.oneOf('é', '中', 'ß', '€', '!', '\t'))).map(_.mkString)

  test("TokenSegments == split/grouped/mkString reference for all inputs") {
    check("TokenSegments", Prop.forAll(genText, Gen.choose(1, 7)) {
      (s, w) =>
        val got = TokenSegments.compute(UTF8String.fromString(s), w)
          .array.map(_.toString).toSeq
        val ref = s.split(" ", -1).toSeq.grouped(w)
          .map(_.mkString(" ")).toSeq
        got == ref
    })
  }

  test("WordShingles == sliding-window reference, both modes") {
    check("WordShingles", Prop.forAll(
      genText, Gen.choose(1, 5), Gen.oneOf(true, false)) {
      (s, k, distinct) =>
        val got = WordShingles.compute(UTF8String.fromString(s), k, distinct)
          .array.map(_.toString).toSeq
        val toks = s.split(" ", -1).toSeq
        val ref0 =
          if (toks.length < k) { if (distinct) Seq(s) else Seq.empty }
          else toks.sliding(k).map(_.mkString(" ")).toSeq
        val ref = if (distinct) ref0.distinct else ref0
        got == ref
    })
  }

  test("Morton zValueN == bit-interleave reference over random grids " +
    "(one job, 500 rows, 2-4 dims)") {
    val s = spark; import s.implicits._
    val rnd = new scala.util.Random(42)
    for (d <- 2 to 4) {
      val bits = Seq(8, 6, 4)(d - 2) // keep d*bits well under 62
      val lim = 1L << bits
      val rows = Seq.fill(500)(Seq.fill(d)(rnd.nextLong().abs % lim))
      val df = rows.map(r => (r.head, r(1), if (d > 2) r(2) else 0L,
        if (d > 3) r(3) else 0L)).toDF("a", "b", "c", "e")
      val cols = Seq(col("a"), col("b"), col("c"), col("e")).take(d)
      val got = df.select(Layout.zValueN(cols, bits).as("z"))
        .as[Long].collect().toSeq
      def refZ(vals: Seq[Long]): Long =
        (for { i <- 0 until bits; j <- vals.indices }
          yield ((vals(j) >> i) & 1L) << (i * d + (d - 1 - j)))
          .foldLeft(0L)(_ | _)
      val ref = rows.map(refZ)
      assert(got == ref, s"zValueN mismatch at d=$d")
      // z-order locality invariant: distinct inputs -> distinct z
      assert(ref.distinct.size == rows.distinct.size)
    }
  }

  private def longArray(xs: Seq[Long]) =
    org.apache.spark.sql.catalyst.expressions.UnsafeArrayData
      .fromPrimitiveArray(xs.toArray)

  test("SimHashBits == per-bit vote reference; permutation- and " +
    "duplication-invariant") {
    val genHashes = Gen.listOf(Gen.choose(0L, (1L << 60) - 1))
    check("SimHashBits", Prop.forAll(genHashes, Gen.choose(1, 62)) {
      (hs, bits) =>
        val got = graft.functions.SimHashBits.compute(longArray(hs), bits)
        val ref = (0 until bits).map { j =>
          val v = hs.map(h => if (((h >> j) & 1L) != 0L) 1 else -1).sum
          if (v > 0) 1L << j else 0L
        }.foldLeft(0L)(_ | _)
        val perm = graft.functions.SimHashBits.compute(
          longArray(scala.util.Random.shuffle(hs)), bits)
        val dup = graft.functions.SimHashBits.compute(
          longArray(hs ++ hs), bits)
        got == ref && perm == got && dup == got
    }, minOk = 200)
  }

  test("NearestCentroid == argmax-dot reference with first-wins ties") {
    val genVec = Gen.choose(2, 8).flatMap(d =>
      Gen.listOfN(d, Gen.choose(-1000L, 1000L)))
    check("NearestCentroid", Prop.forAll(genVec, Gen.choose(1, 6)) {
      (v, c) =>
        val rnd = new scala.util.Random(v.hashCode * 31 + c)
        val cents = Seq.fill(c)(Seq.fill(v.length)(
          rnd.nextLong() % 1000L))
        val centsData = new org.apache.spark.sql.catalyst.util
          .GenericArrayData(cents.map(x => longArray(x): Any).toArray)
        val got = graft.functions.NearestCentroid.compute(
          longArray(v), centsData)
        val dots = cents.map(ct => v.zip(ct).map { case (a, b) => a * b }.sum)
        val ref = dots.indexOf(dots.max)
        got == ref
    }, minOk = 200)
  }

  test("GlobalIndex density holds across random key sets and bucket " +
    "counts (one job per draw, 6 draws)") {
    val s = spark; import s.implicits._
    val rnd = new scala.util.Random(7)
    for (trial <- 1 to 6) {
      val n = 50 + rnd.nextInt(300)
      // hostile ranges: negatives, far outliers, dense runs
      val keys = scala.util.Random.shuffle(
        (Seq.fill(n)(rnd.nextLong() % 100000L) ++
          Seq(Long.MinValue / 4, Long.MaxValue / 4)).distinct)
      val buckets = 1 + rnd.nextInt(32)
      val out = graft.ops.GlobalIndex
        .withGlobalIndex(keys.toDF("k"), "k", "idx", buckets)
        .select("k", "idx").as[(Long, Long)].collect().toSeq
      val sorted = out.sortBy(_._1)
      assert(sorted.map(_._2) == (1L to keys.length.toLong),
        s"trial $trial (n=${keys.length}, buckets=$buckets) not dense")
    }
  }

  // scaled components are bounded by construction: |x| ≤ 10^6
  // (Similarity.Scale), so |dot| ≤ dim·10^12 — the BigInt reference
  // proves the long accumulator never overflows ON THE ENGINE DOMAIN.
  // Do not "stress" this with wider components: at 10^9 two products
  // already exceed Long.Max, which is outside the documented envelope
  // (and sent ScalaCheck's shrinker into a multi-minute spiral when
  // this generator briefly did exactly that).
  test("DotScaled == BigInt reference over the scaled domain " +
    "(equal dims; ragged dims fail loud)") {
    // pair generator yields EQUAL lengths — ragged input is no longer
    // a value-producing path (it throws, the fail-loud contract below)
    val genPair = Gen.choose(1, 128).flatMap { n =>
      Gen.zip(Gen.listOfN(n, Gen.choose(-1000000L, 1000000L)),
        Gen.listOfN(n, Gen.choose(-1000000L, 1000000L)))
    }
    check("DotScaled", Prop.forAll(genPair) { case (a, b) =>
      val got = graft.functions.DotScaled.compute(
        org.apache.spark.sql.catalyst.util.ArrayData.toArrayData(a.toArray),
        org.apache.spark.sql.catalyst.util.ArrayData.toArrayData(b.toArray))
      val ref = a.zip(b).map { case (x, y) => BigInt(x) * BigInt(y) }.sum
      BigInt(got) == ref
    })
    intercept[IllegalArgumentException] {
      graft.functions.DotScaled.compute(
        org.apache.spark.sql.catalyst.util.ArrayData.toArrayData(
          Array(1L, 2L)),
        org.apache.spark.sql.catalyst.util.ArrayData.toArrayData(
          Array(1L)))
    }
  }

  test("DotInt8 == BigInt reference over the code domain " +
    "(equal dims; ragged dims fail loud)") {
    val genPair = Gen.choose(1, 128).flatMap { n =>
      Gen.zip(Gen.listOfN(n, Gen.choose(-127, 127)),
        Gen.listOfN(n, Gen.choose(-127, 127)))
    }
    check("DotInt8", Prop.forAll(genPair) { case (a, b) =>
      val got = graft.functions.DotInt8.compute(
        org.apache.spark.sql.catalyst.util.ArrayData.toArrayData(a.toArray),
        org.apache.spark.sql.catalyst.util.ArrayData.toArrayData(b.toArray))
      val ref = a.zip(b).map { case (x, y) => BigInt(x) * BigInt(y) }.sum
      BigInt(got) == ref
    })
    intercept[IllegalArgumentException] {
      graft.functions.DotInt8.compute(
        org.apache.spark.sql.catalyst.util.ArrayData.toArrayData(
          Array(1, 2)),
        org.apache.spark.sql.catalyst.util.ArrayData.toArrayData(
          Array(1)))
    }
  }

  test("groupedAuc == per-group Scala reference across random tied " +
    "score sets (one job, 40 groups)") {
    val s = spark; import s.implicits._
    val rnd = new scala.util.Random(13)
    // small score alphabets force heavy ties — the hard case
    val rows = (1 to 40).flatMap { g =>
      val n = 5 + rnd.nextInt(60)
      (1 to n).map(_ => (g, rnd.nextInt(1 + rnd.nextInt(8)).toDouble,
        rnd.nextBoolean()))
    }
    val got = graft.ops.Eval.groupedAuc(
      rows.toDF("g", "s", "y"), col("g"), col("s"), col("y"))
      .collect().map(r => r.getInt(0) -> r.getLong(3)).toMap
    // reference: pairwise U with half-credit ties, floor to milli
    val ref = rows.groupBy(_._1).flatMap { case (g, rs) =>
      val pos = rs.filter(_._3).map(_._2); val neg = rs.filterNot(_._3).map(_._2)
      if (pos.isEmpty || neg.isEmpty) None
      else {
        val u2 = (for (p <- pos; q <- neg) yield
          if (p > q) 2L else if (p == q) 1L else 0L).sum
        Some(g -> (1000L * u2) / (2L * pos.size * neg.size))
      }
    }
    assert(got == ref, s"AUC mismatch: ${got.toSeq.sorted.take(5)} vs " +
      s"${ref.toSeq.sorted.take(5)}")
  }

  test("mixturePlan invariants hold across random scenarios " +
    "(8 draws, one job each)") {
    val s = spark; import s.implicits._
    val rnd = new scala.util.Random(29)
    for (trial <- 1 to 8) {
      val nDom = 2 + rnd.nextInt(10)
      val avail = (0 until nDom).map(k =>
        (s"d$k", rnd.nextInt(5000).toLong))
      val weights = (0 until nDom).map(k =>
        (s"d$k", 1L + rnd.nextInt(500)))
      val budget = rnd.nextInt(20000).toLong
      val out = graft.ops.Sampling.mixturePlan(
        avail.toDF("domain", "n"), "domain", "n",
        weights.toDF("domain", "weight_milli"), budget)
        .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(3),
          r.getInt(4))).toSeq
      val total = out.map(_._3).sum
      assert(out.forall(r => r._3 <= r._2), s"trial $trial: alloc > avail")
      assert(total <= budget, s"trial $trial: over budget")
      // exactness: if nothing capped, allocations sum EXACTLY to budget
      if (out.forall(_._4 == 0))
        assert(total == budget,
          s"trial $trial: uncapped plan must sum to budget ($total != $budget)")
    }
  }
}
