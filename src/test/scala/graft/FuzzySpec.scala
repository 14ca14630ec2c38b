package graft

import org.apache.spark.sql.functions._
import graft.ops.Fuzzy

/** Blocked-Levenshtein semantics: exact distances inside a block, the
  * documented blocking contract at its boundaries, the prefix bound,
  * and the skew cap. */
class FuzzySpec extends SparkSpec {

  private def pairs(rows: Seq[(Long, String)],
                    prefixLen: Int = 64, lenBand: Int = 16,
                    maxDist: Int = 8, maxBucket: Option[Int] = None) = {
    val s = spark; import s.implicits._
    Fuzzy.editDistancePairs(rows.toDF("id", "text"), col("id"),
        col("text"), prefixLen, lenBand, maxDist, maxBucket)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2)))
      .toSet
  }

  test("finds in-block pairs with the exact edit distance") {
    val out = pairs(Seq(
      1L -> "alpha beta gamma delta",
      2L -> "alpha beta gamma delte",   // 1 substitution
      3L -> "alpha beta gXmma dYlta",   // 2 substitutions vs doc 1
      4L -> "totally different words here"))
    assert(out.contains((1L, 2L, 1)), s"missing the distance-1 pair: $out")
    assert(out.contains((1L, 3L, 2)), s"missing the distance-2 pair: $out")
    assert(out.contains((2L, 3L, 3)), s"missing the 2-vs-3 pair: $out")
    assert(!out.exists(p => p._1 == 4L || p._2 == 4L),
      "unrelated doc must not pair")
  }

  test("pairs beyond maxDist are excluded via the thresholded variant") {
    val out = pairs(Seq(
      1L -> "alpha beta gamma delta",
      2L -> "alpha AAAA BBBB CCCCC"),   // same band+token, distance > 8
      maxDist = 8)
    assert(out.isEmpty, s"far pair leaked through the threshold: $out")
  }

  test("blocking contract: a changed first token or a crossed length " +
    "band is not discovered") {
    // first token differs -> different block, despite distance 1
    val tok = pairs(Seq(
      1L -> "alpha beta gamma delta",
      2L -> "Alpha beta gamma delta x"))  // canonicalizes same token...
    assert(tok.nonEmpty, "case folding must not split the block")
    val tok2 = pairs(Seq(
      1L -> "alpha beta gamma delta",
      2L -> "alphX beta gamma delta"))
    assert(tok2.isEmpty, "first-token edit must fall outside the block")
    // length band: same first token, lengths 22 vs 47 chars at band 16
    val band = pairs(Seq(
      1L -> "alpha beta gamma delta",
      2L -> "alpha beta gamma delta plus a long long tail"))
    assert(band.isEmpty, "cross-band pair must fall outside the block")
  }

  test("distance is measured on the canonical prefix only") {
    // identical first 64 canonical chars, huge difference after
    val head = "alpha " + ("x" * 58)
    val out = pairs(Seq(
      1L -> (head + " tail one"),
      2L -> (head + " completely different ending Z")),
      prefixLen = 64, lenBand = 64)  // wide band so lengths co-block
    assert(out == Set((1L, 2L, 0)),
      s"prefix-identical docs must pair at distance 0: $out")
  }

  test("wide variant: a cross-band pair under half a band is found; " +
    "the base variant's miss is exactly the boundary case") {
    val s = spark; import s.implicits._
    // canonical lengths 15 and 18 straddle the 16-boundary, gap 3 < 16/2
    val rows = Seq(1L -> "alpha beta gamm", 2L -> "alpha beta gamma d")
    assert(rows.map(_._2.length) == Seq(15, 18))
    val df = rows.toDF("id", "text")
    val base = Fuzzy.editDistancePairs(df, col("id"), col("text"))
    val wide = Fuzzy.editDistancePairsWide(df, col("id"), col("text"))
    assert(base.count() == 0, "boundary pair should be the base miss")
    val got = wide.collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(got.toSeq == Seq((1L, 2L)),
      s"wide banding must recover the boundary pair: ${got.toSeq}")
  }

  test("wide variant never double-reports a pair found by both bandings") {
    val s = spark; import s.implicits._
    val df = Seq(1L -> "alpha beta gamma delta",
      2L -> "alpha beta gamma delte").toDF("id", "text")
    val wide = Fuzzy.editDistancePairsWide(df, col("id"), col("text"))
    assert(wide.count() == 1, "distinct must collapse the two bandings")
  }

  test("plan contract: discovery is groupBy-explode — one Exchange " +
    "per banding plus the distinct, and never a join node") {
    val s = spark; import s.implicits._
    val df = (0L until 100L).map(i => i -> s"alpha doc number $i")
      .toDF("id", "text")
    def planOf(d: org.apache.spark.sql.DataFrame) =
      d.queryExecution.executedPlan.toString()
    val base = planOf(Fuzzy.editDistancePairs(df, col("id"), col("text")))
    val wide = planOf(Fuzzy.editDistancePairsWide(df, col("id"), col("text")))
    Seq("base" -> base, "wide" -> wide).foreach { case (n, p) =>
      assert(!p.contains("SortMergeJoin") && !p.contains("ShuffledHashJoin")
        && !p.contains("BroadcastNestedLoopJoin")
        && !p.contains("CartesianProduct"),
        s"$n discovery must never plan a join:\n${p.take(2500)}")
    }
    // bucket groupBy + bucketPairs' pair-distinct = 2 per banding
    val baseEx = base.linesIterator.count(_.contains("Exchange"))
    val wideEx = wide.linesIterator.count(_.contains("Exchange"))
    assert(baseEx == 2,
      s"base = bucket groupBy + pair distinct: $baseEx")
    assert(wideEx <= 5,
      s"wide = two bandings + the union distinct at most: $wideEx")
  }

  test("blockingQuality: hand-built corpus — the first-token-edit " +
    "pair is priced as missed recall, candidates stay a truth subset") {
    val s = spark; import s.implicits._
    val docs = Seq(
      // true pair, co-blocked (same first token, tiny edit)
      (1L, "alpha beta gamma delta"),
      (2L, "alpha beta gamma delra"),
      // true pair, NOT co-blocked: the edit hits the first token —
      // the documented blocking blind spot, which completeness must
      // surface as a miss
      (3L, "omega common tail words"),
      (4L, "omeja common tail words"),
      // unrelated filler
      (5L, "entirely different text body here"),
      (6L, "another unrelated document body"))
      .toDF("doc_id", "text")
    val r = Fuzzy.blockingQuality(docs, col("doc_id"), col("text"),
      sampleMaxId = 100L, prefixLen = 64, lenBand = 16, maxDist = 8)
      .collect().head
    assert(r.getAs[Long]("n_docs") == 6L)
    assert(r.getAs[Long]("all_pairs") == 15L)
    val truth = r.getAs[Long]("n_truth")
    val cand = r.getAs[Long]("n_candidates")
    assert(r.getAs[Long]("n_hit") == cand, "candidates must be ⊆ truth")
    assert(truth == cand + 1,
      s"exactly the first-token pair should be missed: truth=$truth cand=$cand")
    assert(r.getAs[Long]("completeness_milli") == 1000L * cand / truth)
    assert(r.getAs[Long]("reduction_milli") ==
      1000L * (15L - cand) / 15L)
  }

  test("blockingQuality on an empty-truth sample yields null " +
    "completeness, not a crash") {
    val s = spark; import s.implicits._
    val docs = Seq((1L, "aaaaaaaaaaaaaaaa"), (2L, "bbbbbbbbbbbbbbbb"))
      .toDF("doc_id", "text")
    val r = Fuzzy.blockingQuality(docs, col("doc_id"), col("text"),
      sampleMaxId = 100L).collect().head
    assert(r.getAs[Long]("n_truth") == 0L)
    assert(r.isNullAt(r.fieldIndex("completeness_milli")))
  }

  test("maxBucket drops degenerate blocks instead of fanning out") {
    val crowd = (0L until 50L).map(i => i -> "alpha beta gamma delta")
    assert(pairs(crowd, maxBucket = Some(10)).isEmpty,
      "a block over the cap must contribute no pairs")
    assert(pairs(crowd, maxBucket = Some(64)).size == 50 * 49 / 2,
      "an in-cap block must contribute all its pairs")
  }
}
