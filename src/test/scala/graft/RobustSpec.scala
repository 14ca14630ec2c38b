package graft

import org.apache.spark.sql.functions._
import graft.ops.Robust

/** Robust median/MAD profiling: hand-checked values on a seeded frame
  * (including the degenerate MAD=0 group), and the single-Exchange
  * plan contract both it and the rolling-features query rely on —
  * the rank passes and the final aggregate must all reuse the one
  * hash partitioning on the group key.
  */
class RobustSpec extends SparkSpec {

  test("outlierProfile matches hand-computed median/MAD/outliers") {
    val s = spark; import s.implicits._
    val df = Seq(
      // group a: 5 values, one wild outlier
      ("a", 10.0, 1L), ("a", 11.0, 2L), ("a", 12.0, 3L),
      ("a", 13.0, 4L), ("a", 1000.0, 5L),
      // group b: ties at the median, MAD degenerates to 0 — any
      // nonzero deviation is then an "outlier" (the documented
      // behavior of the k·MAD gate on ultra-concentrated data)
      ("b", 5.0, 6L), ("b", 5.0, 7L), ("b", 6.0, 8L)
    ).toDF("g", "x", "id")
    val out = Robust.outlierProfile(df, Seq("g"), "x", "id", k = 5)
      .collect().map(r => r.getString(0) ->
        (r.getAs[Long]("n"), r.getAs[Double]("med"),
          r.getAs[Double]("mad"), r.getAs[Long]("n_outliers"))).toMap
    // a: med = rank-3 of (10,11,12,13,1000) = 12; devs sorted
    // (0,1,1,2,988) → mad = rank-3 = 1; only 988 > 5·1
    assert(out("a") == ((5L, 12.0, 1.0, 1L)), s"group a: ${out("a")}")
    // b: med = rank-2 of (5,5,6) = 5; devs (0,0,1) → mad = 0;
    // the 6 has dev 1 > 0
    assert(out("b") == ((3L, 5.0, 0.0, 1L)), s"group b: ${out("b")}")
  }

  test("the mean/stddev gate breaks where the median gate holds") {
    val s = spark; import s.implicits._
    // a corrupt feed of NINE 1e9-valued rows masks itself: the
    // outliers inflate the stddev until their own z ≈ √(n/m) < 5 and
    // the z-score gate flags NOTHING; the median/MAD gate is immune
    // (9 of 109 rows move neither) and flags exactly the nine
    val vals = (1 to 100).map(i => ("g", 100.0 + (i % 7), i.toLong)) ++
      (101 to 109).map(i => ("g", 1e9, i.toLong))
    val df = vals.toDF("g", "x", "id")
    val stats = df.agg(avg("x").as("mu"), stddev_pop("x").as("sd")).head()
    val (mu, sd) = (stats.getDouble(0), stats.getDouble(1))
    val zFlagged = df.filter(abs(col("x") - mu) > sd * 5).count()
    assert(zFlagged == 0, s"z-score gate unexpectedly flagged $zFlagged")
    val madFlagged = Robust.outlierProfile(df, Seq("g"), "x", "id", 5)
      .head().getAs[Long]("n_outliers")
    assert(madFlagged == 9, s"MAD gate flagged $madFlagged (expected 9)")
  }

  test("winsorize clamps to the band, keeps every row, touches nothing in-band") {
    val s = spark; import s.implicits._
    val df = Seq(
      ("a", 10.0, 1L), ("a", 11.0, 2L), ("a", 12.0, 3L),
      ("a", 13.0, 4L), ("a", 1000.0, 5L)
    ).toDF("g", "x", "id")
    // med 12, mad 1, k=5 → band [7, 17]: only the 1000 moves
    val out = Robust.winsorize(df, Seq("g"), "x", "id", 5, "w")
      .orderBy("id").collect().map(r => r.getAs[Double]("w")).toSeq
    assert(out == Seq(10.0, 11.0, 12.0, 13.0, 17.0), s"clamped: $out")
  }

  test("plan contract: winsorize is exactly ONE hash Exchange") {
    val ev = Tables.events(spark, TinySf)
    val plan = Robust.winsorize(ev, Seq("event_type"), "value",
        "event_id", 5, "w")
      .queryExecution.executedPlan.toString()
    val hashEx = plan.linesIterator
      .count(_.contains("Exchange hashpartitioning"))
    assert(hashEx == 1,
      s"expected exactly 1 hash Exchange, found $hashEx:\n${plan.take(2000)}")
  }

  test("equalFrequencyBins: bin sizes differ by at most 1 per group, " +
    "order respected, ONE hash Exchange") {
    val ev = Tables.events(spark, TinySf)
    val binned = Robust.equalFrequencyBins(ev, Seq("event_type"),
      "value", "event_id", nBins = 7)
    val sizes = binned.groupBy("event_type", "bin").count()
      .groupBy("event_type")
      .agg(max("count").as("mx"), min("count").as("mn"))
      .collect()
    assert(sizes.nonEmpty)
    sizes.foreach(r => assert(r.getLong(1) - r.getLong(2) <= 1,
      s"${r.getString(0)}: bins not equal-frequency ($r)"))
    // bin is monotone in the (value, tieBreak) order within a group
    val viol = binned.groupBy("event_type", "bin")
      .agg(min("value").as("lo"), max("value").as("hi"))
      .selectExpr("event_type", "bin", "hi",
        "lead(lo) OVER (PARTITION BY event_type ORDER BY bin) AS nxt")
      .filter(col("nxt").isNotNull && col("hi") > col("nxt"))
    assert(viol.count() == 0, "bin boundaries overlap out of order")
    val hashEx = Robust.equalFrequencyBins(ev, Seq("event_type"),
        "value", "event_id", 7)
      .queryExecution.executedPlan.toString()
      .linesIterator.count(_.contains("Exchange hashpartitioning"))
    assert(hashEx == 1, s"expected 1 hash Exchange, found $hashEx")
  }

  test("topFraction: exact k with boundary ties, equals the rank " +
    "definition, never plans a global range sort") {
    val s = spark; import s.implicits._
    // 100 rows, heavy ties across the 10-wide bin boundary
    val df = (1L to 100L).map(i => (i, (i % 20).toDouble))
      .toDF("id", "score")
    val keep = Robust.topFraction(df, "score", "id",
      keepMille = 250, binWidth = 10.0)
    val got = keep.select("id").collect().map(_.getLong(0)).toSet
    assert(got.size == 25, s"must keep exactly ceil(100*0.25)=25: ${got.size}")
    val expected = df.orderBy(col("score").desc, col("id").asc)
      .limit(25).select("id").collect().map(_.getLong(0)).toSet
    assert(got == expected,
      "histogram refinement diverged from the rank definition")
    val plan = keep.queryExecution.executedPlan.toString()
    assert(!plan.contains("Exchange rangepartitioning"),
      s"topFraction must never global-sort:\n${plan.take(2000)}")
    assert(plan.contains("TakeOrderedAndProject"),
      s"boundary bin should resolve via a bounded heap:\n${plan.take(2000)}")
  }

  test("topFraction: a pathological score range fails the bin budget " +
    "loudly instead of a silent data-sized collect") {
    val s = spark; import s.implicits._
    // one 1e18 outlier: at binWidth=0.1 the histogram would span
    // ~1e19 bins — the driver collect must refuse BEFORE running
    val df = ((1L to 99L).map(i => (i, i.toDouble)) :+
      (100L, 1e18)).toDF("id", "score")
    val ex = intercept[IllegalArgumentException] {
      Robust.topFraction(df, "score", "id",
        keepMille = 100, binWidth = 0.1)
    }
    assert(ex.getMessage.contains("bins"))
    assert(ex.getMessage.contains("winsorize"),
      s"the error must name the remedy: ${ex.getMessage}")
    // the same data resolves fine once the budget holds
    val keep = Robust.topFraction(df, "score", "id",
      keepMille = 100, binWidth = 1e17)
    assert(keep.count() == 10L)
  }

  test("plan contract: outlierProfile is exactly ONE hash Exchange") {
    val ev = Tables.events(spark, TinySf)
    val plan = Robust.outlierProfile(ev, Seq("event_type"), "value",
        "event_id", 5)
      .queryExecution.executedPlan.toString()
    val hashEx = plan.linesIterator
      .count(_.contains("Exchange hashpartitioning"))
    assert(hashEx == 1,
      s"expected exactly 1 hash Exchange, found $hashEx:\n${plan.take(2000)}")
  }

  test("plan contract: rolling features reuse one hash Exchange") {
    val plan = graft.queries.WindowQueries.rollingFeatures
      .run(spark, TinySf)
      .queryExecution.executedPlan.toString()
    val hashEx = plan.linesIterator
      .count(_.contains("Exchange hashpartitioning"))
    // the trailing ORDER BY adds a range Exchange (verification edge
    // only); the engine work itself must share ONE hash Exchange
    assert(hashEx == 1,
      s"expected exactly 1 hash Exchange, found $hashEx:\n${plan.take(2000)}")
  }

  test("weighted median: weights move the median where counts don't; " +
    "ties and zero weights behave") {
    val s = spark; import s.implicits._
    // values 1..4 once each: unweighted median 2; weight mass on 4
    // drags the weighted median to 4 (2*cum crosses at the top value)
    val df = Seq(("g", 1L, 1L), ("g", 2L, 1L), ("g", 3L, 1L),
      ("g", 4L, 10L)).toDF("grp", "v", "w")
    val r = graft.ops.Robust.weightedMedian(df, Seq("grp"), "v", "w")
      .head()
    assert(r.getLong(1) == 4L && r.getLong(2) == 13L, r.toString)
    // balanced weights: lower median on the exact 50% boundary
    val even = Seq(("g", 1L, 5L), ("g", 9L, 5L)).toDF("grp", "v", "w")
    assert(graft.ops.Robust.weightedMedian(even, Seq("grp"), "v", "w")
      .head().getLong(1) == 1L)
    // duplicate values combine their weights before the scan
    val dup = Seq(("g", 3L, 2L), ("g", 3L, 2L), ("g", 7L, 3L))
      .toDF("grp", "v", "w")
    assert(graft.ops.Robust.weightedMedian(dup, Seq("grp"), "v", "w")
      .head().getLong(1) == 3L)
  }
}
