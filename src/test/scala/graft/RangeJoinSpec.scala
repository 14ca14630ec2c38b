package graft

import java.sql.Timestamp
import org.apache.spark.sql.functions._
import graft.ops.RangeJoin

/** Bucketed range join: result must equal the naive inequality join
  * on every grain, pairs must never duplicate (each pair meets in
  * exactly one grid cell), and half-open boundaries must be exact.
  */
class RangeJoinSpec extends SparkSpec {

  private def ts(s: String): Timestamp = Timestamp.valueOf(s)

  private lazy val intervals = {
    val s = spark; import s.implicits._
    Seq(
      (1L, ts("2024-01-01 10:00:00"), ts("2024-01-01 12:00:00")),
      (2L, ts("2024-01-01 11:30:00"), ts("2024-01-01 11:45:00")), // overlaps 1
      (3L, ts("2024-01-02 00:00:00"), ts("2024-01-02 00:00:01")), // 1s sliver
      (4L, ts("2024-03-01 00:00:00"), ts("2024-03-02 00:00:00")) // empty
    ).toDF("iid", "start_ts", "end_ts")
  }

  private lazy val points = {
    val s = spark; import s.implicits._
    Seq(
      (10L, ts("2024-01-01 10:00:00")), // == start of 1: inside
      (11L, ts("2024-01-01 11:40:00")), // inside 1 and 2
      (12L, ts("2024-01-01 12:00:00")), // == end of 1: OUTSIDE (half-open)
      (13L, ts("2024-01-02 00:00:00")), // inside sliver 3
      (14L, ts("2024-01-02 00:00:01")), // == end of 3: outside
      (15L, ts("2023-12-31 23:59:59")) // before everything
    ).toDF("pid", "pts")
  }

  private def naive = intervals.join(points,
    col("pts") >= col("start_ts") && col("pts") < col("end_ts"))

  private def pairs(df: org.apache.spark.sql.DataFrame): Set[(Long, Long)] =
    df.select("iid", "pid").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet

  test("bucketed join ≡ naive inequality join, boundaries half-open") {
    val got = RangeJoin.intervalPointJoin(intervals, points,
      "start_ts", "end_ts", "pts", bucketMicros = 3600L * 1000000L)
    assert(pairs(got) == pairs(naive))
    assert(pairs(got) == Set((1L, 10L), (1L, 11L), (2L, 11L), (3L, 13L)))
  }

  test("result is grain-invariant (1 s, 7 min, 1 day)") {
    val expect = pairs(naive)
    for (grain <- Seq(1000000L, 7L * 60 * 1000000L, 86400L * 1000000L)) {
      val got = RangeJoin.intervalPointJoin(intervals, points,
        "start_ts", "end_ts", "pts", bucketMicros = grain)
      assert(pairs(got) == expect, s"grain=$grain")
      // no duplicate pairs even when intervals span many cells
      assert(got.count() == expect.size, s"grain=$grain produced dups")
    }
  }

  test("matches the naive join on random intervals (seeded property)") {
    val s = spark; import s.implicits._
    val rnd = new scala.util.Random(4321)
    def rt(): Long = 1700000000000L + rnd.nextInt(500000) * 1000L
    val iv = (1L to 60L).map { i =>
      val start = rt()
      (i, new Timestamp(start),
        new Timestamp(start + (1 + rnd.nextInt(90000)) * 1000L))
    }.toDF("iid", "start_ts", "end_ts")
    val pts = (100L to 400L).map(i => (i, new Timestamp(rt())))
      .toDF("pid", "pts")
    val expect = pairs(iv.join(pts,
      col("pts") >= col("start_ts") && col("pts") < col("end_ts")))
    for (grain <- Seq(1000000L, 3600L * 1000000L)) {
      val got = RangeJoin.intervalPointJoin(iv, pts,
        "start_ts", "end_ts", "pts", bucketMicros = grain)
      assert(pairs(got) == expect, s"grain=$grain")
      assert(got.count() == expect.size, s"grain=$grain produced dups")
    }
  }

  test("a pathological open-ended interval fails loudly, not with OOM") {
    val s = spark; import s.implicits._
    val sentinel = Seq(
      (1L, ts("2024-01-01 00:00:00"), ts("9999-12-31 00:00:00"))
    ).toDF("iid", "start_ts", "end_ts")
    val ex = intercept[Exception] {
      RangeJoin.intervalPointJoin(sentinel, points,
        "start_ts", "end_ts", "pts", bucketMicros = 3600L * 1000000L)
        .count()
    }
    def messages(t: Throwable): Seq[String] =
      Option(t).toSeq.flatMap(e =>
        Option(e.getMessage).toSeq ++ messages(e.getCause))
    assert(messages(ex).exists(_.contains("grid cells")),
      s"expected the maxCellsPerInterval guard, got: ${ex.getMessage}")
  }

  test("plan contract: equi-join on the grid cell, never BNLJ/cartesian") {
    // the whole point of the bucket grid is turning the inequality
    // into an equi-join; if Catalyst ever planned the cell join as
    // BroadcastNestedLoopJoin or CartesianProduct the operator would
    // still be CORRECT but quadratic — the 100 TB contract is the
    // plan shape, so pin it
    val plan = RangeJoin.intervalPointJoin(intervals, points,
        "start_ts", "end_ts", "pts", bucketMicros = 3600L * 1000000L)
      .queryExecution.executedPlan.toString()
    assert(!plan.contains("BroadcastNestedLoopJoin"),
      s"range join planned as BNLJ:\n${plan.take(2000)}")
    assert(!plan.contains("CartesianProduct"),
      s"range join planned as cartesian:\n${plan.take(2000)}")
    assert(
      plan.contains("SortMergeJoin") || plan.contains("BroadcastHashJoin") ||
        plan.contains("ShuffledHashJoin"),
      s"expected a hash/merge equi-join on the grid cell:\n${plan.take(2000)}")
  }

  test("degenerate and null rows are dropped, not crashed on") {
    val s = spark; import s.implicits._
    val bad = Seq(
      (9L, Option(ts("2024-01-01 10:00:00")), Option(ts("2024-01-01 09:00:00"))), // end<start
      (8L, Option.empty[Timestamp], Option(ts("2024-01-01 10:00:00")))
    ).toDF("iid", "start_ts", "end_ts")
    val got = RangeJoin.intervalPointJoin(bad, points,
      "start_ts", "end_ts", "pts", bucketMicros = 1000000L)
    assert(got.count() == 0)
  }

  // ----- interval×interval overlap --------------------------------

  private lazy val rIntervals = {
    val s = spark; import s.implicits._
    Seq(
      // spans MANY shared cells with iid 1 at a 1-min grain — must
      // still emit the pair exactly once
      (21L, ts("2024-01-01 10:30:00"), ts("2024-01-01 11:50:00")),
      (22L, ts("2024-01-01 12:00:00"), ts("2024-01-01 13:00:00")), // abuts 1
      (23L, ts("2024-06-01 00:00:00"), ts("2024-06-01 01:00:00"))  // far away
    ).toDF("rid", "r_start", "r_end")
  }

  test("overlap join ≡ naive inequality join; multi-cell pairs emit " +
    "exactly once; abutting half-open intervals do NOT overlap") {
    val naiveOv = intervals.join(rIntervals,
        col("start_ts") < col("r_end") && col("r_start") < col("end_ts"))
      .select("iid", "rid").collect().map(r => (r.getLong(0), r.getLong(1)))
      .toSet
    Seq(60L * 1000000L, 3600L * 1000000L, 86400L * 1000000L).foreach { g =>
      val got = RangeJoin.intervalOverlapJoin(intervals, rIntervals,
          "start_ts", "end_ts", "r_start", "r_end", bucketMicros = g)
        .select("iid", "rid").collect()
        .map(r => (r.getLong(0), r.getLong(1)))
      assert(got.toSet == naiveOv, s"grain $g: ${got.toSet} != $naiveOv")
      assert(got.length == got.toSet.size,
        s"grain $g emitted duplicate pairs")
    }
    assert(!naiveOv.contains((1L, 22L)),
      "fixture must exercise the abutting half-open case")
    assert(naiveOv.contains((1L, 21L)) && naiveOv.contains((2L, 21L)))
  }

  test("overlap plan contract: equi-join on the cell, no distinct " +
    "aggregate, never BNLJ") {
    val plan = RangeJoin.intervalOverlapJoin(intervals, rIntervals,
        "start_ts", "end_ts", "r_start", "r_end",
        bucketMicros = 3600L * 1000000L)
      .queryExecution.executedPlan.toString()
    assert(!plan.contains("BroadcastNestedLoopJoin") &&
      !plan.contains("CartesianProduct"),
      s"overlap join planned quadratic:\n${plan.take(2000)}")
    // the first-shared-cell predicate replaces a distinct: no
    // aggregate may appear in this plan at all
    assert(!plan.contains("HashAggregate"),
      s"overlap dedup must be a predicate, not an aggregate:\n${plan.take(2000)}")
  }
}
