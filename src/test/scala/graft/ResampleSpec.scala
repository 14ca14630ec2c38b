package graft

import org.apache.spark.sql.functions._
import graft.ops.Resample

/** Regular-grid forward fill: hand-checked tick semantics (alignment,
  * pre-first-observation null, same-instant inclusion, tiebreak),
  * the sentinel-grid guard, and the bounded-Exchange plan contract.
  */
class ResampleSpec extends SparkSpec {

  private val Step = 100000000L // 100 s in micros

  private def run(rows: Seq[(String, Long, Double, Long)]) = {
    val s = spark; import s.implicits._
    val df = rows.toDF("k", "mt", "v", "id")
      .select(col("k"), timestamp_micros(col("mt")).as("ts"),
        col("v"), col("id"))
    Resample.ffill(df, Seq("k"), "ts", "v", "id", Step)
      .select(col("k"), unix_micros(col("tick")).as("mt"), col("v"))
      .collect().map(r => (r.getString(0), r.getLong(1),
        Option(r.get(2)).map(_.asInstanceOf[Double])))
      .toSet
  }

  test("alignment, pre-first-tick null, and carry-forward") {
    val sec = 1000000L
    // obs at 150 s (v=1) and 420 s (v=2): grid 100,200,300,400
    val out = run(Seq(("a", 150 * sec, 1.0, 1L), ("a", 420 * sec, 2.0, 2L)))
    assert(out == Set(
      ("a", 100 * sec, None), // aligned tick-0 precedes the first obs
      ("a", 200 * sec, Some(1.0)),
      ("a", 300 * sec, Some(1.0)),
      ("a", 400 * sec, Some(1.0))), out) // 420 s obs is past the last tick
  }

  test("same-instant observation lands in its tick; ties break on " +
    "the tiebreak column") {
    val sec = 1000000L
    val out = run(Seq(
      ("a", 100 * sec, 7.0, 1L),          // exactly ON tick 100
      ("a", 200 * sec, 1.0, 2L), ("a", 200 * sec, 9.0, 3L))) // tie: id 3
    assert(out == Set(
      ("a", 100 * sec, Some(7.0)),
      ("a", 200 * sec, Some(9.0))), out)
  }

  test("keys fill independently; single-observation key gets one tick") {
    val sec = 1000000L
    val out = run(Seq(
      ("a", 150 * sec, 1.0, 1L), ("a", 250 * sec, 2.0, 2L),
      ("b", 399 * sec, 5.0, 3L)))
    assert(out.filter(_._1 == "b") == Set(("b", 300 * sec, None)),
      out) // b: t0=300, mx=399 -> single tick, before the obs? no:
    // 399 >= 300, so the tick at 300 precedes the 399 obs -> null
    assert(out.filter(_._1 == "a") == Set(
      ("a", 100 * sec, None), ("a", 200 * sec, Some(1.0))), out)
  }

  test("pre-epoch series floor-aligns (truncation would land tick-0 " +
    "after the first observation and blow up sequence())") {
    val sec = 1000000L
    // obs at -150 s and -20 s: floor(-150s/100s)=-2 -> t0 = -200 s;
    // truncation toward zero would give -100 s > first obs
    val out = run(Seq(("a", -150 * sec, 1.0, 1L), ("a", -20 * sec, 2.0, 2L)))
    assert(out == Set(
      ("a", -200 * sec, None),
      ("a", -100 * sec, Some(1.0))), out)
  }

  test("null-value tie at an instant resolves to the non-null value " +
    "(arg_max semantics); an all-null instant is a gap") {
    val s = spark; import s.implicits._
    val sec = 1000000L
    val df = Seq(
      ("a", 100 * sec, Some(1.0), 1L),
      ("a", 200 * sec, Some(5.0), 2L),
      ("a", 200 * sec, None, 3L),      // null wins the tiebreak id...
      ("a", 300 * sec, None, 4L))      // ...and an all-null instant
      .toDF("k", "mt", "v", "id")
      .select(col("k"), timestamp_micros(col("mt")).as("ts"),
        col("v"), col("id"))
    val out = Resample.ffill(df, Seq("k"), "ts", "v", "id", Step)
      .select(unix_micros(col("tick")).as("mt"), col("v"))
      .collect().map(r => r.getLong(0) ->
        Option(r.get(1)).map(_.asInstanceOf[Double])).toMap
    assert(out(200 * sec) == Some(5.0), out) // non-null beats the tie
    assert(out(300 * sec) == Some(5.0), out) // gap carries forward
  }

  test("a sentinel timestamp trips the grid guard loudly") {
    val s = spark; import s.implicits._
    val df = Seq(
      ("a", 0L, 1.0, 1L),
      ("a", 9999999999L * 1000000L, 2.0, 2L)) // year ~2286 sentinel
      .toDF("k", "mt", "v", "id")
      .select(col("k"), timestamp_micros(col("mt")).as("ts"),
        col("v"), col("id"))
    val e = intercept[Exception] {
      Resample.ffill(df, Seq("k"), "ts", "v", "id", Step,
        maxTicksPerKey = 1000).collect()
    }
    assert(e.getMessage != null)
  }

  test("aggregate: half-open bucket edges, exact sum, empty buckets " +
    "absent") {
    val s = spark; import s.implicits._
    val sec = 1000000L
    val df = Seq(
      ("a", 100 * sec, 1.5, 1L),   // exactly on the bucket edge
      ("a", 199 * sec, 2.25, 2L),  // last instant of the same bucket
      ("a", 200 * sec, 4.0, 3L),   // next bucket
      ("a", 500 * sec, 8.0, 4L))   // gap: buckets 300/400 must be absent
      .toDF("k", "mt", "v", "id")
      .select(col("k"), timestamp_micros(col("mt")).as("ts"),
        col("v"), col("id"))
    val out = graft.ops.Resample.aggregate(df, Seq("k"), "ts", "v",
      Step).collect()
      .map(r => unix_micros_of(r.getTimestamp(1)) ->
        (r.getAs[Long]("n_obs"), r.getAs[Double]("v_min"),
          r.getAs[Double]("v_max"), r.getAs[Double]("v_sum"))).toMap
    assert(out.keySet == Set(100 * sec, 200 * sec, 500 * sec), out)
    assert(out(100 * sec) == ((2L, 1.5, 2.25, 3.75)), out)
    assert(out(200 * sec) == ((1L, 4.0, 4.0, 4.0)), out)
  }

  private def unix_micros_of(t: java.sql.Timestamp): Long =
    t.getTime * 1000L + (t.getNanos / 1000L) % 1000L

  test("plan contract: three hash Exchanges — instant dedup, " +
    "per-key bounds, one fill window; never a range partition") {
    val df = Resample.ffill(Tables.events(spark, TinySf),
      Seq("user_id"), "ts", "value", "event_id", 86400000000L)
    val plan = df.queryExecution.executedPlan.toString()
    val hashEx = plan.linesIterator
      .count(_.contains("Exchange hashpartitioning"))
    assert(hashEx == 3, s"expected 3 hash Exchanges, found $hashEx:\n" +
      plan.take(2000))
    assert(!plan.contains("Exchange rangepartitioning"), plan.take(2000))
    assert(!plan.contains("CartesianProduct"), plan.take(2000))
  }
}
