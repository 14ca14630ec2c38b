package graft

import org.apache.spark.sql.functions._
import graft.ops.Eval

/** Contracts for the offline-eval metrics: tie-exact integer AUC and
  * calibration bins. */
class EvalSpec extends SparkSpec {
  import spark.implicits._

  private def auc(rows: Seq[(Double, Boolean)]): Long = {
    val df = rows.map { case (s, y) => ("g", s, y) }
      .toDF("grp", "s", "y")
    Eval.groupedAuc(df, col("grp"), col("s"), col("y"))
      .head().getAs[Long]("auc_milli")
  }

  test("auc: perfect separation = 1000, inverted = 0, random-ish = 500") {
    assert(auc(Seq((1.0, false), (2.0, false), (3.0, true),
      (4.0, true))) == 1000L)
    assert(auc(Seq((1.0, true), (2.0, true), (3.0, false),
      (4.0, false))) == 0L)
    // alternating: pairs split evenly
    assert(auc(Seq((1.0, false), (2.0, true), (3.0, false),
      (4.0, true))) == 750L)
  }

  test("auc: ties get midrank credit — all-equal scores give exactly 1/2") {
    assert(auc(Seq((5.0, true), (5.0, false), (5.0, true),
      (5.0, false))) == 500L)
    // one tied pair across classes contributes 0.5 of its pair weight:
    // pos@2 beats neg@1, ties neg@2 -> U = 1.5 of 2 pairs = 750 milli
    assert(auc(Seq((1.0, false), (2.0, false), (2.0, true))) == 750L)
  }

  test("auc: single-class groups are dropped, not emitted as sentinels") {
    val df = Seq(("a", 1.0, true), ("a", 2.0, false), ("b", 1.0, true))
      .toDF("grp", "s", "y")
    val out = Eval.groupedAuc(df, col("grp"), col("s"), col("y"))
      .select("grp").as[String].collect().toSeq
    assert(out == Seq("a"))
  }

  test("auc: engine windows the distinct-score frame, not raw rows") {
    val ev = Tables.events(spark, TinySf)
    val df = Eval.groupedAuc(ev, col("ts").cast("date"), col("value"),
      col("event_type") === "purchase")
    val plan = df.queryExecution.executedPlan.toString()
    // the Window's child must be an aggregate (the per-score compress),
    // never the raw scan: assert one keyed exchange feeding agg->window
    val exchanges = "Exchange hashpartitioning".r.findAllIn(plan).length
    assert(exchanges <= 2, s"auc plan shuffles too much:\n${plan.take(1500)}")
    assert(plan.indexOf("Window") > plan.indexOf("HashAggregate"),
      "window must run over the aggregated frame")
  }

  test("calibration: bins cap, count, and rate exactly") {
    val df = Seq((10.0, true), (10.0, false), (60.0, true),
      (9999.0, true)).toDF("s", "y")
    val r = Eval.calibrationBins(df, col("s"), col("y"),
      binWidth = 50.0, nBins = 10)
      .collect().map(x => x.getInt(0) -> (x.getLong(1), x.getLong(3)))
      .toMap
    assert(r(0) == (2L, 500L))   // two rows, one positive
    assert(r(1) == (1L, 1000L))
    assert(r(9) == (1L, 1000L))  // overflow capped into the last bin
  }

  test("calibration: negative scores clamp into bin 0, never a " +
    "negative bin id") {
    val df = Seq((-120.0, true), (-0.01, false), (10.0, false))
      .toDF("s", "y")
    val r = Eval.calibrationBins(df, col("s"), col("y"),
      binWidth = 50.0, nBins = 10)
      .collect().map(x => x.getInt(0) -> (x.getLong(1), x.getLong(2)))
      .toMap
    assert(r.keySet == Set(0), r.toString) // all three rows in bin 0
    assert(r(0) == (3L, 1L))
  }
}
