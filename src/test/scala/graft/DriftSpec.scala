package graft

import org.apache.spark.sql.functions._
import graft.ops.Drift

/** Categorical drift: hand-checked milli-proportions on a seeded
  * frame (including one-sided categories and nulls), and the
  * injected-shift detection story on real events.
  */
class DriftSpec extends SparkSpec {

  test("hand-checked profile: milli math, one-sided categories, nulls") {
    val s = spark; import s.implicits._
    val a = Seq("x", "x", "x", "y").toDF("c")
    val b = Seq("x", null.asInstanceOf[String]).toDF("c")
    val out = Drift.categoricalProfile(a, b, "c").collect()
      .map(r => r.getString(0) ->
        (r.getAs[Long]("cnt_a"), r.getAs[Long]("cnt_b"),
          r.getAs[Long]("milli_a"), r.getAs[Long]("milli_b"),
          r.getAs[Long]("d2"))).toMap
    // a: x 3/4=750, y 1/4=250; b: x 1/2=500, __null__ 1/2=500
    assert(out("x") == ((3L, 1L, 750L, 500L, 62500L)), s"x: ${out("x")}")
    assert(out("y") == ((1L, 0L, 250L, 0L, 62500L)), s"y: ${out("y")}")
    assert(out("__null__") == ((0L, 1L, 0L, 500L, 250000L)),
      s"null: ${out("__null__")}")
  }

  test("stored-profile drift ≡ raw-slice drift (no-rescan path)") {
    val ev = Tables.events(spark, TinySf)
    val biased = ev.filter(!(col("event_type") === "click" &&
      pmod(col("event_id"), lit(3)) === 0))
    def counted(df: org.apache.spark.sql.DataFrame, cnt: String) =
      df.select(coalesce(col("event_type").cast("string"),
          lit("__null__")).as("category"))
        .groupBy("category").agg(count(lit(1)).as(cnt))
    val fromCounts = Drift.countedDrift(
      counted(ev, "cnt_a"), counted(biased, "cnt_b"))
    val fromRaw = Drift.categoricalProfile(ev, biased, "event_type")
    assert(rowsAsSet(fromCounts) == rowsAsSet(fromRaw),
      "profile-fed drift differs from raw-slice drift")
  }

  test("identical slices read as zero drift") {
    val ev = Tables.events(spark, TinySf)
    val d2 = Drift.categoricalProfile(ev, ev, "event_type")
      .agg(sum("d2")).head().getLong(0)
    assert(d2 == 0, s"self-drift should be 0, got $d2")
  }

  test("an injected mix shift is flagged on the shifted category") {
    val ev = Tables.events(spark, TinySf)
    val biased = ev.filter(!(col("event_type") === "click" &&
      pmod(col("event_id"), lit(3)) === 0))
    val rows = Drift.categoricalProfile(ev, biased, "event_type")
      .collect().map(r => r.getString(0) -> r.getAs[Long]("d2")).toMap
    assert(rows.values.sum > 0, "shed slice reads as zero drift")
    assert(rows("click") == rows.values.max,
      s"drift should peak on the shed category: $rows")
  }

  test("mergeCounts: any grouping of batch profiles equals the full " +
    "recount, overlapping categories included") {
    val ev = Tables.events(spark, TinySf)
    def prof(df: org.apache.spark.sql.DataFrame) = df
      .select(coalesce(col("event_type").cast("string"), lit("__null__"))
        .as("category"))
      .groupBy("category").agg(count(lit(1)).as("cnt"))
    // overlapping slices on purpose: every batch carries every category
    val batches = (0 to 3).map(m =>
      prof(ev.filter(pmod(col("event_id"), lit(4)) === m)))
    def toMap(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => r.getString(0) -> r.getAs[Long]("cnt")).toMap
    val full = toMap(prof(ev))
    assert(toMap(Drift.mergeCounts(batches)) == full,
      "flat merge diverged from the full recount")
    val nested = Drift.mergeCounts(Seq(
      Drift.mergeCounts(batches.take(2)), Drift.mergeCounts(batches.drop(2))))
    assert(toMap(nested) == full,
      "nested merge grouping diverged — the merge is not associative")
  }
}
