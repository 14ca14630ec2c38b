package graft

import org.apache.spark.sql.functions._
import graft.ops.Scd

class ScdSpec extends SparkSpec {
  import org.apache.spark.sql.Row

  private def log(rows: (Long, Long, String)*) = {
    val s = spark; import s.implicits._
    rows.toDF("k", "ts", "v")
  }

  test("fromChangeLog collapses consecutive duplicates and closes intervals") {
    val hist = Scd.fromChangeLog(
      log((1L, 10L, "a"), (1L, 20L, "a"), (1L, 30L, "b"),
          (1L, 40L, "b"), (1L, 50L, "a"),
          (2L, 15L, "x")),
      Seq("k"), "ts", Seq("v"))
      .orderBy("k", "version").collect()
    assert(hist.toSeq == Seq(
      Row(1L, "a", 1L, 10L, 30L, 0),
      Row(1L, "b", 2L, 30L, 50L, 0),
      Row(1L, "a", 3L, 50L, null, 1),
      Row(2L, "x", 1L, 15L, null, 1)))
  }

  test("equal-ts states become zero-length superseded versions, tie-broken") {
    val s = spark; import s.implicits._
    val hist = Scd.fromChangeLog(
      Seq((1L, 10L, 1L, "a"), (1L, 10L, 2L, "b"), (1L, 20L, 3L, "c"))
        .toDF("k", "ts", "seq", "v"),
      Seq("k"), "ts", Seq("v"), tieBreak = Seq("seq"))
      .orderBy("version").collect()
    assert(hist.toSeq == Seq(
      Row(1L, "a", 1L, 10L, 10L, 0), // instant-superseded, [10,10)
      Row(1L, "b", 2L, 10L, 20L, 0),
      Row(1L, "c", 3L, 20L, null, 1)))
  }

  test("null attrs compare null-safe: null==null is no change") {
    val s = spark; import s.implicits._
    val hist = Scd.fromChangeLog(
      Seq((1L, 10L, Option.empty[String]), (1L, 20L, Option.empty[String]),
          (1L, 30L, Some("a")), (1L, 40L, Option.empty[String]))
        .toDF("k", "ts", "v"),
      Seq("k"), "ts", Seq("v"))
      .orderBy("version").collect()
    assert(hist.map(r => (r.getString(1), r.getLong(2))).toSeq ==
      Seq((null, 1L), ("a", 2L), (null, 3L)))
  }

  test("snapshotAsOf: valid_from inclusive, valid_to exclusive") {
    val hist = Scd.fromChangeLog(
      log((1L, 10L, "a"), (1L, 30L, "b"), (1L, 50L, "c")),
      Seq("k"), "ts", Seq("v"))
    def at(t: Long) =
      Scd.snapshotAsOf(hist, lit(t)).select("v").collect().map(_.getString(0))
    assert(at(9L).isEmpty, "before history must be empty")
    assert(at(10L).toSeq == Seq("a"), "valid_from is inclusive")
    assert(at(29L).toSeq == Seq("a"))
    assert(at(30L).toSeq == Seq("b"), "valid_to is exclusive")
    assert(at(99L).toSeq == Seq("c"), "open version matches any later time")
  }

  test("plan contract: fromChangeLog is exactly ONE Exchange (both windows share it)") {
    val ev = Tables.events(spark, TinySf)
      .select("user_id", "event_id", "ts", "event_type")
    val plan = Scd.fromChangeLog(ev, Seq("user_id"), "ts",
        Seq("event_type"), Seq("event_id"))
      .queryExecution.executedPlan.toString()
    val exchanges = plan.linesIterator.count(_.contains("Exchange"))
    assert(exchanges == 1,
      s"expected exactly 1 Exchange, found $exchanges:\n${plan.take(2000)}")
    // and the second window must not re-sort what the first produced
    val sorts = plan.linesIterator
      .count(l => l.contains("Sort [") && !l.contains("SortMergeJoin"))
    assert(sorts <= 1, s"expected at most 1 Sort, found $sorts:\n${plan.take(2000)}")
  }

  private def dimOf(rows: (Long, String, Long, Long, Option[Long], Int)*) = {
    val s = spark; import s.implicits._
    rows.toDF("k", "v", "version", "valid_from", "valid_to", "is_current")
  }

  test("applyChanges: the four tick classes land in one pass") {
    val s = spark; import s.implicits._
    val dim = dimOf(
      (1L, "a", 1L, 0L, None, 1),             // unchanged by batch
      (2L, "b", 2L, 50L, None, 1),            // changed by batch
      (2L, "old", 1L, 0L, Some(50L), 0),      // closed history: passthrough
      (3L, "c", 1L, 0L, None, 1))             // absent from batch
    val inc = Seq((1L, "a"), (2L, "B"), (9L, "new")).toDF("k", "v")
    val out = Scd.applyChanges(dim, inc, Seq("k"), Seq("v"), lit(100L))
      .orderBy("k", "version").collect()
    assert(out.toSeq == Seq(
      Row(1L, "a", 1L, 0L, null, 1),     // equal attrs: untouched
      Row(2L, "old", 1L, 0L, 50L, 0),    // history passthrough
      Row(2L, "b", 2L, 50L, 100L, 0),    // closed at the tick
      Row(2L, "B", 3L, 100L, null, 1),   // new version
      Row(3L, "c", 1L, 0L, null, 1),     // absent key: untouched
      Row(9L, "new", 1L, 100L, null, 1)  // brand-new key
    ))
  }

  test("applyChanges is retry-idempotent: re-applying the batch is a no-op") {
    val s = spark; import s.implicits._
    val dim = dimOf((1L, "a", 1L, 0L, None, 1), (2L, "b", 1L, 0L, None, 1))
    val inc = Seq((1L, "A"), (7L, "n")).toDF("k", "v")
    val once = Scd.applyChanges(dim, inc, Seq("k"), Seq("v"), lit(100L))
    val twice = Scd.applyChanges(once, inc, Seq("k"), Seq("v"), lit(100L))
    assert(twice.orderBy("k", "version").collect().toSeq ==
      once.orderBy("k", "version").collect().toSeq,
      "second application at the same tick changed the dimension")
  }

  test("applyChanges rejects a frame without the SCD2 schema") {
    val s = spark; import s.implicits._
    val bad = Seq((1L, "a")).toDF("k", "v")
    val inc = Seq((1L, "a")).toDF("k", "v")
    val e = intercept[IllegalArgumentException](
      Scd.applyChanges(bad, inc, Seq("k"), Seq("v"), lit(1L)))
    assert(e.getMessage.contains("SCD2 schema"))
  }
}
