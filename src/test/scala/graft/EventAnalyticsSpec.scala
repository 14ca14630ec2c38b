package graft

import java.sql.Timestamp
import org.apache.spark.sql.functions._
import graft.ops.{Funnel, Graph, Retrieval}

/** Contracts for the event-analytics + index family: ordered funnel,
  * cohort retention, triangle census, inverted index. */
class EventAnalyticsSpec extends SparkSpec {
  import spark.implicits._

  private def ts(day: Int, hour: Int = 0): Timestamp =
    Timestamp.valueOf(f"2024-01-$day%02d $hour%02d:00:00")

  // ---- funnel -----------------------------------------------------

  private def funnelEvents = Seq(
    // user 1: full ordered funnel inside the span
    (1L, ts(1), "view"), (1L, ts(2), "click"), (1L, ts(3), "purchase"),
    // user 2: purchase BEFORE click — step 3 must not count it
    (2L, ts(1), "view"), (2L, ts(3), "click"), (2L, ts(2), "purchase"),
    // user 3: full funnel but converting outside the 7-day span
    (3L, ts(1), "view"), (3L, ts(2), "click"), (3L, ts(20), "purchase"),
    // user 4: starts at click — no step 1, contributes nothing
    (4L, ts(1), "click"), (4L, ts(2), "purchase")
  ).toDF("user_id", "ts", "event_type")

  test("funnel: order and span are enforced") {
    val r = Funnel.funnel(funnelEvents, "user_id", "ts", "event_type",
      Seq("view", "click", "purchase"), spanDays = 7).head()
    assert(r.getAs[Long]("n_step1") == 3)       // users 1,2,3 viewed
    assert(r.getAs[Long]("n_step2") == 3)       // all three clicked after
    assert(r.getAs[Long]("n_step3") == 2)       // users 1,3 purchased after click
    assert(r.getAs[Long]("n_converted") == 1)   // only user 1 inside span
    assert(r.getAs[Long]("conv_milli") == 333)
  }

  test("funnel: no step-1 events gives conv_milli = 0, not NULL") {
    val ev = Seq((1L, ts(1), "click"), (1L, ts(2), "purchase"))
      .toDF("user_id", "ts", "event_type")
    val r = Funnel.funnel(ev, "user_id", "ts", "event_type",
      Seq("view", "click", "purchase"), spanDays = 7).head()
    assert(r.getAs[Long]("n_step1") == 0)
    assert(!r.isNullAt(r.fieldIndex("conv_milli")))
    assert(r.getAs[Long]("conv_milli") == 0)
  }

  test("funnel: strictly-after semantics — same-timestamp step doesn't count") {
    val ev = Seq((1L, ts(1), "view"), (1L, ts(1), "click"))
      .toDF("user_id", "ts", "event_type")
    val r = Funnel.funnel(ev, "user_id", "ts", "event_type",
      Seq("view", "click"), spanDays = 7).head()
    assert(r.getAs[Long]("n_step1") == 1)
    assert(r.getAs[Long]("n_step2") == 0)
  }

  test("funnel: one exchange — a single user-keyed shuffle feeds the windows") {
    val df = Funnel.funnel(Tables.events(spark, TinySf), "user_id", "ts",
      "event_type", Seq("view", "click", "purchase"), spanDays = 7)
    val plan = df.queryExecution.executedPlan.toString()
    val exchanges = "Exchange hashpartitioning".r.findAllIn(plan).length
    assert(exchanges == 1, s"expected 1 keyed exchange, got $exchanges:\n" +
      plan.take(1500))
  }

  // ---- cohort -----------------------------------------------------

  test("cohort: offsets count distinct users against their first week") {
    val ev = Seq(
      (1L, ts(1)), (1L, ts(8)), (1L, ts(8, 6)), // cohort w1, active w1+w2
      (2L, ts(8)), (2L, ts(22)),                // cohort w2, offsets 0,2
      (3L, ts(1))                               // cohort w1, only w1
    ).toDF("user_id", "ts").withColumn("event_type", lit("view"))
    val r = Funnel.cohortRetention(ev, "user_id", "ts", maxOffset = 4)
      .collect().map(x => (x.getDate(0).toString, x.getInt(1)) ->
        x.getLong(2)).toMap
    assert(r(("2024-01-01", 0)) == 2) // users 1,3
    assert(r(("2024-01-01", 1)) == 1) // user 1 in week 2
    assert(r(("2024-01-08", 0)) == 1) // user 2
    assert(r(("2024-01-08", 2)) == 1) // user 2 two weeks later
    assert(!r.contains(("2024-01-01", 2)))
  }

  // ---- triangles --------------------------------------------------

  test("triangles: counts a known graph exactly, regardless of " +
    "direction/duplication of input edges") {
    // K4 minus one edge = 2 triangles; feed directed dups + self-loop
    val edges = Seq((1L, 2L), (2L, 1L), (1L, 3L), (1L, 4L), (2L, 3L),
      (2L, 4L), (2L, 2L)).toDF("src", "dst")
    val r = Graph.triangleCount(edges).head()
    assert(r.getAs[Long]("n_edges") == 5)
    assert(r.getAs[Long]("n_nodes") == 4)
    assert(r.getAs[Long]("n_triangles") == 2, r.toString)
  }

  test("triangles: triangle-free graph counts zero with wedges present") {
    val edges = Seq((1L, 2L), (2L, 3L), (3L, 4L)).toDF("src", "dst")
    val r = Graph.triangleCount(edges).head()
    assert(r.getAs[Long]("n_triangles") == 0)
    assert(r.getAs[Long]("n_wedges") > 0)
  }

  // ---- inverted index ---------------------------------------------

  test("inverted index: cap binds, postings ascend, df is uncapped") {
    val docs = (1L to 20L).map(i => (i, "common " +
      (if (i <= 3) "rare" else ""))).toDF("doc_id", "text")
    val r = Retrieval.invertedIndex(docs, "doc_id", "text", cap = 8)
    val byTerm = r.collect().groupBy(_.getString(0))
    val common = byTerm("common")
    assert(common.length == 8)                       // capped
    assert(common.forall(_.getLong(1) == 20L))       // df uncapped
    assert(common.map(_.getLong(3)).toSeq ==
      (1L to 8L))                                    // ascending docs
    assert(byTerm("rare").length == 3)
    assert(byTerm("rare").forall(_.getLong(1) == 3L))
  }

  test("inverted index: tf joins back per posting") {
    val docs = Seq((1L, "a a a b"), (2L, "a b b")).toDF("doc_id", "text")
    val r = Retrieval.invertedIndex(docs, "doc_id", "text", cap = 8)
      .collect().map(x => (x.getString(0), x.getLong(3)) -> x.getLong(4))
      .toMap
    assert(r(("a", 1L)) == 3 && r(("a", 2L)) == 1)
    assert(r(("b", 1L)) == 1 && r(("b", 2L)) == 2)
  }
}
