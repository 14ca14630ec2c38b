package graft

import java.sql.Timestamp
import org.apache.spark.sql.functions._
import graft.ops.AsOf

/** As-of join semantics: latest-at-or-before match, tie-break, strict
  * inequality, tolerance horizon, null-key/no-match behavior — pinned
  * against hand-computed expectations on a fixture small enough to
  * reason about by eye.
  */
class AsOfSpec extends SparkSpec {

  private def ts(s: String): Timestamp = Timestamp.valueOf(s)

  // reference: per-key state changes
  private lazy val quotes = {
    val s = spark; import s.implicits._
    Seq(
      ("A", ts("2024-01-01 10:00:00"), 1L, 100.0),
      ("A", ts("2024-01-01 11:00:00"), 2L, 110.0),
      ("A", ts("2024-01-01 11:00:00"), 3L, 111.0), // tie on time: id 3 wins
      ("A", ts("2024-01-01 12:00:00"), 4L, 120.0),
      ("B", ts("2024-01-01 10:30:00"), 5L, 200.0)
    ).toDF("sym", "qts", "qid", "price")
  }

  // probe: trades
  private lazy val trades = {
    val s = spark; import s.implicits._
    Seq(
      (1L, "A", ts("2024-01-01 09:59:59")), // before any quote -> null
      (2L, "A", ts("2024-01-01 10:00:00")), // exact hit -> qid 1
      (3L, "A", ts("2024-01-01 11:00:00")), // tie on quote time -> qid 3
      (4L, "A", ts("2024-01-01 11:30:00")), // between -> qid 3
      (5L, "A", ts("2024-01-01 23:00:00")), // long after -> qid 4
      (6L, "B", ts("2024-01-01 10:31:00")), // -> qid 5
      (7L, "C", ts("2024-01-01 12:00:00")) // key with no quotes -> null
    ).toDF("trade_id", "sym", "tts")
  }

  // distinct key names keep the probe's `sym` unambiguous in output
  private lazy val quotesR = quotes.withColumnRenamed("sym", "sym2")

  test("backward as-of picks latest at-or-before with tie-break") {
    val got = AsOf.backward(trades, quotesR,
        "sym", "sym2", "tts", "qts", Seq("qid", "price"), "qid")
      .collect().map(r => r.getAs[Long]("trade_id") ->
        Option(r.getAs[Any]("qid"))).toMap
    assert(got == Map(
      1L -> None, 2L -> Some(1L), 3L -> Some(3L), 4L -> Some(3L),
      5L -> Some(4L), 6L -> Some(5L), 7L -> None))
  }

  test("strict=true excludes equal-time reference rows") {
    val got = AsOf.backward(trades, quotesR,
        "sym", "sym2", "tts", "qts", Seq("qid"), "qid", strict = true)
      .collect().map(r => r.getAs[Long]("trade_id") ->
        Option(r.getAs[Any]("qid"))).toMap
    // trade 2 at exactly 10:00 must now see nothing; trade 3 at 11:00
    // falls back to the 10:00 quote
    assert(got(2L).isEmpty)
    assert(got(3L).contains(1L))
    assert(got(4L).contains(3L)) // unaffected
  }

  test("tolerance nulls out matches older than the horizon") {
    val got = AsOf.backward(trades, quotesR,
        "sym", "sym2", "tts", "qts", Seq("qid"), "qid",
        toleranceSec = Some(3600L))
      .collect().map(r => r.getAs[Long]("trade_id") ->
        Option(r.getAs[Any]("qid"))).toMap
    assert(got(5L).isEmpty) // 23:00 probe vs 12:00 quote: 11 h > 1 h
    assert(got(4L).contains(3L)) // 30 min gap survives
    assert(got(2L).contains(1L)) // 0 s gap survives
  }

  test("probe row count is preserved exactly (left-join semantics)") {
    val out = AsOf.backward(trades, quotesR,
      "sym", "sym2", "tts", "qts", Seq("qid"), "qid")
    assert(out.count() == trades.count())
    assert(out.columns.toSeq ==
      trades.columns.toSeq ++ Seq("qid"))
  }

  test("null probe keys and times yield null payload, never a match") {
    val s = spark; import s.implicits._
    val probes = Seq(
      (1L, Option.empty[String], Option(ts("2024-01-01 12:00:00"))),
      (2L, Option("A"), Option.empty[Timestamp])
    ).toDF("trade_id", "sym", "tts")
    val got = AsOf.backward(probes, quotesR,
        "sym", "sym2", "tts", "qts", Seq("qid"), "qid")
      .collect().map(r => r.getAs[Long]("trade_id") ->
        r.isNullAt(r.fieldIndex("qid"))).toMap
    assert(got == Map(1L -> true, 2L -> true))
  }

  test("matches a naive per-row reference on random data (seeded property)") {
    val s = spark; import s.implicits._
    val rnd = new scala.util.Random(1234)
    val keys = Vector("A", "B", "C", "D")
    def rts(): Timestamp = new Timestamp(1700000000000L + rnd.nextInt(100000) * 1000L)
    val refRows = (1L to 120L).map(i => (keys(rnd.nextInt(4)), rts(), i))
    val probeRows = (1L to 150L).map(i => (i, keys(rnd.nextInt(4)), rts()))
    val ref = refRows.toDF("sym2", "qts", "qid")
    val probe = probeRows.toDF("trade_id", "sym", "tts")
    val expected = probeRows.map { case (id, k, t) =>
      val cands = refRows.filter(r => r._1 == k && !r._2.after(t))
      id -> (if (cands.isEmpty) None
             else Some(cands.maxBy(r => (r._2.getTime, r._3))._3))
    }.toMap
    val got = AsOf.backward(probe, ref,
        "sym", "sym2", "tts", "qts", Seq("qid"), "qid")
      .collect().map(r => r.getAs[Long]("trade_id") ->
        Option(r.getAs[Any]("qid")).map(_.asInstanceOf[Long])).toMap
    assert(got == expected)
  }

  test("forward as-of picks earliest at-or-after with tie-break") {
    val got = AsOf.forward(trades, quotesR,
        "sym", "sym2", "tts", "qts", Seq("qid"), "qid")
      .collect().map(r => r.getAs[Long]("trade_id") ->
        Option(r.getAs[Any]("qid"))).toMap
    assert(got == Map(
      1L -> Some(1L), // 09:59:59 -> first quote 10:00 (qid 1)
      2L -> Some(1L), // exact hit at 10:00
      3L -> Some(3L), // tie at 11:00: max qid among {2,3}
      4L -> Some(4L), // 11:30 -> next is 12:00
      5L -> None,     // 23:00: nothing after
      6L -> None,     // B at 10:31: B's only quote was 10:30
      7L -> None))    // key with no quotes
  }

  test("forward strict and tolerance behave symmetrically") {
    val strict = AsOf.forward(trades, quotesR,
        "sym", "sym2", "tts", "qts", Seq("qid"), "qid", strict = true)
      .collect().map(r => r.getAs[Long]("trade_id") ->
        Option(r.getAs[Any]("qid"))).toMap
    // equal-time qid 1 excluded -> next is 11:00, tie resolves to qid 3
    assert(strict(2L).contains(3L))
    val tol = AsOf.forward(trades, quotesR,
        "sym", "sym2", "tts", "qts", Seq("qid"), "qid",
        toleranceSec = Some(60L))
      .collect().map(r => r.getAs[Long]("trade_id") ->
        Option(r.getAs[Any]("qid"))).toMap
    assert(tol(1L).contains(1L)) // 1 s gap survives
    assert(tol(4L).isEmpty)      // 30 min > 60 s horizon
  }

  test("reserved internal column names are rejected up front") {
    val ex = intercept[IllegalArgumentException] {
      AsOf.backward(trades.withColumn("_t", lit(1)), quotesR,
        "sym", "sym2", "tts", "qts", Seq("qid"), "qid")
    }
    assert(ex.getMessage.contains("AsOf internals"))
  }

  test("tolerance horizon is exact at sub-second precision") {
    val s = spark; import s.implicits._
    val ref = Seq(("A", Timestamp.valueOf("2024-01-01 10:00:00.1"), 1L))
      .toDF("sym2", "qts", "qid")
    // probe 60.8 s after the reference: must NOT survive a 60 s horizon
    val probe = Seq((1L, "A", Timestamp.valueOf("2024-01-01 10:01:00.9")),
        (2L, "A", Timestamp.valueOf("2024-01-01 10:00:59.9"))) // 59.8 s: survives
      .toDF("trade_id", "sym", "tts")
    val got = AsOf.backward(probe, ref,
        "sym", "sym2", "tts", "qts", Seq("qid"), "qid",
        toleranceSec = Some(60L))
      .collect().map(r => r.getAs[Long]("trade_id") ->
        Option(r.getAs[Any]("qid"))).toMap
    assert(got(1L).isEmpty, "60.8 s gap must not survive a 60 s horizon")
    assert(got(2L).contains(1L))
  }

  test("salted as-of ≡ plain as-of on a hot-key distribution") {
    val s = spark; import s.implicits._
    val rnd = new scala.util.Random(99)
    // 90% of probes share one hot key
    val probe = (1L to 400L).map { i =>
      val k = if (i % 10 == 0) s"k${i % 3}" else "hot"
      (i, k, new Timestamp(1700000000000L + rnd.nextInt(100000) * 1000L))
    }.toDF("trade_id", "sym", "tts")
    val ref = (1L to 60L).map { i =>
      val k = if (i % 4 == 0) s"k${i % 3}" else "hot"
      (k, new Timestamp(1700000000000L + rnd.nextInt(100000) * 1000L), i)
    }.toDF("sym2", "qts", "qid")
    val plain = AsOf.backward(probe, ref,
      "sym", "sym2", "tts", "qts", Seq("qid"), "qid")
    val salted = AsOf.backwardSalted(probe, ref,
      "sym", "sym2", "tts", "qts", Seq("qid"), "qid", factor = 8)
    assert(rowsAsSet(salted) == rowsAsSet(plain))
    // and with strict + tolerance engaged
    val plainT = AsOf.backward(probe, ref, "sym", "sym2", "tts", "qts",
      Seq("qid"), "qid", strict = true, toleranceSec = Some(7200L))
    val saltedT = AsOf.backwardSalted(probe, ref, "sym", "sym2", "tts",
      "qts", Seq("qid"), "qid", factor = 5,
      strict = true, toleranceSec = Some(7200L))
    assert(rowsAsSet(saltedT) == rowsAsSet(plainT))
  }

  test("tolerance works with a DATE reference time (q_asof_join's shape)") {
    val s = spark; import s.implicits._
    // DATE rightTime is legal without tolerance (q_asof_join uses it);
    // tolerance must not fail analysis on it (r7 advisory: unix_micros
    // rejects DateType) and must measure from the date's midnight
    val ref = Seq(("A", java.sql.Date.valueOf("2024-01-01"), 1L),
        ("A", java.sql.Date.valueOf("2024-03-01"), 2L))
      .toDF("sym2", "qdate", "qid")
    val probe = Seq(
        (1L, "A", ts("2024-01-02 00:00:00")), // 1 day after qid 1: survives
        (2L, "A", ts("2024-02-20 00:00:00")), // 50 days after qid 1: nulled
        (3L, "A", ts("2024-03-02 12:00:00"))  // 1.5 days after qid 2: survives
      ).toDF("trade_id", "sym", "tts")
    val got = AsOf.backward(probe, ref,
        "sym", "sym2", "tts", "qdate", Seq("qid"), "qid",
        toleranceSec = Some(7L * 86400L))
      .collect().map(r => r.getAs[Long]("trade_id") ->
        Option(r.getAs[Any]("qid"))).toMap
    assert(got == Map(1L -> Some(1L), 2L -> None, 3L -> Some(2L)))
  }

  test("result is identical under repartitioning (determinism)") {
    val base = AsOf.backward(trades, quotesR,
      "sym", "sym2", "tts", "qts", Seq("qid", "price"), "qid")
    val shuffled = AsOf.backward(trades.repartition(7), quotesR.repartition(5),
      "sym", "sym2", "tts", "qts", Seq("qid", "price"), "qid")
    assert(rowsAsSet(base) == rowsAsSet(shuffled))
  }

  test("nearest: closer side wins; equal distance prefers backward; " +
    "tolerance bounds |distance|; unmatched keys null") {
    def run(tol: Option[Long] = None) = AsOf.nearest(trades, quotesR,
        "sym", "sym2", "tts", "qts", Seq("qid", "price"), "qid", tol)
      .orderBy("trade_id").collect()
      .map(r => r.getLong(0) -> (if (r.isNullAt(3)) None
        else Some(r.getLong(3)))).toMap
    val got = run()
    // trade 1 (09:59:59): 1 s before qid 1 vs hours after -> forward qid 1
    // trade 2 (10:00:00): exact hit -> backward qid 1 (distance 0)
    // trade 3 (11:00:00): tie run at distance 0 -> backward rule, qid 3
    // trade 4 (11:30:00): 30 min back to 11:00 vs 30 min fwd to 12:00
    //                     — EQUAL distance -> backward preference, qid 3
    // trade 5 (23:00:00): nothing after -> backward qid 4
    // trade 6 (B 10:31): backward qid 5
    // trade 7 (C): no quotes -> null
    assert(got == Map(1L -> Some(1L), 2L -> Some(1L), 3L -> Some(3L),
      4L -> Some(3L), 5L -> Some(4L), 6L -> Some(5L), 7L -> None),
      s"nearest picks wrong: $got")
    // symmetric horizon: 1 s keeps only exact/1-s matches
    val tight = run(tol = Some(1L))
    assert(tight == Map(1L -> Some(1L), 2L -> Some(1L), 3L -> Some(3L),
      4L -> None, 5L -> None, 6L -> None, 7L -> None),
      s"tolerance horizon wrong: $tight")
  }

  test("plan contract: nearest stays ONE Exchange, one Window pass") {
    val plan = AsOf.nearest(trades, quotesR,
        "sym", "sym2", "tts", "qts", Seq("qid", "price"), "qid")
      .queryExecution.executedPlan.toString()
    val exchanges = plan.linesIterator.count(_.contains("Exchange"))
    assert(exchanges == 1,
      s"expected exactly 1 Exchange, found $exchanges:\n${plan.take(2000)}")
    val windows = plan.linesIterator.count(_.contains("Window ["))
    assert(windows == 1,
      s"both frames must share one Window operator, found $windows:\n" +
        plan.take(2000))
    val sorts = plan.linesIterator.count(_.contains("Sort "))
    assert(sorts == 1,
      s"expected exactly 1 Sort, found $sorts:\n${plan.take(2000)}")
  }

  test("plan contract: exactly ONE keyed Exchange (the 100 TB claim)") {
    // the scaladoc's cost claim — "exactly a sort-merge join's
    // shuffle+sort on the same key" — as a plan assertion, so a
    // Catalyst change that slips a second shuffle (or a sort per
    // side) under the union can't regress silently while results
    // stay right
    val plan = AsOf.backward(trades, quotesR,
        "sym", "sym2", "tts", "qts", Seq("qid", "price"), "qid")
      .queryExecution.executedPlan.toString()
    val exchanges = plan.linesIterator.count(_.contains("Exchange"))
    assert(exchanges == 1,
      s"expected exactly 1 Exchange, found $exchanges:\n${plan.take(2000)}")
    val sorts = plan.linesIterator.count(_.contains("Sort "))
    assert(sorts == 1,
      s"expected exactly 1 Sort (under the window), found $sorts:\n" +
        plan.take(2000))
  }

  test("plan contract: salted variant stays one Exchange, flat sort keys") {
    val plan = AsOf.backwardSalted(trades, quotesR,
        "sym", "sym2", "tts", "qts", Seq("qid", "price"), "qid",
        factor = 4)
      .queryExecution.executedPlan.toString()
    val exchanges = plan.linesIterator.count(_.contains("Exchange"))
    assert(exchanges == 1,
      s"expected exactly 1 Exchange, found $exchanges:\n${plan.take(2000)}")
    // the window partition key must be the flat (_k0, _k1) pair — a
    // struct key loses the sort-prefix comparator (see BASELINE.md)
    assert(plan.contains("_k0") && plan.contains("_k1"),
      s"flat salt key columns missing from plan:\n${plan.take(2000)}")
  }
}
