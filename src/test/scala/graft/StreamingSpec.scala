package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger
import graft.streaming.Streams

/** S11/ST5 + Structured Streaming surface: sensor-tick ingestion with
  * checkpoint-ledger semantics, watermarked windowed aggregation
  * equivalence vs batch, and stateful sessionization across
  * micro-batches. */
class StreamingSpec extends SparkSpec {

  private def writeCsv(dir: String, name: String, lines: Seq[String]): Unit = {
    val p = java.nio.file.Paths.get(dir)
    java.nio.file.Files.createDirectories(p)
    java.nio.file.Files.write(p.resolve(name),
      lines.mkString("\n").getBytes("UTF-8"))
  }

  private val eventsSchema = org.apache.spark.sql.types.StructType.fromDDL(
    "event_id LONG, ts TIMESTAMP, user_id LONG, event_type STRING, value DOUBLE")

  test("sensor tick drains only NEW files (checkpoint = file ledger)") {
    val root = graft.TempRoots.create("graft_stream")
    val landing = s"$root/landing"
    val header = "event_id,ts,user_id,event_type,value"
    writeCsv(landing, "batch1.csv", Seq(header,
      "1,2026-04-01 10:00:00,7,click,1.0",
      "2,2026-04-01 10:05:00,7,click,2.0"))
    Streams.sensorIngestOnce(spark, landing, eventsSchema,
      s"$root/staging", s"$root/ckpt")
    assert(spark.read.parquet(s"$root/staging").count() == 2)
    // second tick with one NEW file: only its rows land
    writeCsv(landing, "batch2.csv", Seq(header,
      "3,2026-04-01 11:00:00,8,signup,3.0"))
    Streams.sensorIngestOnce(spark, landing, eventsSchema,
      s"$root/staging", s"$root/ckpt")
    val staged = spark.read.parquet(s"$root/staging")
    assert(staged.count() == 3, "old file must not be re-ingested")
    assert(staged.filter(col("event_id") === 3).count() == 1)
  }

  test("watermarked windowed counts match the batch computation") {
    val root = graft.TempRoots.create("graft_wc")
    val events = Tables.events(spark, TinySf)
    events.write.parquet(s"$root/events")
    val stream = spark.readStream.schema(events.schema)
      .parquet(s"$root/events")
    val q = Streams.windowedCounts(stream)
      .writeStream.format("memory").queryName("wc")
      .outputMode("complete")
      .trigger(Trigger.AvailableNow()).start()
    q.awaitTermination()
    val streamed = spark.table("wc")
      .select(col("window_start"), col("event_type"), col("n_events"))
    val batch = events
      .groupBy(window(col("ts"), "1 hour"), col("event_type"))
      .agg(count(lit(1)).as("n_events"))
      .select(col("window.start").as("window_start"),
        col("event_type"), col("n_events"))
    assert(rowsAsSet(streamed) == rowsAsSet(batch))
    assert(streamed.count() > 0)
  }

  test("streaming dedup drops re-deliveries across micro-batches") {
    val root = graft.TempRoots.create("graft_dd")
    val src = s"$root/src"; val out = s"$root/out"; val ckpt = s"$root/ckpt"
    val header = "event_id,ts,user_id,event_type,value"
    def drain(): Unit = {
      val stream = spark.readStream.schema(eventsSchema)
        .option("header", "true").csv(src)
      val q = Streams.dedupWithinWatermark(stream, "1 hour", Seq("event_id"))
        .writeStream.format("parquet").option("path", out)
        .option("checkpointLocation", ckpt)
        .trigger(Trigger.AvailableNow()).start()
      q.awaitTermination()
    }
    writeCsv(src, "b1.csv", Seq(header,
      "1,2026-04-01 10:00:00,7,click,1.0",
      "1,2026-04-01 10:00:00,7,click,1.0", // in-batch duplicate
      "2,2026-04-01 10:05:00,7,click,2.0"))
    drain()
    // re-delivery of event 1 in a later micro-batch, plus a new event
    writeCsv(src, "b2.csv", Seq(header,
      "1,2026-04-01 10:00:00,7,click,1.0",
      "3,2026-04-01 10:10:00,8,signup,3.0"))
    drain()
    val ids = spark.read.parquet(out).select("event_id")
      .collect().map(_.getLong(0)).sorted.toSeq
    assert(ids == Seq(1L, 2L, 3L),
      s"each event exactly once across batches, got $ids")
  }

  test("stream-static enrichment broadcasts the dim; unmatched keys survive") {
    val root = graft.TempRoots.create("graft_enr")
    val events = Tables.events(spark, TinySf)
    events.write.parquet(s"$root/events")
    val s = spark; import s.implicits._
    val dim = Seq(("click", "engagement"), ("signup", "conversion"))
      .toDF("event_type", "category")
    val stream = spark.readStream.schema(events.schema)
      .parquet(s"$root/events")
    val q = Streams.enrich(stream, dim, Seq("event_type"))
      .writeStream.format("memory").queryName("enr")
      .trigger(Trigger.AvailableNow()).start()
    q.awaitTermination()
    val out = spark.table("enr")
    assert(out.count() == events.count(),
      "left enrichment must keep every stream row")
    val cats = out.groupBy("event_type", "category").count().collect()
      .map(r => r.getString(0) -> Option(r.getString(1))).toMap
    assert(cats.get("click").flatten.contains("engagement"))
    // event types outside the dim survive with a null category
    assert(cats.values.exists(_.isEmpty) ||
      cats.keySet.subsetOf(Set("click", "signup")))
  }

  test("point-in-time enrichment picks the version valid AT the event " +
    "— where the is_current join would leak future attributes") {
    val root = graft.TempRoots.create("graft_pit")
    val s = spark; import s.implicits._
    val events = Seq(
      (1L, java.sql.Timestamp.valueOf("2026-04-01 10:00:00"), 7L),
      (2L, java.sql.Timestamp.valueOf("2026-04-03 10:00:00"), 7L),
      (3L, java.sql.Timestamp.valueOf("2026-04-01 10:00:00"), 8L))
      .toDF("event_id", "ts", "user_id")
    events.write.parquet(s"$root/events")
    val history = Seq(
      (7L, "basic",
        java.sql.Timestamp.valueOf("2026-03-01 00:00:00"),
        Option(java.sql.Timestamp.valueOf("2026-04-02 00:00:00")), 0),
      (7L, "premium",
        java.sql.Timestamp.valueOf("2026-04-02 00:00:00"), None, 1),
      (8L, "basic",
        java.sql.Timestamp.valueOf("2026-03-01 00:00:00"), None, 1))
      .toDF("user_id", "plan", "valid_from", "valid_to", "is_current")
    val stream = spark.readStream.schema(events.schema)
      .parquet(s"$root/events")
    val q = Streams.enrichPointInTime(stream, history, "user_id", "ts")
      .writeStream.format("memory").queryName("pit")
      .trigger(Trigger.AvailableNow()).start()
    q.awaitTermination()
    val plans = spark.table("pit").collect()
      .map(r => r.getAs[Long]("event_id") -> r.getAs[String]("d_plan"))
      .toMap
    assert(plans == Map(1L -> "basic", 2L -> "premium", 3L -> "basic"),
      s"point-in-time versions wrong: $plans")
    // the leak the operator exists to prevent: is_current stamps the
    // 2026-04-01 event with the plan the user only adopted on 04-02
    val leaked = events
      .join(history.filter(col("is_current") === 1), "user_id")
      .filter(col("event_id") === 1L).head().getAs[String]("plan")
    assert(leaked == "premium",
      "fixture no longer demonstrates the is_current leak")
  }

  test("stream-stream interval join matches batch; bounds enforced") {
    val root = graft.TempRoots.create("graft_ssj")
    val header = "event_id,ts,user_id,event_type,value"
    // clicks and purchases: purchase attributes to a click of the same
    // user within [0, 30 min] AFTER the click
    writeCsv(s"$root/clicks", "c.csv", Seq(header,
      "1,2026-04-01 10:00:00,7,click,0",
      "2,2026-04-01 11:00:00,7,click,0",
      "3,2026-04-01 10:00:00,9,click,0"))
    writeCsv(s"$root/buys", "b.csv", Seq(header,
      "11,2026-04-01 10:10:00,7,purchase,5.0", // -> click 1
      "12,2026-04-01 11:29:00,7,purchase,9.0", // -> click 2 (29 min)
      "13,2026-04-01 11:31:00,9,purchase,2.0", // 91 min after click 3: out
      "14,2026-04-01 10:20:00,8,purchase,1.0")) // no click for user 8
    def src(dir: String) = spark.readStream.schema(eventsSchema)
      .option("header", "true").csv(dir)
    val q = Streams.intervalJoin(src(s"$root/clicks"), src(s"$root/buys"),
        "user_id", "user_id", "ts", "ts",
        lowerSec = 0L, upperSec = 1800L)
      .writeStream.format("memory").queryName("ssj")
      .trigger(Trigger.AvailableNow()).start()
    q.awaitTermination()
    val got = spark.table("ssj")
      .select("l_event_id", "r_event_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(got == Set((1L, 11L), (2L, 12L)))
  }

  test("left-outer interval join: null padding emits exactly at watermark expiry") {
    val root = graft.TempRoots.create("graft_ssjo")
    val header = "event_id,ts,user_id,event_type,value"
    val ckpt = s"$root/ckpt"
    writeCsv(s"$root/clicks", "c.csv", Seq(header,
      "1,2026-04-01 10:00:00,7,click,0", // matched by buy 11
      "2,2026-04-01 10:00:00,8,click,0", // never matched -> null pad
      "3,2026-04-01 13:00:00,9,click,0")) // never matched, stays open
    writeCsv(s"$root/buys", "b1.csv", Seq(header,
      "11,2026-04-01 10:10:00,7,purchase,5.0"))
    // maxFilesPerTrigger=1: watermark advancement acts on the NEXT
    // micro-batch, so the expiry-emission batch needs a successor —
    // one file per trigger makes phase 2's two files two batches
    def src(dir: String) = spark.readStream.schema(eventsSchema)
      .option("header", "true").option("maxFilesPerTrigger", "1").csv(dir)
    // file sink: supports checkpoint recovery (memory sink does not)
    // and its metadata log makes the emitted-row history inspectable
    def run(): Seq[(Long, Option[Long])] = {
      val q = Streams.intervalJoin(src(s"$root/clicks"), src(s"$root/buys"),
          "user_id", "user_id", "ts", "ts",
          lowerSec = 0L, upperSec = 1800L, watermark = "10 minutes",
          joinType = "leftOuter")
        .select("l_event_id", "r_event_id")
        .writeStream.format("parquet")
        .option("path", s"$root/out")
        .option("checkpointLocation", ckpt)
        .trigger(Trigger.AvailableNow()).start()
      q.awaitTermination()
      spark.read.parquet(s"$root/out").collect().toSeq
        .map(r => r.getLong(0) ->
          (if (r.isNullAt(1)) None else Some(r.getLong(1))))
    }

    // phase 1: the GLOBAL watermark is min over both inputs — buys
    // max ts is 10:10, so the watermark (10:00) has NOT passed click
    // 2's match horizon (10:30). The unmatched row must NOT emit yet:
    // a match could still arrive. Only the inner match appears.
    val phase1 = run()
    assert(phase1.toSet == Set(1L -> Some(11L)),
      s"click 2 null-padded before its horizon expired: $phase1")

    // phase 2 (same checkpoint, sink accumulates): later events on
    // BOTH sides lift the global watermark (min across inputs; a side
    // with no new data holds it down — the operational reason quiet
    // streams delay outer emission) to 12:50 — past click 2's horizon,
    // so its null-padded row must now emit; clicks 3/4 (13:00) are
    // still inside their horizon and must stay buffered, not padded.
    writeCsv(s"$root/clicks", "c2.csv", Seq(header,
      "4,2026-04-01 13:00:00,6,click,0")) // advances the clicks watermark
    writeCsv(s"$root/buys", "b2.csv", Seq(header,
      "12,2026-04-01 13:05:00,5,purchase,1.0")) // user 5: matches nothing
    writeCsv(s"$root/buys", "b3.csv", Seq(header,
      "13,2026-04-01 13:06:00,5,purchase,1.0")) // drives the post-advance batch
    val phase2 = run()
    assert(phase2.contains(2L -> None),
      s"click 2 not null-padded after watermark expiry: $phase2")
    assert(!phase2.exists(p => p._1 == 3L || p._1 == 4L),
      s"open-horizon click emitted before its horizon expired: $phase2")
    assert(phase2.count(_ == (1L -> Some(11L))) == 1,
      s"exactly-once violated: phase 1's match re-emitted: $phase2")
  }

  test("sessionization state survives micro-batches; gap closes sessions") {
    import spark.implicits._
    val root = graft.TempRoots.create("graft_sess")
    val src = s"$root/src"; val ckpt = s"$root/ckpt"; val out = s"$root/out"
    val header = "event_id,ts,user_id,event_type,value"

    def drain(): Unit = {
      val stream = spark.readStream.schema(eventsSchema)
        .option("header", "true").csv(src)
      val q = Streams.sessionize(stream.as[Streams.Event], gapMinutes = 30)
        .writeStream.format("parquet").option("path", out)
        .option("checkpointLocation", ckpt)
        .outputMode("append")
        .trigger(Trigger.AvailableNow()).start()
      q.awaitTermination()
    }

    // batch 1: user 7 has a 2-event session, then nothing
    writeCsv(src, "b1.csv", Seq(header,
      "1,2026-04-01 10:00:00,7,click,1.0",
      "2,2026-04-01 10:10:00,7,click,1.0"))
    drain()
    assert(spark.read.schema("user_id LONG, session_start TIMESTAMP," +
      "session_end TIMESTAMP, n_events INT").parquet(out).count() == 0,
      "open session must stay in state, not emit")

    // batch 2: an event 3 h later closes the session and opens a new one
    writeCsv(src, "b2.csv", Seq(header,
      "3,2026-04-01 13:00:00,7,click,1.0"))
    drain()
    val sessions = spark.read.parquet(out)
    assert(sessions.count() == 1)
    val s0 = sessions.head()
    assert(s0.getAs[Long]("user_id") == 7L)
    assert(s0.getAs[Int]("n_events") == 2)
    assert(s0.getAs[java.sql.Timestamp]("session_end").toString
      .startsWith("2026-04-01 10:10"))

    // batch 3: ANOTHER user's far-future event advances the watermark
    // past user 7's last+gap → the idle session flushes via the
    // event-time timeout and its state row is removed (bounded state)
    writeCsv(src, "b3.csv", Seq(header,
      "4,2026-04-02 09:00:00,9,click,1.0"))
    drain()
    writeCsv(src, "b4.csv", Seq(header,
      "5,2026-04-02 09:01:00,9,click,1.0"))
    drain()
    val flushed = spark.read.parquet(out)
      .filter(col("user_id") === 7L).orderBy("session_start").collect()
    assert(flushed.length == 2,
      s"idle user's open session must flush on watermark advance: ${flushed.length}")
    assert(flushed(1).getAs[java.sql.Timestamp]("session_end").toString
      .startsWith("2026-04-01 13:00"))
  }

  test("session_window agrees with the hand-rolled sessionizer on " +
    "membership; its end is last+gap by convention") {
    import spark.implicits._
    val root = graft.TempRoots.create("graft_sw")
    val src = s"$root/src"; val ckpt = s"$root/ckpt"; val out = s"$root/out"
    val header = "event_id,ts,user_id,event_type,value"
    def drain(): Unit = {
      val stream = spark.readStream.schema(eventsSchema)
        .option("header", "true").csv(src)
      val q = Streams.sessionWindowCounts(stream, "30 minutes", "30 minutes")
        .writeStream.format("parquet").option("path", out)
        .option("checkpointLocation", ckpt)
        .outputMode("append")
        .trigger(Trigger.AvailableNow()).start()
      q.awaitTermination()
    }
    // session A: two events 10 min apart; then a 3 h gap opens B; a
    // far-future other-user event advances the watermark so B flushes
    writeCsv(src, "b1.csv", Seq(header,
      "1,2026-04-01 10:00:00,7,click,1.0",
      "2,2026-04-01 10:10:00,7,click,1.0"))
    drain()
    writeCsv(src, "b2.csv", Seq(header,
      "3,2026-04-01 13:00:00,7,click,1.0"))
    drain()
    writeCsv(src, "b3.csv", Seq(header,
      "4,2026-04-02 09:00:00,9,click,1.0"))
    drain()
    val sessions = spark.read.parquet(out)
      .filter(col("user_id") === 7L).orderBy("session_start").collect()
    assert(sessions.length == 2, sessions.mkString("; "))
    assert(sessions(0).getAs[Long]("n_events") == 2L)
    // the built-in window's end = last event + gap (exclusive horizon),
    // where sessionize reports the last event itself — the pinned
    // semantic difference
    assert(sessions(0).getAs[java.sql.Timestamp]("session_end").toString
      .startsWith("2026-04-01 10:40"), sessions(0).toString)
    assert(sessions(1).getAs[Long]("n_events") == 1L)
    assert(sessions(1).getAs[java.sql.Timestamp]("session_end").toString
      .startsWith("2026-04-01 13:30"), sessions(1).toString)
  }

  test("sentinel-barrier drain is slicing-invariant: every real " +
    "session flushes exactly once under 2-slice and 3-slice replays") {
    // The hash-gate pattern (StreamQueries): a finite replay of an
    // always-on stateful topology drains COMPLETELY when two
    // far-future barrier events follow the data — the first advances
    // the watermark past every real timeout, the second drives the
    // post-advance batch where timeouts fire. The drained output must
    // not depend on where micro-batch boundaries fall.
    import spark.implicits._
    val header = "event_id,ts,user_id,event_type,value"
    // user 7: two sessions (gap 30 min); user 8: one session whose
    // last event is the latest REAL event — flushes only via barrier
    val rows = Seq(
      "1,2026-04-01 10:00:00,7,click,1.0",
      "2,2026-04-01 10:10:00,7,click,1.0",
      "3,2026-04-01 13:00:00,7,click,1.0",
      "4,2026-04-01 13:20:00,8,click,1.0",
      "5,2026-04-01 13:25:00,8,click,1.0")
    val barrier = Seq(
      "-1,2026-07-01 00:00:00,-1,sentinel,0",
      "-2,2026-07-01 01:00:00,-1,sentinel,0")
    def drainSliced(slices: Seq[Seq[String]]): Seq[(Long, String, Int)] = {
      val root = graft.TempRoots.create("graft_sb")
      (slices :+ barrier.take(1) :+ barrier.drop(1)).zipWithIndex.foreach {
        case (ls, i) =>
          writeCsv(s"$root/src", s"b$i.csv", header +: ls)
          Thread.sleep(20)
      }
      val stream = spark.readStream.schema(eventsSchema)
        .option("header", "true").option("maxFilesPerTrigger", "1")
        .csv(s"$root/src")
      val table = "sb_" + java.lang.Long.toHexString(System.nanoTime())
      val q = Streams.sessionize(stream.as[Streams.Event], gapMinutes = 30)
        .filter(_.user_id >= 0)
        .writeStream.format("memory").queryName(table)
        .outputMode("append")
        .option("checkpointLocation", s"$root/ckpt")
        .trigger(Trigger.AvailableNow()).start()
      q.awaitTermination()
      spark.table(table)
        .select(col("user_id"), col("session_start").cast("string"),
          col("n_events"))
        .as[(Long, String, Int)].collect().toSeq.sorted
    }
    val two = drainSliced(Seq(rows.take(3), rows.drop(3)))
    val three = drainSliced(Seq(rows.take(2), rows.slice(2, 4), rows.drop(4)))
    assert(two == three, s"$two vs $three")
    assert(two.map(t => (t._1, t._3)) == Seq((7L, 2), (7L, 1), (8L, 2)),
      s"all three real sessions must flush exactly once: $two")
  }
}
