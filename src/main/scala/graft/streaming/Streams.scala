package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode, Trigger}
import org.apache.spark.sql.types.StructType

/** Structured Streaming surface — SURVEY.md §2.1 S11 + §2.9 ST5.
  *
  * The reference's "streaming" is a PythonSensor polling a landing
  * folder every 60 s plus an MD5 ledger for new-file detection
  * (dags/Reprocessing.py:160-185, DataWarehouse.py:67-116). Spark's
  * file source subsumes BOTH: the checkpoint's file log IS the
  * processed-file ledger (exactly-once, new-files-only), and
  * `Trigger.AvailableNow` IS the poll tick — one invocation per
  * sensor wake-up drains everything new and stops. The same code runs
  * always-on by swapping the trigger for a processing-time interval.
  */
object Streams {

  /** S11/ST5: one sensor tick — drain all NEW csv files under
    * `landingDir` into the staging parquet sink. Re-running with the
    * same checkpoint skips files already processed (ledger semantics);
    * files added between ticks are picked up by the next call. */
  def sensorIngestOnce(spark: SparkSession, landingDir: String,
                       schema: StructType, stagingPath: String,
                       checkpoint: String): Unit = {
    val stream = spark.readStream
      .schema(schema).option("header", "true").csv(landingDir)
    val q = stream.writeStream
      .format("parquet")
      .option("path", stagingPath)
      .option("checkpointLocation", checkpoint)
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination()
  }

  /** Watermarked tumbling-window aggregation over an event stream:
    * event-time windows on `ts`, late data beyond the watermark
    * dropped. At 100 TB/day the state store holds only open windows
    * per (window, event_type) — bounded by the watermark horizon,
    * not the stream length. */
  def windowedCounts(events: DataFrame, windowLen: String = "1 hour",
                     watermark: String = "2 hours"): DataFrame =
    events
      .withWatermark("ts", watermark)
      .groupBy(window(col("ts"), windowLen), col("event_type"))
      .agg(count(lit(1)).as("n_events"),
        sum(col("value")).as("total_value"))
      .select(col("window.start").as("window_start"),
        col("event_type"), col("n_events"), col("total_value"))

  /** Built-in session windows: per-user gap-based sessions via
    * `session_window` — the DECLARATIVE counterpart of [[sessionize]]
    * (flatMapGroupsWithState). Prefer THIS form when the per-session
    * output is expressible as aggregates: the state store is managed
    * by the engine (merge-on-update, watermark eviction), the plan
    * stays in the optimized streaming-aggregation path, and there is
    * no user state-machine code to get timeout semantics wrong in.
    * Drop to [[sessionize]] only for non-aggregable per-session logic.
    *
    * Semantic contract vs [[sessionize]]: identical session
    * MEMBERSHIP for the same gap, but `session_end` here is
    * `last event + gap` (the window's exclusive horizon — Spark's
    * session_window convention) where sessionize reports the last
    * event itself; pinned in StreamingSpec so nobody "fixes" one to
    * the other. */
  def sessionWindowCounts(events: DataFrame, gap: String = "30 minutes",
                          watermark: String = "1 hour"): DataFrame =
    events
      .withWatermark("ts", watermark)
      .groupBy(session_window(col("ts"), gap), col("user_id"))
      .agg(count(lit(1)).as("n_events"))
      .select(col("session_window.start").as("session_start"),
        col("session_window.end").as("session_end"),
        col("user_id"), col("n_events"))

  /** Streaming exact dedup: drop re-deliveries of the same `idCols`
    * within the watermark horizon (the at-least-once file/queue
    * delivery case). State is bounded by the horizon — the reason to
    * prefer dropDuplicatesWithinWatermark over plain dropDuplicates,
    * whose state grows with the stream. */
  def dedupWithinWatermark(events: DataFrame, watermark: String,
                           idCols: Seq[String]): DataFrame =
    events.withWatermark("ts", watermark)
      .dropDuplicatesWithinWatermark(idCols)

  /** Stream-static enrichment: join each micro-batch against a
    * (small) static reference frame, broadcast so the stream side
    * never shuffles. Stateless — no watermark, no state store — the
    * pattern for decorating a 100 TB/day event stream with dimension
    * attributes; the static side is planned per micro-batch, so a
    * file-backed dim picks up layer overwrites between batches. */
  def enrich(stream: DataFrame, dim: DataFrame, keys: Seq[String],
             joinType: String = "left"): DataFrame =
    stream.join(broadcast(dim), keys, joinType)

  /** Point-in-time-correct enrichment against an SCD2 history
    * dimension ([[graft.ops.Scd]] layout): each event joins the dim
    * VERSION whose validity interval contains the event time —
    * `valid_from <= ts < valid_to` (open `valid_to` = current). This
    * is the feature-LEAKAGE guard: the obvious `is_current` join
    * stamps past events with future attribute values, and a model
    * trained on that beats production for exactly as long as it takes
    * to ship (the spec pins the divergence). Static side broadcasts
    * and is re-read per micro-batch, so slowly-changing updates are
    * picked up without restarting the stream; at most one version
    * matches per event by the SCD2 non-overlap invariant, so the join
    * never fans out. Dim columns come back `d_`-prefixed (the key
    * twice would collide; events keep their names). */
  def enrichPointInTime(stream: DataFrame, history: DataFrame,
                        key: String, eventTs: String,
                        validFrom: String = "valid_from",
                        validTo: String = "valid_to",
                        joinType: String = "left"): DataFrame = {
    val h = history.columns.foldLeft(history)((d, c) =>
      d.withColumnRenamed(c, s"d_$c"))
    stream.join(broadcast(h),
      col(key) === col(s"d_$key") &&
        col(s"d_$validFrom") <= col(eventTs) &&
        (col(s"d_$validTo").isNull ||
          col(eventTs) < col(s"d_$validTo")),
      joinType)
  }

  /** Stream-stream interval join: correlate two live streams on a key
    * where the right event lands within [leftTs + lowerSec,
    * leftTs + upperSec] of the left event (e.g. click→purchase
    * attribution). BOTH sides carry watermarks and the join condition
    * carries explicit time bounds — that pair is what lets the state
    * store evict: a buffered left row can be dropped once the right
    * watermark passes leftTs + upperSec (and symmetrically), so state
    * is bounded by watermark delay + interval width, never by stream
    * length. Without the time bounds Spark must buffer both streams
    * forever (it still runs, unbounded — the classic silent OOM at
    * production volume).
    *
    * Columns are prefixed `l_`/`r_` before the join: stream-stream
    * joins reject ambiguous self-join column references, and
    * attribution joins are frequently self-joins of one event stream.
    */
  def intervalJoin(left: DataFrame, right: DataFrame,
                   leftKey: String, rightKey: String,
                   leftTs: String, rightTs: String,
                   lowerSec: Long, upperSec: Long,
                   watermark: String = "2 hours",
                   joinType: String = "inner"): DataFrame = {
    require(lowerSec <= upperSec,
      s"empty interval: [$lowerSec, $upperSec]")
    val l = left.columns.foldLeft(left)((d, c) =>
      d.withColumnRenamed(c, s"l_$c")).withWatermark(s"l_$leftTs", watermark)
    val r = right.columns.foldLeft(right)((d, c) =>
      d.withColumnRenamed(c, s"r_$c")).withWatermark(s"r_$rightTs", watermark)
    l.join(r,
      col(s"l_$leftKey") === col(s"r_$rightKey") &&
        col(s"r_$rightTs") >= col(s"l_$leftTs") + expr(s"INTERVAL $lowerSec SECONDS") &&
        col(s"r_$rightTs") <= col(s"l_$leftTs") + expr(s"INTERVAL $upperSec SECONDS"),
      joinType)
  }

  final case class Event(event_id: Long, ts: java.sql.Timestamp,
                         user_id: Long, event_type: String, value: Double)
  final case class SessionState(start: Long, last: Long, n: Int)
  final case class Session(user_id: Long, session_start: java.sql.Timestamp,
                           session_end: java.sql.Timestamp, n_events: Int)

  /** Custom streaming state (§ Structured Streaming / KeyValueGrouped
    * mapGroupsWithState family): per-user sessionization with an
    * inactivity gap. A session CLOSES when a later event arrives more
    * than `gapMinutes` after the last one, OR when the event-time
    * watermark passes its last activity + gap (EventTimeTimeout) — the
    * timeout is what makes the state store genuinely bounded on an
    * always-on stream: an idle user's final session flushes and its
    * state row is removed instead of riding the checkpoint forever.
    * Emission is deterministic: a session emits exactly once, at
    * whichever close signal arrives first.
    *
    * LATE-DATA SEMANTICS: the watermark that powers EventTimeTimeout
    * also FILTERS input — an event more than `gapMinutes` behind the
    * max observed event time is dropped before reaching the state
    * function (it can no longer extend a session whose timeout may
    * already have fired, so emitting it would break exactly-once).
    * Events inside the watermark still merge across micro-batches via
    * the min/max handling below. If arbitrarily late replays matter,
    * widen the allowance by passing a `gapMinutes` larger than the
    * session gap to a wrapper — watermark lateness and session gap are
    * coupled here by design to keep state eviction prompt. */
  def sessionize(events: Dataset[Event], gapMinutes: Int): Dataset[Session] = {
    import events.sparkSession.implicits._
    val gapMs = gapMinutes * 60000L
    events
      .withWatermark("ts", s"$gapMinutes minutes")
      .groupByKey(_.user_id)
      .flatMapGroupsWithState[SessionState, Session](
        OutputMode.Append, GroupStateTimeout.EventTimeTimeout) {
        case (user: Long, _, state: GroupState[SessionState])
            if state.hasTimedOut =>
          val s = state.get
          state.remove()
          Iterator(Session(user, new java.sql.Timestamp(s.start),
            new java.sql.Timestamp(s.last), s.n))
        case (user: Long, batch: Iterator[Event], state: GroupState[SessionState]) =>
          val sorted = batch.toSeq.sortBy(_.ts.getTime)
          var cur = state.getOption
          val closed = Seq.newBuilder[Session]
          sorted.foreach { e =>
            val t = e.ts.getTime
            cur match {
              case Some(s) if t - s.last > gapMs =>
                closed += Session(user, new java.sql.Timestamp(s.start),
                  new java.sql.Timestamp(s.last), s.n)
                cur = Some(SessionState(t, t, 1))
              case Some(s) =>
                // a LATE cross-batch event extends membership but must
                // never move `last` (or `start`) backward — a backward
                // last corrupts the next gap decision and session_end
                cur = Some(SessionState(math.min(s.start, t),
                  math.max(s.last, t), s.n + 1))
              case None =>
                cur = Some(SessionState(t, t, 1))
            }
          }
          cur.foreach { s =>
            state.update(s)
            // timeout must sit strictly past the current watermark or
            // Spark rejects it (a very late batch can put last+gap
            // behind the watermark — the session then times out on
            // the next watermark advance, which is correct)
            state.setTimeoutTimestamp(math.max(s.last + gapMs,
              state.getCurrentWatermarkMs + 1))
          }
          closed.result().iterator
      }
  }
}
