package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{OutputMode, Trigger}
import graft.Tables
import graft.streaming.Streams

/** Hash-gated Structured Streaming surface — the r9 verdict's gap #5:
  * streaming had spec-level batch-equivalence proofs and a bench, but
  * no entry in the DuckDB oracle gate. Each query here stages the sf
  * events table as time-ordered parquet slices, drives a REAL
  * streaming job over them (file source, `maxFilesPerTrigger=1` so
  * the run is genuinely multi-micro-batch — state merges across
  * [[Slices]] batches, not one), drains with `Trigger.AvailableNow`
  * into a memory sink, and returns the drained frame to the standard
  * hash gate, whose oracle is the batch SQL formulation.
  *
  * Determinism contract:
  *  - slices are TIME-ORDERED (ntile over (ts, event_id)), so no row
  *    is ever late relative to the watermark → nothing is dropped and
  *    the drained output is exactly the batch answer at any slicing;
  *  - `value` is milli-quantized to LONG at staging, so streaming
  *    aggregation state is integer-exact (the repo's no-floats-in-
  *    gate-outputs arithmetic contract) — a float running sum would
  *    depend on batch boundaries;
  *  - the interval join emits every qualifying pair exactly once:
  *    with ts-ordered slices a buffered left row can only be evicted
  *    once the watermark passes `l_ts + upper`, by which point every
  *    qualifying right row (r_ts ≤ l_ts + upper) has already arrived.
  *
  * bench=false: streaming latency is [[graft.StreamBench]]'s job; the
  * staging write would dominate a timed body here. */
object StreamQueries extends QueryPack {

  private val Slices = 8

  /** Stage the events table as [[Slices]] time-ordered single-file
    * parquet slices (distinct mtimes → deterministic file-source
    * replay order) under a fresh temp dir; `value` pre-quantized to
    * tenth-of-milli longs. Returns (root, schema). */
  private def stage(s: SparkSession, d: String) = {
    val root =
      java.nio.file.Files.createTempDirectory("graft_sgate").toString
    val events = Tables.events(s, d)
      .select(col("event_id"), col("ts"), col("user_id"),
        col("event_type"),
        round(col("value") * 10000).cast("long").as("value"))
    val sliced = events.withColumn("_slice",
      ntile(Slices).over(org.apache.spark.sql.expressions.Window
        .orderBy(col("ts"), col("event_id")))).cache()
    (1 to Slices).foreach { i =>
      sliced.filter(col("_slice") === i).drop("_slice")
        .coalesce(1).write.parquet(s"$root/events/slice_$i")
      Thread.sleep(20)
    }
    sliced.unpersist()
    (root, events.schema)
  }

  private def readSliced(s: SparkSession, root: String,
                         schema: org.apache.spark.sql.types.StructType) =
    s.readStream.schema(schema).option("maxFilesPerTrigger", "1")
      .parquet(s"$root/events/slice_*")

  /** Drain `df` through a memory sink and return the sink table. */
  private def drain(s: SparkSession, df: DataFrame, mode: OutputMode,
                    root: String, tag: String): DataFrame = {
    val table = s"sgate_${tag}_" +
      java.lang.Long.toHexString(System.nanoTime())
    val q = df.writeStream.format("memory").queryName(table)
      .outputMode(mode)
      .option("checkpointLocation", s"$root/ckpt_$tag")
      .trigger(Trigger.AvailableNow()).start()
    q.awaitTermination()
    s.table(table)
  }

  /** Watermarked tumbling-window aggregation
    * ([[Streams.windowedCounts]]), drained across 8 micro-batches in
    * Complete mode: the final sink content must equal the one-shot
    * batch GROUP BY — gating cross-batch state merge, window
    * assignment, and sink fidelity in one artifact. */
  val streamWindowedCounts = GQuery(
    "q_stream_windowed_counts",
    (s, d) => {
      val (root, schema) = stage(s, d)
      val out = drain(s,
        Streams.windowedCounts(readSliced(s, root, schema),
          windowLen = "1 hour", watermark = "2 hours"),
        OutputMode.Complete, root, "win")
      out.select(
          date_format(col("window_start"), "yyyy-MM-dd HH:mm:ss")
            .as("window_start"),
          col("event_type"), col("n_events"), col("total_value"))
        .orderBy("window_start", "event_type")
    },
    Some("""
      SELECT strftime(date_trunc('hour', ts), '%Y-%m-%d %H:%M:%S')
               AS window_start,
             event_type,
             CAST(COUNT(*) AS BIGINT) AS n_events,
             CAST(SUM(CAST(ROUND(value * 1e4) AS BIGINT)) AS BIGINT)
               AS total_value
      FROM events
      GROUP BY 1, 2 ORDER BY window_start, event_type
    """),
    bench = false, eager = true)

  /** Stream-stream interval join ([[Streams.intervalJoin]]) — the
    * click→purchase attribution self-join, drained in Append mode:
    * every (click, purchase) pair of the same user with the purchase
    * 1..1800 s after the click, each exactly once. The oracle is the
    * plain batch range join. */
  val streamIntervalJoin = GQuery(
    "q_stream_interval_join",
    (s, d) => {
      val (root, schema) = stage(s, d)
      val clicks = readSliced(s, root, schema)
        .filter(col("event_type") === "click")
      val purchases = readSliced(s, root, schema)
        .filter(col("event_type") === "purchase")
      val joined = Streams.intervalJoin(clicks, purchases,
        "user_id", "user_id", "ts", "ts",
        lowerSec = 1, upperSec = 1800, watermark = "2 hours")
      drain(s,
        joined.select(col("l_event_id"), col("r_event_id"),
          col("l_user_id").as("user_id")),
        OutputMode.Append, root, "ij")
        .orderBy("l_event_id", "r_event_id")
    },
    Some("""
      SELECT c.event_id AS l_event_id, p.event_id AS r_event_id,
             c.user_id
      FROM events c JOIN events p
        ON c.user_id = p.user_id
       AND c.event_type = 'click' AND p.event_type = 'purchase'
       AND p.ts >= c.ts + INTERVAL 1 SECOND
       AND p.ts <= c.ts + INTERVAL 1800 SECOND
      ORDER BY l_event_id, r_event_id
    """),
    bench = false, eager = true)

  def all: Seq[GQuery] = Seq(streamWindowedCounts, streamIntervalJoin)
}
