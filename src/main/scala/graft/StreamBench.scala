package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{OutputMode, StreamingQuery, Trigger}

import graft.streaming.Streams

/** Streaming micro-bench — the measured evidence behind the
  * state-store cost claims in `streaming/Streams.scala` (BASELINE.md
  * §streaming records the numbers; the driver's timed bench covers
  * batch queries only).
  *
  * Method: the sf events table is staged into `SPARK_GRAFT_STREAM_BATCHES`
  * time-ordered slices (sequential writes → increasing mtimes → the
  * file source replays them oldest-first), then each streaming
  * operator runs with `maxFilesPerTrigger=1` + `Trigger.AvailableNow`
  * — a genuine multi-micro-batch run where the watermark advances
  * batch over batch and state is created, read back, and evicted
  * across batches, not a single-batch drain. Time-ordered staging is
  * deliberate: random slices would put most rows behind the watermark
  * after batch 1, silently dropping them and under-exercising state.
  *
  * Prints ONE JSON line:
  * {"metric":"stream_total","value":S,"unit":"sec","streams":{
  *   name:{"sec":S,"rows":N,"rows_per_sec":R,"state_rows":K,"batches":B}},…}
  */
object StreamBench {

  private final case class Run(sec: Double, rows: Long, stateRows: Long,
                               batches: Int)

  private def drain(q: StreamingQuery): (Long, Long, Int) = {
    q.awaitTermination()
    val progress = q.recentProgress
    val rows = progress.map(_.numInputRows).sum
    val stateRows = progress.reverseIterator
      .flatMap(_.stateOperators.map(_.numRowsTotal))
      .take(1).toSeq.headOption.getOrElse(0L)
    (rows, stateRows, progress.count(_.numInputRows > 0))
  }

  private def timed(build: => StreamingQuery): Run = {
    val t0 = System.nanoTime()
    val (rows, state, batches) = drain(build)
    Run((System.nanoTime() - t0) / 1e9, rows, state, batches)
  }

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val slices = sys.env.getOrElse("SPARK_GRAFT_STREAM_BATCHES", "8").toInt
    val spark = GraftSession.tune(SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false"))
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._

    val root = graft.TempRoots
      .create("graft_streambench")
    val stage = s"$root/events"

    // stage: time-ordered slices, one parquet file each, written
    // sequentially so file-source mtime order == event-time order
    // Tables.events converts the nanos-as-long parquet ts to timestamp
    val events = Tables.events(spark, sfDir)
      .select(col("event_id"), col("ts"), col("user_id"),
        col("event_type"), col("value"))
    // untimed staging: single-partition ntile is fine at staging scale
    val sliced = events.withColumn("_slice",
      ntile(slices).over(org.apache.spark.sql.expressions.Window
        .orderBy(col("ts")))).cache()
    (1 to slices).foreach { i =>
      sliced.filter(col("_slice") === i).drop("_slice")
        .coalesce(1).write.parquet(s"$stage/slice_$i")
      Thread.sleep(20) // distinct mtimes → deterministic replay order
    }
    sliced.unpersist()
    val schema = events.schema
    def readSliced(): DataFrame = spark.readStream.schema(schema)
      .option("maxFilesPerTrigger", "1")
      .parquet(s"$stage/slice_*")

    def noop(df: DataFrame, mode: OutputMode, ckpt: String): StreamingQuery =
      df.writeStream.format("noop").outputMode(mode)
        .option("checkpointLocation", s"$root/ckpt_$ckpt")
        .trigger(Trigger.AvailableNow()).start()

    // untimed warmup: streaming engine + state store + codegen init
    drain(noop(Streams.windowedCounts(readSliced()),
      OutputMode.Update, "warmup"))

    val runs = Seq[(String, () => Run)](
      // watermarked tumbling-window agg: ~720 (window × 5 types) state rows
      "windowed_counts" -> (() => timed(noop(
        Streams.windowedCounts(readSliced(), "1 hour", "2 hours"),
        OutputMode.Update, "window"))),
      // within-watermark exact dedup: state = ids inside the horizon
      "dedup_watermark" -> (() => timed(noop(
        Streams.dedupWithinWatermark(readSliced(), "2 hours", Seq("event_id")),
        OutputMode.Append, "dedup"))),
      // flatMapGroupsWithState sessionization: state = open sessions/user
      "sessionize" -> (() => timed(noop(
        Streams.sessionize(readSliced().as[Streams.Event], 30).toDF(),
        OutputMode.Append, "sess"))),
      // built-in session_window aggregation: same session membership,
      // engine-managed state — measures what the declarative path
      // costs/saves vs the hand-rolled state machine above
      "session_window" -> (() => timed(noop(
        Streams.sessionWindowCounts(readSliced(), "30 minutes", "1 hour"),
        OutputMode.Append, "sesswin"))),
      // stream-stream interval join (self-join: clicks×purchases shape
      // on one stream): state = rows buffered inside watermark+interval
      "interval_join" -> (() => timed(noop(
        Streams.intervalJoin(
          readSliced().filter(col("event_type") === "click"),
          readSliced().filter(col("event_type") === "purchase"),
          "user_id", "user_id", "ts", "ts",
          lowerSec = 0L, upperSec = 1800L, watermark = "1 hour"),
        OutputMode.Append, "ssjoin"))),
      // LEFT-OUTER interval join: same state machinery plus the
      // null-padded emission path — an unmatched left row emits only
      // once the watermark proves no match can still arrive, so the
      // outer path is where eviction-timing bugs would surface
      "interval_join_outer" -> (() => timed(noop(
        Streams.intervalJoin(
          readSliced().filter(col("event_type") === "click"),
          readSliced().filter(col("event_type") === "purchase"),
          "user_id", "user_id", "ts", "ts",
          lowerSec = 0L, upperSec = 1800L, watermark = "1 hour",
          joinType = "leftOuter"),
        OutputMode.Append, "ssjoin_outer"))),
      // stateless stream-static broadcast enrich: the no-state baseline
      "enrich_static" -> (() => timed {
        val dim = spark.range(1500).select(col("id").as("user_id"),
          (col("id") % 7).as("cohort"))
        noop(Streams.enrich(readSliced(), dim, Seq("user_id")),
          OutputMode.Append, "enrich")
      }),
      // point-in-time SCD2 enrichment: same no-state broadcast shape
      // as enrich_static but with the validity-interval predicate —
      // measures what leakage-correctness costs over the naive join
      "enrich_point_in_time" -> (() => timed {
        val t0 = java.sql.Timestamp.valueOf("2026-01-01 00:00:00")
        val cut = java.sql.Timestamp.valueOf("2026-04-01 12:00:00")
        val hist = spark.range(1500).select(col("id").as("user_id"),
            (col("id") % 7).as("cohort"))
          .select(col("user_id"),
            explode(array(
              struct(col("cohort"), lit(t0).as("valid_from"),
                lit(cut).as("valid_to")),
              struct((col("cohort") + 100).as("cohort"),
                lit(cut).as("valid_from"),
                lit(null).cast("timestamp").as("valid_to")))).as("v"))
          .select(col("user_id"), col("v.*"))
        noop(Streams.enrichPointInTime(readSliced(), hist,
          "user_id", "ts"), OutputMode.Append, "pit")
      }),
      // the continuous corpus-ingest loop: 4 document micro-batches,
      // each running one full funnel tick (shingle + probe the
      // ACCUMULATED signature/fingerprint stores + store append) —
      // "state" here is the on-disk store, so state_rows reads 0;
      // the per-tick cost growing with history is what's measured
      "corpus_ingest" -> (() => timed {
        val docsStage = s"$root/docs_landing"
        val docs = Tables.documents(spark, sfDir)
          .select("doc_id", "text")
        (0 to 3).foreach { i =>
          docs.filter(col("doc_id") % 4 === i)
            .coalesce(1).write.parquet(s"$docsStage/slice_$i")
          Thread.sleep(20)
        }
        val src = spark.readStream
          .schema(docs.schema)
          .option("maxFilesPerTrigger", "1")
          .parquet(s"$docsStage/slice_*")
        graft.pipeline.Corpus.ingestStream(src,
          rawPath = s"$root/ingest/raw",
          corpusPath = s"$root/ingest/corpus",
          storePath = s"$root/ingest/store",
          fpStorePath = s"$root/ingest/fps",
          checkpointDir = s"$root/ckpt_ingest",
          langs = Seq("en", "de", "fr", "es", "zh"),
          minQualityMilli = 0L)
      })
    ).map { case (name, f) => name -> f() }

    val js = runs.map { case (n, r) =>
      val rps = if (r.sec > 0) (r.rows / r.sec).round else 0L
      s""""$n":{"sec":${r.sec},"rows":${r.rows},"rows_per_sec":$rps,""" +
        s""""state_rows":${r.stateRows},"batches":${r.batches}}"""
    }.mkString("{", ",", "}")
    val total = runs.map(_._2.sec).sum
    println(s"""{"metric":"stream_total","value":$total,"unit":"sec","streams":$js,"sf":"$sfDir","slices":$slices}""")
    spark.stop()
  }
}
