package graft

import org.apache.spark.sql.SparkSession

/** Single place that pins the session semantics the engine depends on.
  *
  * The reference warehouse (see SURVEY.md §1.2, §2.8) relies on
  * PostgreSQL's lenient post-regex casts (`NULLIF(...)::INT` after a
  * `REGEXP_REPLACE` guard) — i.e. cast failures surface as NULL, never
  * as errors. Spark 4 defaults to ANSI mode (errors on bad cast), so we
  * switch it off and use `try_cast`-equivalent semantics engine-wide.
  *
  * Timezone is pinned UTC: reference `TIMESTAMP` columns are tz-naive
  * (dags/SQL/Bronze/DDL_BronzeTable.sql:42-43) and the DuckDB oracle
  * reads the same parquet with naive timestamps.
  *
  * Scale posture (100 TB target, tested on local[32]):
  *  - AQE on: runtime coalescing + skew-join splitting replaces hand
  *    tuning at each scale factor.
  *  - shuffle.partitions defaults to the local core count here; on a
  *    real cluster this is overridden per deployment (AQE coalesces
  *    down from a high initial number anyway).
  *  - autoBroadcastJoinThreshold left at default (10 MB): every dim in
  *    the star schema is tiny relative to the fact at any SF, so dim
  *    joins plan as broadcast-hash automatically; we additionally hint
  *    `broadcast()` where the optimizer lacks stats (freshly derived
  *    frames).
  */
object GraftSession {

  def cpus: String = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")

  /** Apply graft semantics to an existing builder (Verify/Bench own
    * their master/memory settings; semantics must never diverge). */
  def tune(b: SparkSession.Builder): SparkSession.Builder = b
    // SQL names for the native graft expressions (word_shingles,
    // simhash_bits, hyperplane_buckets, nearest_centroid)
    .config("spark.sql.extensions", "graft.functions.GraftExtensions")
    .config("spark.sql.ansi.enabled", "false")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.sql.adaptive.enabled", "true")
    .config("spark.sql.parquet.int96RebaseModeInWrite", "CORRECTED")
    .config("spark.sql.parquet.datetimeRebaseModeInWrite", "CORRECTED")
    // the events table ships TIMESTAMP(NANOS) parquet, which the
    // vectorized reader rejects outright; read as epoch-nanos longs
    // and let Tables.events convert to a micros timestamp.
    .config("spark.sql.legacy.parquet.nanosAsLong", "true")

  def local(appName: String = "graft"): SparkSession = {
    val s = tune(
      SparkSession.builder()
        .master(s"local[$cpus]")
        .appName(appName)
        .config("spark.sql.shuffle.partitions", cpus)
        .config("spark.ui.enabled", "false")
    ).getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    s
  }
}
