package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Ordered event-funnel and cohort-retention analytics over an event
  * stream — the product-analytics counterpart of sessionization
  * (`ops/Sessionize`-family): which users progressed through an
  * ordered step sequence, and how cohorts retain week over week.
  * Reference scope: none — events-table extension family.
  *
  * Scale shape: both operators are built on exactly ONE user-keyed
  * exchange over the event table.
  *
  *  - The funnel computes each step's first-eligible timestamp as
  *    chained window minima over the SAME `partitionBy(user)` window
  *    (step k+1's `when` reads step k's already-computed column, so
  *    Spark stacks the Window operators on one Exchange — the
  *    as-of/rolling-features one-Exchange contract), then reduces to
  *    per-user flags with one map-side-combinable aggregate. No
  *    self-joins: the classic per-step-join formulation shuffles the
  *    event table once PER STEP; this shape pays one shuffle total.
  *  - Cohort retention derives each user's cohort week with a window
  *    min over the same user partitioning, then counts distinct
  *    (cohort, offset, user) activity — the one further exchange is
  *    the cohort×offset aggregate whose cardinality is
  *    weeks², not rows.
  *
  * Arithmetic contract: week buckets via `date_trunc('week', …)`
  * (Monday start in both engines) projected as DATE; offsets and
  * conversion ratios are exact integers (`datediff div 7`,
  * per-mille `div`).
  */
object Funnel {

  /** Strict ordered funnel: for each user, step 1 is the first
    * `steps(0)` event; step k+1 is the first `steps(k)` event
    * STRICTLY after the user's step-k time. A user converts when the
    * last step lands within `spanDays` of step 1. Returns ONE row:
    * per-step user counts and per-mille conversion vs step 1. */
  def funnel(events: DataFrame, userCol: String, tsCol: String,
             typeCol: String, steps: Seq[String],
             spanDays: Int): DataFrame = {
    require(steps.size >= 2, s"funnel needs >= 2 steps, got $steps")
    val w = Window.partitionBy(col(userCol))
    val stepCols = steps.indices.map(i => s"_t$i")
    var df = events.withColumn("_t0",
      min(when(col(typeCol) === steps.head, col(tsCol))).over(w))
    for (i <- 1 until steps.size)
      df = df.withColumn(s"_t$i",
        min(when(col(typeCol) === steps(i) &&
          col(tsCol) > col(s"_t${i - 1}"), col(tsCol))).over(w))
    val stepAggs = stepCols.map(c => first(col(c)).as(c))
    val perUser = df
      .groupBy(col(userCol))
      .agg(stepAggs.head, stepAggs.tail: _*)
    val spanMs = spanDays * 86400000L
    val reached = stepCols.zipWithIndex.map { case (c, i) =>
      count(when(col(c).isNotNull, 1)).cast("long").as(s"n_step${i + 1}")
    }
    val converted = count(when(
      col(stepCols.last).isNotNull &&
        (unix_millis(col(stepCols.last)) - unix_millis(col("_t0"))
          <= spanMs), 1)).cast("long").as("n_converted")
    perUser
      .agg(reached.head, (reached.tail :+ converted): _*)
      .withColumn("conv_milli",
        // zero guard: with no step-1 events Spark's div yields NULL
        // while DuckDB's // errors — pin 0 in both (the
        // calibrationBins posture) so degenerate inputs agree
        expr("CASE WHEN n_step1 = 0 THEN CAST(0 AS BIGINT) " +
          "ELSE (1000 * n_converted) div n_step1 END"))
  }

  /** DuckDB mirror of [[funnel]] — independently formulated as
    * per-step grouped joins (vs the engine's stacked windows). */
  def funnelSql(steps: Seq[String], spanDays: Int): String = {
    require(steps.size >= 2)
    val stepCtes = steps.indices.tail.map { i =>
      s"""u$i AS (
        SELECT e.user_id, MIN(e.ts) AS t$i
        FROM events e JOIN u${i - 1} p USING (user_id)
        WHERE e.event_type = '${steps(i)}' AND e.ts > p.t${i - 1}
        GROUP BY e.user_id)"""
    }.mkString(",\n")
    val joins = steps.indices.tail
      .map(i => s"LEFT JOIN u$i USING (user_id)").mkString("\n        ")
    val nSteps = steps.indices
      .map(i => s"CAST(COUNT(t$i) AS BIGINT) AS n_step${i + 1}")
      .mkString(", ")
    val last = s"t${steps.size - 1}"
    s"""
      WITH u0 AS (
        SELECT user_id, MIN(ts) AS t0 FROM events
        WHERE event_type = '${steps.head}' GROUP BY user_id),
      $stepCtes,
      f AS (
        SELECT u0.user_id, ${steps.indices.map(i => s"t$i").mkString(", ")}
        FROM u0
        $joins),
      agg AS (
        SELECT $nSteps,
               CAST(COUNT(CASE WHEN $last IS NOT NULL AND
                 epoch_ms($last) - epoch_ms(t0) <= ${spanDays * 86400000L}
                 THEN 1 END) AS BIGINT) AS n_converted
        FROM f)
      SELECT *, CASE WHEN n_step1 = 0 THEN CAST(0 AS BIGINT)
                ELSE (1000 * n_converted) // n_step1 END AS conv_milli
      FROM agg
    """
  }

  /** Weekly cohort retention: cohort = Monday week of the user's
    * FIRST event (any type); a (cohort, offset) cell counts users
    * active `offset` weeks after their cohort week, offsets
    * 0..`maxOffset`. Output (cohort_week DATE, week_offset,
    * n_users), ordered. */
  def cohortRetention(events: DataFrame, userCol: String,
                      tsCol: String, maxOffset: Int): DataFrame = {
    val w = Window.partitionBy(col("_u"))
    events
      .select(col(userCol).as("_u"),
        date_trunc("week", col(tsCol)).cast("date").as("_wk"))
      .withColumn("_cohort", min(col("_wk")).over(w))
      .withColumn("week_offset",
        expr("datediff(_wk, _cohort) div 7").cast("int"))
      .filter(col("week_offset") <= maxOffset)
      .select(col("_cohort").as("cohort_week"), col("week_offset"),
        col("_u"))
      .distinct()
      .groupBy("cohort_week", "week_offset")
      .agg(count(lit(1)).cast("long").as("n_users"))
      .orderBy("cohort_week", "week_offset")
  }

  /** DuckDB mirror of [[cohortRetention]] (grouped min + join vs the
    * engine's window). */
  def cohortRetentionSql(maxOffset: Int): String =
    s"""
      WITH act AS (
        SELECT DISTINCT user_id,
               CAST(date_trunc('week', ts) AS DATE) AS wk
        FROM events),
      cohort AS (
        SELECT user_id, MIN(wk) AS cohort_week FROM act GROUP BY user_id),
      cells AS (
        SELECT c.cohort_week,
               CAST((a.wk - c.cohort_week) // 7 AS INT) AS week_offset,
               a.user_id
        FROM act a JOIN cohort c USING (user_id))
      SELECT cohort_week, week_offset,
             CAST(COUNT(DISTINCT user_id) AS BIGINT) AS n_users
      FROM cells WHERE week_offset <= $maxOffset
      GROUP BY cohort_week, week_offset
      ORDER BY cohort_week, week_offset
    """
}
