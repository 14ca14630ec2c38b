package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Per-entity time-series resampling onto a regular grid with
  * forward fill — the feature-extraction primitive that turns an
  * irregular event stream into the fixed-interval matrix sequence
  * models train on (sensor feeds, metrics, account balances: "the
  * value AS OF each tick").
  *
  * Semantics: per key, ticks run from `floor(min_ts / step) * step`
  * (the first tick at-or-before the first observation, grid-aligned
  * in absolute epoch micros so ticks agree ACROSS keys) up to the
  * last observation; each tick carries the latest observed value
  * at-or-before it (ties at one timestamp resolved by a caller-named
  * tiebreak column FIRST — the grid must never depend on row order).
  *
  * Scale shape (the AsOf union-tag discipline, `ops/AsOf.scala`):
  * same-ts observations collapse in one keyed aggregate, per-key
  * bounds are a second map-side-combinable aggregate, the grid is an
  * explode of a bounded integer sequence off the one-row-per-key
  * bounds frame (guarded: a sentinel timestamp would otherwise
  * explode the grid — the RangeJoin maxCells lesson, enforced in a
  * filter so pruning can't drop it), and the fill is ONE keyed
  * shuffle: observations and ticks union-tagged into a single
  * running `last(ignoreNulls)` ROWS window. No per-tick join, no
  * candidate explosion, no global sort.
  */
object Resample {

  /** Forward-filled regular grid of `valueCol` per `keys`.
    * Output: keys ++ (tick TIMESTAMP, valueCol) — value is null for
    * ticks before the key's first observation (only the aligned
    * tick-0 can be such a tick here, by the bounds construction).
    *
    * A NULL observation VALUE is a gap, not a reset: `last(ignoreNulls)`
    * carries the previous non-null value across it. Ties at one
    * instant resolve by the tiebreak among NON-NULL values (arg_max
    * semantics); an instant whose values are all null is a gap.
    * Callers that want null-as-reset should map nulls to a sentinel
    * first.
    */
  def ffill(df: DataFrame, keys: Seq[String], timeCol: String,
            valueCol: String, tiebreakCol: String, stepMicros: Long,
            maxTicksPerKey: Long = 100000L): DataFrame = {
    require(keys.nonEmpty, "ffill needs at least one key column")
    require(stepMicros > 0, s"stepMicros must be positive: $stepMicros")
    require(maxTicksPerKey > 0,
      s"maxTicksPerKey must be positive: $maxTicksPerKey")
    val kCols = keys.map(col)

    // one value per (key, instant): latest by the tiebreak AMONG
    // NON-NULL values (null tiebreak keys are ignored by max_by, so
    // this matches DuckDB's arg_max skip-null-args semantics when a
    // null value ties at an instant) — the grid must be a function of
    // the DATA, never of partition row order
    val obs = df
      .filter(kCols.map(_.isNotNull).reduce(_ && _) &&
        col(timeCol).isNotNull)
      .groupBy(kCols :+ unix_micros(col(timeCol)).as("_mt"): _*)
      .agg(max_by(col(valueCol),
        when(col(valueCol).isNotNull, col(tiebreakCol))).as("_v"))

    // pmod, not div: `div` truncates toward zero, so a pre-epoch _mn
    // would land tick-0 AFTER the first observation (and _t0 > _mx
    // would make sequence() throw). `_mn - pmod(_mn, step)` is a true
    // floor for any sign.
    val bounds = obs.groupBy(kCols: _*)
      .agg(min("_mt").as("_mn"), max("_mt").as("_mx"))
      .withColumn("_t0", expr(s"_mn - pmod(_mn, ${stepMicros}L)"))
      // in a filter, not a projection: pruning can't drop the guard
      .filter(
        when(expr(s"(_mx - _t0) div ${stepMicros}L + 1") > maxTicksPerKey,
          raise_error(concat(
            lit(s"resample grid exceeds $maxTicksPerKey ticks " +
              s"(stepMicros=$stepMicros) for key: "),
            concat_ws("|", kCols: _*))).cast("boolean"))
          .otherwise(lit(true)))

    val ticks = bounds.select(
      kCols :+ explode(sequence(col("_t0"), col("_mx"),
        lit(stepMicros))).as("_mt"): _*)
      .withColumn("_isTick", lit(true))
      .withColumn("_v", lit(null).cast(obs.schema("_v").dataType))

    // observation sorts BEFORE the tick at the same micros (false <
    // true), so a tick includes a same-instant observation
    val w = Window.partitionBy(kCols: _*)
      .orderBy(col("_mt").asc, col("_isTick").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)

    obs.withColumn("_isTick", lit(false))
      .unionByName(ticks)
      .withColumn("_f", last(col("_v"), ignoreNulls = true).over(w))
      .filter(col("_isTick"))
      .select(kCols :+ timestamp_micros(col("_mt")).as("tick") :+
        col("_f").as(valueCol): _*)
  }

  /** Downsampling complement of [[ffill]]: aggregate observations
    * into half-open absolute-aligned buckets `[tick, tick+step)` —
    * the OHLC/metrics-rollup shape. Only buckets that contain
    * observations appear (downsampling reports what happened; the
    * dense-grid view is [[ffill]]'s job). Exact: count/min/max pass
    * values through untouched and the sum goes through the
    * [[Exact.fixedSum]] scaled-integer convention, so the result is
    * bit-stable at any parallelism. ONE map-side-combinable
    * aggregate — no window, no grid explode, no union.
    */
  def aggregate(df: DataFrame, keys: Seq[String], timeCol: String,
                valueCol: String, stepMicros: Long,
                valueDecimals: Int = 2): DataFrame = {
    require(keys.nonEmpty, "aggregate needs at least one key column")
    require(stepMicros > 0, s"stepMicros must be positive: $stepMicros")
    val kCols = keys.map(col)
    df.filter(kCols.map(_.isNotNull).reduce(_ && _) &&
        col(timeCol).isNotNull && col(valueCol).isNotNull)
      // floor-align via pmod for the same pre-epoch reason as ffill
      .withColumn("_tick", timestamp_micros(expr(
        s"unix_micros($timeCol) - pmod(unix_micros($timeCol), ${stepMicros}L)")))
      .groupBy(kCols :+ col("_tick").as("tick"): _*)
      .agg(count(lit(1)).as("n_obs"),
        min(col(valueCol)).as("v_min"),
        max(col(valueCol)).as("v_max"),
        Exact.fixedSum(col(valueCol), valueDecimals).as("v_sum"))
  }
}
