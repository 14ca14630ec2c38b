package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** As-of joins — for every left (probe) row, attach the single right
  * (reference) row with the same key and the greatest right time
  * at-or-before the probe time ([[backward]]), or the smallest right
  * time at-or-after it ([[forward]]). The classic temporal-enrichment
  * operators (trade→quote, event→latest-state, order→next-activity)
  * that Spark's join operators don't express directly: a plain range
  * join explodes into per-pair candidates, and `orderBy ... limit 1`
  * per probe row is a correlated loop.
  *
  * Shape (the 100 TB contract): union-tag both sides and run ONE
  * running window per key —
  *
  *   union(left tagged, right tagged)
  *     → shuffle once on the key
  *     → per-partition sort by (time, side, tiebreak)
  *     → running `last(payload, ignoreNulls)` over ROWS UNBOUNDED
  *       PRECEDING .. CURRENT ROW
  *     → keep left rows
  *
  * Cost is exactly a sort-merge join's shuffle+sort on the SAME key —
  * no candidate explosion (never materializes per-pair rows the way a
  * range join would), no per-key collect, and the running ROWS frame
  * is streaming within the sort (WindowExec emits incrementally; no
  * whole-partition buffering beyond spillable sort pages). Skewed keys
  * concentrate like any keyed shuffle; if one key dominates, pre-split
  * the probe side with [[Skew.salt]] and as-of per salt — valid
  * because the reference side is replicated per salt, matches stay
  * per-key.
  *
  * Determinism: rows are totally ordered by (time, side, tieBreak), so
  * reruns and repartitionings pick the identical match. Callers must
  * pass a `tieBreak` column that is unique per (key, time) on the
  * right side — enforced semantics, not hope: with equal
  * (time, tieBreak) duplicates the window's pick is tie-arbitrary.
  *
  * SQL-equality semantics for nulls: right rows with a null key or
  * null time never match; left rows with a null key or null time get
  * null payload (like the correlated `LEFT JOIN LATERAL` oracle form).
  */
object AsOf {

  /** Backward as-of join (left join semantics: unmatched probe rows
    * keep null payload).
    *
    * @param left         probe side, one output row per input row
    * @param right        reference side
    * @param leftKey      equi-key on the probe side
    * @param rightKey     equi-key on the reference side
    * @param leftTime     probe timestamp column (TimestampType)
    * @param rightTime    reference timestamp column (TimestampType)
    * @param rightPayload reference columns to surface (must not
    *                     collide with left column names)
    * @param tieBreak     reference column ordering ties at equal
    *                     (key, time): the greatest value wins
    * @param strict       false = match rightTime <= leftTime (default);
    *                     true  = match rightTime <  leftTime
    * @param toleranceSec max allowed (leftTime - rightTime) in whole
    *                     seconds; older matches are nulled out
    */
  def backward(left: DataFrame, right: DataFrame,
               leftKey: String, rightKey: String,
               leftTime: String, rightTime: String,
               rightPayload: Seq[String],
               tieBreak: String,
               strict: Boolean = false,
               toleranceSec: Option[Long] = None): DataFrame =
    joinImpl(left, right, Seq(leftKey), Seq(rightKey), leftTime, rightTime,
      rightPayload, tieBreak, strict, toleranceSec, backwardDir = true)

  /** Forward as-of join: the EARLIEST reference row at-or-after the
    * probe time (attribution windows: "first activity after the
    * order"). Same machinery as [[backward]] with the time axis
    * reversed; `toleranceSec` bounds (rightTime - leftTime), and ties
    * at the matched time still resolve to the greatest `tieBreak`. */
  def forward(left: DataFrame, right: DataFrame,
              leftKey: String, rightKey: String,
              leftTime: String, rightTime: String,
              rightPayload: Seq[String],
              tieBreak: String,
              strict: Boolean = false,
              toleranceSec: Option[Long] = None): DataFrame =
    joinImpl(left, right, Seq(leftKey), Seq(rightKey), leftTime, rightTime,
      rightPayload, tieBreak, strict, toleranceSec, backwardDir = false)

  /** Hot-key variant of [[backward]]: spreads ONE dominant key across
    * `factor` salt partitions. The probe side gets a deterministic
    * per-row salt; the reference side is replicated into every salt
    * (any probe row may need any reference row of its key), so the
    * result is exactly [[backward]]'s — proven in AsOfSpec — at
    * `factor`× the reference side's volume. That trade is right when
    * the probe side dwarfs the reference side on the hot key (the
    * typical telemetry shape: billions of probe events, thousands of
    * reference states). The composite (key, salt) pair is the window
    * partition key, so no single task sorts the whole hot key — as
    * FLAT columns, not a struct: WindowExec's required sort leads
    * with the partition key, and a leading struct has no sort-prefix
    * comparator (every comparison falls back to full records —
    * measured ~40% overhead on a 2.4M-row probe), while a flat
    * leading column keeps the radix/prefix sort path.
    */
  def backwardSalted(left: DataFrame, right: DataFrame,
                     leftKey: String, rightKey: String,
                     leftTime: String, rightTime: String,
                     rightPayload: Seq[String],
                     tieBreak: String,
                     factor: Int,
                     strict: Boolean = false,
                     toleranceSec: Option[Long] = None): DataFrame = {
    require(factor > 0, s"salt factor must be positive: $factor")
    val saltReserved = Set("_salt")
      .intersect(left.columns.toSet ++ right.columns.toSet)
    require(saltReserved.isEmpty,
      s"input columns collide with backwardSalted internals: " +
        saltReserved.mkString(", "))
    val l = left.withColumn("_salt", Skew.salt(col(leftTime), factor))
    val r = right.withColumn("_salt",
      explode(sequence(lit(0), lit(factor - 1)).cast("array<int>")))
    joinImpl(l, r, Seq(leftKey, "_salt"), Seq(rightKey, "_salt"),
      leftTime, rightTime,
      rightPayload, tieBreak, strict, toleranceSec, backwardDir = true)
      .drop("_salt")
  }

  private def joinImpl(left: DataFrame, right: DataFrame,
                       leftKeys: Seq[String], rightKeys: Seq[String],
                       leftTime: String, rightTime: String,
                       rightPayload: Seq[String],
                       tieBreak: String,
                       strict: Boolean,
                       toleranceSec: Option[Long],
                       backwardDir: Boolean): DataFrame = {
    require(leftKeys.nonEmpty && leftKeys.size == rightKeys.size,
      s"key arity mismatch: $leftKeys vs $rightKeys")
    val collisions = rightPayload.toSet.intersect(left.columns.toSet)
    require(collisions.isEmpty,
      s"rightPayload collides with probe columns: ${collisions.mkString(", ")}")
    // flat _k0.._kN key columns (never a struct): the window's
    // required sort leads with the partition key, and only flat
    // leading columns get a sort-prefix comparator
    val kCols = leftKeys.indices.map(i => s"_k$i")
    val reserved = kCols.toSet ++ Set("_t", "_tb", "_p", "_isRight", "_match")
    val reservedHits =
      (left.columns.toSet ++ right.columns.toSet).intersect(reserved)
    require(reservedHits.isEmpty,
      s"input columns collide with AsOf internals: ${reservedHits.mkString(", ")}")

    // Internal columns. _mt (matched time) always rides in the payload
    // struct so tolerance filtering works even when the caller doesn't
    // surface the reference time.
    val payloadStruct = struct(
      (col(rightTime).as("_mt") +: rightPayload.map(col)): _*)
    val rTagged = right
      .filter(rightKeys.map(col(_).isNotNull).reduce(_ && _) &&
        col(rightTime).isNotNull)
      .select(
        rightKeys.zip(kCols).map { case (k, a) => col(k).as(a) } ++ Seq(
          col(rightTime).as("_t"),
          col(tieBreak).as("_tb"),
          payloadStruct.as("_p"),
          lit(true).as("_isRight")): _*)
    val payloadType =
      rTagged.schema(rTagged.schema.fieldIndex("_p")).dataType

    val lTagged = left.select(
      (left.columns.map(col) ++
        leftKeys.zip(kCols).map { case (k, a) => col(k).as(a) } ++ Seq(
        col(leftTime).as("_t"),
        // left rows sort after right ties on _tb regardless of type
        lit(null).cast(rTagged.schema("_tb").dataType).as("_tb"),
        lit(null).cast(payloadType).as("_p"),
        lit(false).as("_isRight"))): _*)

    // Sort order within a key: time ascending for backward (the
    // running `last` then holds the latest at-or-before), descending
    // for forward (it holds the earliest at-or-after). At equal time
    // the reference row is visible to the probe row iff the join is
    // inclusive, so right sorts before left for the inclusive bound
    // and after for strict. Among right ties, greatest tieBreak sorts
    // last (wins the running `last`). Nulls-first on _tb keeps left
    // rows (null _tb) from interleaving into right-tie runs.
    val timeOrd = if (backwardDir) col("_t").asc else col("_t").desc
    val sideOrd =
      if (strict) col("_isRight").asc // false (left) first at equal t
      else col("_isRight").desc       // true (right) first at equal t
    val w = Window.partitionBy(kCols.map(col): _*)
      .orderBy(timeOrd, sideOrd, col("_tb").asc_nulls_first)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)

    val matched0 = lTagged.unionByName(rTagged, allowMissingColumns = true)
      .withColumn("_match", last(col("_p"), ignoreNulls = true).over(w))
      .filter(!col("_isRight"))

    // Null-key/null-time probes never match; tolerance nulls out
    // matches beyond the horizon (behind it for backward, ahead of it
    // for forward). Compared at full microsecond precision — a cast
    // to long floors to whole seconds and would let matches up to
    // ~1 s past the horizon survive on sub-second timestamps. The
    // explicit timestamp casts make tolerance work when either time
    // column is a DATE (unix_micros rejects DateType; a DATE reads as
    // midnight, the standard date→timestamp promotion).
    val withinTol = toleranceSec.fold(lit(true)) { tol =>
      val tolMicros = tol * 1000000L
      val mt = unix_micros(col("_match._mt").cast("timestamp"))
      val t = unix_micros(col("_t").cast("timestamp"))
      if (backwardDir) mt >= t - tolMicros
      else mt <= t + tolMicros
    }
    val valid = kCols.map(col(_).isNotNull).reduce(_ && _) &&
      col("_t").isNotNull && col("_match").isNotNull && withinTol
    val matched = matched0.withColumn("_match",
      when(valid, col("_match")).otherwise(lit(null).cast(payloadType)))

    matched.select(
      (left.columns.map(col) ++
        rightPayload.map(p => col(s"_match.$p").as(p))): _*)
  }

  /** Nearest-match as-of — the sensor-fusion / log-alignment variant:
    * each probe takes the reference row minimizing |leftTime −
    * rightTime| (microsecond-exact integer distance), from EITHER
    * direction. Equal distance prefers the backward match (an
    * at-or-before fact beats a future one for training-feature
    * correctness); within the winning side, ties follow that side's
    * directional rule — backward takes the greatest `tieBreak`
    * (matching [[backward]]), forward the smallest. `toleranceSec`
    * bounds the ABSOLUTE distance symmetrically; probes with no
    * in-horizon reference on either side emit null payloads.
    *
    * Scale shape: the same union-tag frame as the directional joins,
    * but BOTH candidates come out of ONE keyed Exchange — the
    * backward running-`last` and the strict-after `first` are two
    * frames over the same partitioning AND the same sort, so Spark
    * plans a single Window (no second shuffle, no re-sort; asserted
    * in AsOfSpec). An equal-time reference lands in the backward
    * window (distance 0), so the forward frame being strict loses
    * nothing. */
  def nearest(left: DataFrame, right: DataFrame,
              leftKey: String, rightKey: String,
              leftTime: String, rightTime: String,
              rightPayload: Seq[String], tieBreak: String,
              toleranceSec: Option[Long] = None): DataFrame = {
    val reserved = Set("_k0", "_t", "_tb", "_p", "_isRight",
      "_back", "_fwd", "_match")
    val reservedHits =
      (left.columns.toSet ++ right.columns.toSet).intersect(reserved)
    require(reservedHits.isEmpty,
      s"input columns collide with AsOf internals: ${reservedHits.mkString(", ")}")
    val collisions = rightPayload.toSet.intersect(left.columns.toSet)
    require(collisions.isEmpty,
      s"rightPayload collides with probe columns: ${collisions.mkString(", ")}")

    val payloadStruct = struct(
      (col(rightTime).as("_mt") +: rightPayload.map(col)): _*)
    val rTagged = right
      .filter(col(rightKey).isNotNull && col(rightTime).isNotNull)
      .select(col(rightKey).as("_k0"), col(rightTime).as("_t"),
        col(tieBreak).as("_tb"), payloadStruct.as("_p"),
        lit(true).as("_isRight"))
    val payloadType =
      rTagged.schema(rTagged.schema.fieldIndex("_p")).dataType
    val lTagged = left.select(
      (left.columns.map(col) ++ Seq(
        col(leftKey).as("_k0"), col(leftTime).as("_t"),
        lit(null).cast(rTagged.schema("_tb").dataType).as("_tb"),
        lit(null).cast(payloadType).as("_p"),
        lit(false).as("_isRight"))): _*)

    // one sort serves both frames: time asc, right-before-left at
    // equal time (inclusive backward), tieBreak asc (backward's
    // running last then takes the greatest tb; forward's first takes
    // the smallest)
    val ord = Seq(col("_t").asc, col("_isRight").desc,
      col("_tb").asc_nulls_first)
    val part = Window.partitionBy(col("_k0"))
    val wBack = part.orderBy(ord: _*)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val wFwd = part.orderBy(ord: _*)
      .rowsBetween(1, Window.unboundedFollowing)

    val matched = lTagged.unionByName(rTagged, allowMissingColumns = true)
      .withColumn("_back", last(col("_p"), ignoreNulls = true).over(wBack))
      .withColumn("_fwd", first(col("_p"), ignoreNulls = true).over(wFwd))
      .filter(!col("_isRight"))

    def micros(c: Column): Column = unix_micros(c.cast("timestamp"))
    val t = micros(col("_t"))
    val db = t - micros(col("_back._mt"))
    val df = micros(col("_fwd._mt")) - t
    val horizon = toleranceSec.map(_ * 1000000L)
    val backOk = col("_back").isNotNull &&
      horizon.fold(lit(true))(h => db <= h)
    val fwdOk = col("_fwd").isNotNull &&
      horizon.fold(lit(true))(h => df <= h)
    val pick = when(col("_k0").isNull || col("_t").isNull,
        lit(null).cast(payloadType))
      .when(backOk && (!fwdOk || db <= df), col("_back"))
      .when(fwdOk, col("_fwd"))
      .otherwise(lit(null).cast(payloadType))

    matched.withColumn("_match", pick).select(
      (left.columns.map(col) ++
        rightPayload.map(p => col(s"_match.$p").as(p))): _*)
  }
}
