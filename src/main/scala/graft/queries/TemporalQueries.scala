package graft.queries

import org.apache.spark.sql.functions._
import graft.Tables
import graft.ops.{AsOf, RangeJoin}

/** Temporal join operators — as-of enrichment and interval×point
  * range join. Spark has no native operator for either; the engine
  * supplies scale-shaped implementations ([[graft.ops.AsOf]],
  * [[graft.ops.RangeJoin]]) and verifies them against independent
  * DuckDB formulations (correlated LATERAL / plain inequality join)
  * so the oracle never shares the engine's algorithm.
  */
object TemporalQueries extends QueryPack {

  /** events with ts floored to whole microseconds — the precision the
    * engine computes at (`Tables.events` converts the nanos-grained
    * parquet via integer `div 1000`). DuckDB reads the TIMESTAMP_NS
    * column raw, so every oracle that COMPARES event timestamps must
    * floor the same way or strict bounds / horizon edges can diverge
    * on sub-microsecond neighbors. */
  private val EventsMicrosSql =
    """SELECT event_id, make_timestamp(epoch_us(ts)) AS ts,
              user_id, event_type, value
       FROM events"""

  /** As-of join: every event picks its user's most recent order at or
    * before the event time (orders all predate the event window, so
    * this is "latest customer state as of the event"). Tie-break at
    * equal order date: greatest o_orderkey — mirrored by the oracle's
    * ORDER BY o_orderdate DESC, o_orderkey DESC LIMIT 1. */
  val asofJoin = GQuery(
    "q_asof_join",
    (s, d) => {
      val ev = Tables.events(s, d).select("event_id", "user_id", "ts")
      val ord = Tables.orders(s, d)
        .select("o_custkey", "o_orderkey", "o_orderdate", "o_totalprice")
      AsOf.backward(ev, ord,
          leftKey = "user_id", rightKey = "o_custkey",
          leftTime = "ts", rightTime = "o_orderdate",
          rightPayload = Seq("o_orderkey", "o_totalprice", "o_orderdate"),
          tieBreak = "o_orderkey")
        .select(col("event_id"), col("user_id"),
          col("o_orderkey").as("last_orderkey"),
          col("o_totalprice").as("last_totalprice"),
          datediff(to_date(col("ts")), to_date(col("o_orderdate")))
            .cast("long").as("days_since"))
        .orderBy("event_id")
    },
    Some(s"""
      WITH e0 AS ($EventsMicrosSql)
      SELECT e.event_id, e.user_id,
             o.o_orderkey AS last_orderkey,
             o.o_totalprice AS last_totalprice,
             date_diff('day', CAST(o.o_orderdate AS DATE),
                       CAST(e.ts AS DATE)) AS days_since
      FROM e0 e
      LEFT JOIN LATERAL (
        SELECT o_orderkey, o_totalprice, o_orderdate
        FROM orders o
        WHERE o.o_custkey = e.user_id AND o.o_orderdate <= e.ts
        ORDER BY o.o_orderdate DESC, o.o_orderkey DESC
        LIMIT 1) o ON TRUE
      ORDER BY event_id
    """))

  /** Forward as-of: every order picks its customer's FIRST event
    * at-or-after the order date ("first post-order activity" — the
    * attribution-window shape). Customers outside the event universe
    * (o_custkey >= 150) stay unmatched, exercising the null path at
    * volume. Tie-break at the matched time: greatest event_id. */
  val asofForward = GQuery(
    "q_asof_forward",
    (s, d) => {
      val ord = Tables.orders(s, d)
        .select("o_orderkey", "o_custkey", "o_orderdate")
      val ev = Tables.events(s, d)
        .select(col("user_id"), col("ts"), col("event_id"),
          col("event_type"))
      AsOf.forward(ord, ev,
          leftKey = "o_custkey", rightKey = "user_id",
          leftTime = "o_orderdate", rightTime = "ts",
          rightPayload = Seq("event_id", "event_type", "ts"),
          tieBreak = "event_id")
        .select(col("o_orderkey"), col("o_custkey"),
          col("event_id").as("first_event_id"),
          col("event_type").as("first_event_type"),
          datediff(to_date(col("ts")), to_date(col("o_orderdate")))
            .cast("long").as("days_until"))
        .orderBy("o_orderkey")
    },
    Some(s"""
      WITH e0 AS ($EventsMicrosSql)
      SELECT o.o_orderkey, o.o_custkey,
             e.event_id AS first_event_id,
             e.event_type AS first_event_type,
             date_diff('day', CAST(o.o_orderdate AS DATE),
                       CAST(e.ts AS DATE)) AS days_until
      FROM orders o
      LEFT JOIN LATERAL (
        SELECT event_id, event_type, ts
        FROM e0 e
        WHERE e.user_id = o.o_custkey AND e.ts >= o.o_orderdate
        ORDER BY e.ts ASC, e.event_id DESC
        LIMIT 1) e ON TRUE
      ORDER BY o_orderkey
    """))

  /** Self as-of with STRICT inequality and a tolerance horizon: each
    * event finds the same user's immediately-preceding event, but only
    * within the last hour — the "time since previous action" feature,
    * exercising the strict (<) and tolerance paths cross-engine (they
    * are spec-covered but otherwise outside the oracle gate). The gap
    * is exact integer microseconds on both sides (DuckDB
    * date_diff('second') counts boundary crossings, which disagrees
    * with a floored micros difference on sub-second data). */
  val asofSelf = GQuery(
    "q_asof_self_prev",
    (s, d) => {
      val ev = Tables.events(s, d)
      val probe = ev.select("event_id", "user_id", "ts")
      val ref = ev.select(col("user_id").as("r_user_id"),
        col("ts").as("r_ts"), col("event_id").as("r_event_id"))
      AsOf.backward(probe, ref,
          leftKey = "user_id", rightKey = "r_user_id",
          leftTime = "ts", rightTime = "r_ts",
          rightPayload = Seq("r_event_id", "r_ts"),
          tieBreak = "r_event_id",
          strict = true, toleranceSec = Some(3600L))
        .select(col("event_id"), col("user_id"),
          col("r_event_id").as("prev_event_id"),
          (unix_micros(col("ts")) - unix_micros(col("r_ts")))
            .as("gap_us"))
        .orderBy("event_id")
    },
    Some(s"""
      WITH e0 AS ($EventsMicrosSql)
      SELECT e.event_id, e.user_id,
             p.event_id AS prev_event_id,
             epoch_us(e.ts) - epoch_us(p.ts) AS gap_us
      FROM e0 e
      LEFT JOIN LATERAL (
        SELECT event_id, ts FROM e0 p
        WHERE p.user_id = e.user_id AND p.ts < e.ts
              AND p.ts >= e.ts - INTERVAL 1 HOUR
        ORDER BY p.ts DESC, p.event_id DESC
        LIMIT 1) p ON TRUE
      ORDER BY e.event_id
    """))

  /** Range join: ~N/199 six-hour intervals (anchored at sampled
    * events) × all event points, counted and summed per interval.
    * Engine side goes through the bucketed equi-join (1 h grid);
    * oracle is the direct inequality join. Empty intervals survive
    * with n_events = 0 (left-join semantics at the aggregation edge,
    * matching the oracle's COUNT over the outer join). */
  val rangeJoin = GQuery(
    "q_range_join",
    (s, d) => {
      val ev = Tables.events(s, d)
      val iv = ev.filter(col("event_id") % 199 === 0)
        .select(col("event_id").as("interval_id"),
          col("ts").as("start_ts"),
          (col("ts") + expr("INTERVAL 6 HOURS")).as("end_ts"))
      val pts = ev.select(col("event_id").as("p_event_id"),
        col("ts").as("p_ts"), col("value"))
      val agg = RangeJoin.intervalPointJoin(iv, pts,
          "start_ts", "end_ts", "p_ts",
          bucketMicros = 3600L * 1000000L)
        .groupBy("interval_id")
        .agg(count(lit(1)).as("n_events"),
          sum(col("value").cast("decimal(18,4)"))
            .cast("double").as("sum_value"))
      iv.select("interval_id").join(agg, Seq("interval_id"), "left")
        .select(col("interval_id"),
          coalesce(col("n_events"), lit(0L)).as("n_events"),
          col("sum_value"))
        .orderBy("interval_id")
    },
    Some(s"""
      WITH e0 AS ($EventsMicrosSql),
      iv AS (
        SELECT event_id AS interval_id, ts AS start_ts,
               ts + INTERVAL 6 HOUR AS end_ts
        FROM e0 WHERE event_id % 199 = 0)
      SELECT iv.interval_id,
             COUNT(e.event_id) AS n_events,
             CAST(SUM(CAST(e.value AS DECIMAL(18,4))) AS DOUBLE) AS sum_value
      FROM iv LEFT JOIN e0 e
        ON e.ts >= iv.start_ts AND e.ts < iv.end_ts
      GROUP BY iv.interval_id
      ORDER BY interval_id
    """))

  /** Replication factor for the evidence-probe fixture (≈2.4M probes
    * at sf0.1) — sized so the hot key's single-task window cost
    * dominates the fixed per-query cost and the salting delta clears
    * run-to-run noise. */
  private val ProbeRep = 24

  /** Probe fixture for the as-of salting evidence pairs: the events
    * table exploded ×ProbeRep; in the `hot` shape ~90% of probes are
    * re-keyed onto user 7 — the telemetry skew shape
    * [[AsOf.backwardSalted]] exists for — and in the uniform shape
    * they keep their original user. Timestamps are jittered per
    * replica so the hot key's window isn't one giant tie run. */
  private def evidenceProbe(s: org.apache.spark.sql.SparkSession,
                            d: String, hot: Boolean)
      : org.apache.spark.sql.DataFrame = {
    val pid = col("event_id") * ProbeRep + col("i")
    Tables.events(s, d).select("event_id", "user_id", "ts")
      .select(col("event_id"), col("user_id"), col("ts"),
        explode(sequence(lit(0), lit(ProbeRep - 1))).as("i"))
      .select(
        pid.as("probe_id"),
        (if (hot) when(pid % 10 =!= 0, lit(7L)).otherwise(col("user_id"))
         else col("user_id")).as("user_id"),
        timestamp_micros(unix_micros(col("ts")) + col("i") * lit(1000000L))
          .as("ts"))
  }

  private def evidenceSql(hot: Boolean): String = {
    val key =
      if (hot) s"""CASE WHEN (e.event_id * $ProbeRep + i) % 10 <> 0 THEN 7
                       ELSE e.user_id END"""
      else "e.user_id"
    s"""
      WITH e0 AS ($EventsMicrosSql),
      probe AS (
        SELECT e.event_id * $ProbeRep + i AS probe_id,
               $key AS user_id,
               make_timestamp(epoch_us(e.ts) + i * 1000000) AS ts
        FROM e0 e CROSS JOIN generate_series(0, ${ProbeRep - 1}) AS t(i)),
      matched AS (
        SELECT p.user_id, o.o_orderkey
        FROM probe p
        LEFT JOIN LATERAL (
          SELECT o_orderkey FROM orders o
          WHERE o.o_custkey = p.user_id AND o.o_orderdate <= p.ts
          ORDER BY o.o_orderdate DESC, o.o_orderkey DESC
          LIMIT 1) o ON TRUE)
      SELECT user_id, COUNT(*) AS n_probes,
             COUNT(o_orderkey) AS n_matched,
             CAST(SUM(o_orderkey) AS BIGINT) AS sum_matched_key
      FROM matched GROUP BY user_id ORDER BY user_id
    """
  }

  private def skewAggregate(joined: org.apache.spark.sql.DataFrame)
      : org.apache.spark.sql.DataFrame =
    joined.groupBy("user_id")
      .agg(count(lit(1)).as("n_probes"),
        count(col("o_orderkey")).as("n_matched"),
        sum("o_orderkey").as("sum_matched_key"))
      .orderBy("user_id")

  /** Reference side for the skew pair: only the matchable universe —
    * orders whose custkey exceeds the probe side's maximum user can
    * never match, so dropping them changes nothing semantically. The
    * bound is read from the events table (one tiny eager scalar, the
    * driver-metadata posture), NOT hard-coded: the original `< 150`
    * literal encoded the sf0.01 user range and silently diverged from
    * the full-orders oracle on any dataset with more users (caught by
    * the r9 sf1 gate run — the correctness gate at sf0.01 could never
    * see it).
    * This is also the operator's contract shape: backwardSalted is
    * for probe sides that DWARF the reference side (billions of
    * telemetry events vs thousands of reference states); replicating
    * a reference as large as the probe side is the documented
    * anti-case and measurably loses (first-cut fixture: salted 4.4 s
    * vs plain 1.9 s with the full 150k-row orders table replicated
    * x16 — kept here as the negative result). */
  private def skewRef(s: org.apache.spark.sql.SparkSession,
                      d: String): org.apache.spark.sql.DataFrame = {
    // zero-row events: a null MAX would NPE; an empty probe side pairs
    // with an empty reference (bound 0 admits no orders), the honest
    // empty-increment result
    val maxRow = Tables.events(s, d).agg(max(col("user_id"))).head()
    val maxUser = if (maxRow.isNullAt(0)) 0L else maxRow.getLong(0)
    Tables.orders(s, d)
      .filter(col("o_custkey") <= maxUser)
      .select("o_custkey", "o_orderkey", "o_orderdate")
  }

  /** EVIDENCE PAIR (like the skew-join pair in SkewQueries): same
    * hot-key as-of through [[AsOf.backward]] (one window partition
    * carries ~90% of 1.2M probes) vs [[AsOf.backwardSalted]] (the hot
    * key spread over 16 salt partitions, the small reference
    * replicated ×16). Both share one oracle — equivalence by hash.
    * bench=false: the pair is measured by the solo protocol pinned in
    * BASELINE.md ("Evidence pairs"), not by the in-sequence headline
    * run. */
  private def evidenceQuery(name: String, hot: Boolean,
                            saltFactor: Option[Int]): GQuery = GQuery(
    name,
    (s, d) => skewAggregate(saltFactor match {
      case Some(f) => AsOf.backwardSalted(
        evidenceProbe(s, d, hot), skewRef(s, d),
        leftKey = "user_id", rightKey = "o_custkey",
        leftTime = "ts", rightTime = "o_orderdate",
        rightPayload = Seq("o_orderkey"), tieBreak = "o_orderkey",
        factor = f)
      case None => AsOf.backward(
        evidenceProbe(s, d, hot), skewRef(s, d),
        leftKey = "user_id", rightKey = "o_custkey",
        leftTime = "ts", rightTime = "o_orderdate",
        rightPayload = Seq("o_orderkey"), tieBreak = "o_orderkey")
    }),
    Some(evidenceSql(hot)),
    bench = false)

  val asofSkewPlain = evidenceQuery("q_asof_skew_plain",
    hot = true, saltFactor = None)
  val asofSkewSalted = evidenceQuery("q_asof_skew_salted",
    hot = true, saltFactor = Some(16))
  /** The "loses nothing on uniform keys" half of the salting
    * evidence: identical probe volume with the original (uniform)
    * keys — salting here buys nothing, so its measured cost IS the
    * overhead of salting when you shouldn't (reference replication;
    * small by the contract shape above). */
  val asofUniformPlain = evidenceQuery("q_asof_uniform_plain",
    hot = false, saltFactor = None)
  val asofUniformSalted = evidenceQuery("q_asof_uniform_salted",
    hot = false, saltFactor = Some(16))

  /** Nearest-match as-of ([[AsOf.nearest]]): every event takes its
    * user's closest order in TIME, either direction — microsecond-
    * exact integer distance, equal distance prefers the backward
    * match, side-internal ties per the op's documented rule (backward
    * greatest key, forward smallest). The oracle is an independent
    * LATERAL formulation ordering by absolute distance with the same
    * preferences — including the sign-trick tie key. */
  val asofNearest = GQuery(
    "q_asof_nearest",
    (s, d) => {
      val ev = Tables.events(s, d).select("event_id", "user_id", "ts")
      val ord = Tables.orders(s, d)
        .select("o_custkey", "o_orderkey", "o_orderdate")
      AsOf.nearest(ev, ord,
          leftKey = "user_id", rightKey = "o_custkey",
          leftTime = "ts", rightTime = "o_orderdate",
          rightPayload = Seq("o_orderkey", "o_orderdate"),
          tieBreak = "o_orderkey")
        .select(col("event_id"), col("user_id"),
          col("o_orderkey").as("nearest_orderkey"),
          datediff(to_date(col("ts")), to_date(col("o_orderdate")))
            .cast("long").as("days_signed"))
        .orderBy("event_id")
    },
    Some(s"""
      WITH e0 AS ($EventsMicrosSql)
      SELECT e.event_id, e.user_id,
             o.o_orderkey AS nearest_orderkey,
             date_diff('day', CAST(o.o_orderdate AS DATE),
                       CAST(e.ts AS DATE)) AS days_signed
      FROM e0 e
      LEFT JOIN LATERAL (
        SELECT o_orderkey, o_orderdate
        FROM orders o
        WHERE o.o_custkey = e.user_id
        ORDER BY
          abs(epoch_us(CAST(e.ts AS TIMESTAMP))
              - epoch_us(CAST(o.o_orderdate AS TIMESTAMP))) ASC,
          (CAST(o.o_orderdate AS TIMESTAMP)
             > CAST(e.ts AS TIMESTAMP)) ASC,
          CASE WHEN CAST(o.o_orderdate AS TIMESTAMP)
                 <= CAST(e.ts AS TIMESTAMP)
               THEN -o.o_orderkey ELSE o.o_orderkey END ASC
        LIMIT 1) o ON TRUE
      ORDER BY event_id
    """))

  /** Interval×interval overlap join ([[RangeJoin.intervalOverlapJoin]]):
    * activity windows derived from two event slices (start = event ts,
    * length = 10–59 min from the id — exact integer micros end to
    * end), overlap pairs with their overlap duration. The oracle is
    * the plain inequality join DuckDB plans as IEJoin — a genuinely
    * different algorithm; the engine's first-shared-cell dedup must
    * produce exactly its pair set, once each. */
  val intervalOverlap = GQuery(
    "q_interval_overlap",
    (s, d) => {
      val ev = Tables.events(s, d)
      def win(m: Int, tag: String) = ev
        .filter(pmod(col("event_id"), lit(m)) === 0)
        .select(col("event_id").as(s"${tag}_id"),
          col("ts").as(s"${tag}_start"),
          timestamp_micros(unix_micros(col("ts")) +
            (pmod(col("event_id"), lit(50)) + 10L) * 60000000L)
            .as(s"${tag}_end"))
      RangeJoin.intervalOverlapJoin(win(37, "a"), win(41, "b"),
          "a_start", "a_end", "b_start", "b_end",
          bucketMicros = 3600000000L)
        .select(col("a_id"), col("b_id"),
          (least(unix_micros(col("a_end")), unix_micros(col("b_end"))) -
            greatest(unix_micros(col("a_start")),
              unix_micros(col("b_start")))).as("overlap_micros"))
        .orderBy("a_id", "b_id")
    },
    Some(s"""
      WITH e0 AS ($EventsMicrosSql),
      a AS (SELECT event_id AS a_id,
                   epoch_us(CAST(ts AS TIMESTAMP)) AS a_s,
                   epoch_us(CAST(ts AS TIMESTAMP))
                     + (event_id % 50 + 10) * 60000000 AS a_e
            FROM e0 WHERE event_id % 37 = 0),
      b AS (SELECT event_id AS b_id,
                   epoch_us(CAST(ts AS TIMESTAMP)) AS b_s,
                   epoch_us(CAST(ts AS TIMESTAMP))
                     + (event_id % 50 + 10) * 60000000 AS b_e
            FROM e0 WHERE event_id % 41 = 0)
      SELECT a_id, b_id,
             least(a_e, b_e) - greatest(a_s, b_s) AS overlap_micros
      FROM a JOIN b ON a_s < b_e AND b_s < a_e
      ORDER BY a_id, b_id
    """))

  /** Interval coalescing ([[graft.ops.Intervals.coalesce]]): each
    * user's activity windows (same micros-exact derivation as the
    * overlap query, all events this time) merged into maximal
    * disjoint islands. Result edge projects integer micros, not
    * timestamps — fractional-second string formatting is an
    * engine-specific surface the compare must not depend on. */
  val intervalCoalesce = GQuery(
    "q_interval_coalesce",
    (s, d) => {
      val win = Tables.events(s, d)
        .select(col("user_id"), col("ts").as("w_start"),
          timestamp_micros(unix_micros(col("ts")) +
            (pmod(col("event_id"), lit(50)) + 10L) * 60000000L)
            .as("w_end"))
      graft.ops.Intervals.coalesce(win, Seq("user_id"),
          "w_start", "w_end")
        .select(col("user_id"),
          unix_micros(col("island_start")).as("island_start_us"),
          unix_micros(col("island_end")).as("island_end_us"),
          col("n_merged"))
        .orderBy("user_id", "island_start_us")
    },
    Some(s"""
      WITH e0 AS ($EventsMicrosSql),
      win AS (
        SELECT user_id, CAST(ts AS TIMESTAMP) AS w_start,
               make_timestamp(epoch_us(CAST(ts AS TIMESTAMP))
                 + (event_id % 50 + 10) * 60000000) AS w_end
        FROM e0),
      isl AS (${graft.ops.Intervals.coalesceSql("win", "user_id",
        "user_id", "w_start", "w_end")})
      SELECT user_id,
             epoch_us(island_start) AS island_start_us,
             epoch_us(island_end) AS island_end_us,
             n_merged
      FROM isl ORDER BY user_id, island_start_us
    """))

  /** Gap extraction — the downtime report: the complement of
    * [[graft.ops.Intervals.coalesce]]'s islands per key. Gaps are a
    * lead() pass over the ISLAND frame (already reduced — orders of
    * magnitude smaller than the input), reusing the same key
    * partitioning; only gaps of at least 4 hours surface (the
    * report's noise floor), with their integer-micros bounds and
    * duration. */
  val intervalGaps = GQuery(
    "q_interval_gaps",
    (s, d) => {
      import org.apache.spark.sql.expressions.Window
      val win = Tables.events(s, d)
        .select(col("user_id"), col("ts").as("w_start"),
          timestamp_micros(unix_micros(col("ts")) +
            (pmod(col("event_id"), lit(50)) + 10L) * 60000000L)
            .as("w_end"))
      val isl = graft.ops.Intervals.coalesce(win, Seq("user_id"),
          "w_start", "w_end")
        .select(col("user_id"),
          unix_micros(col("island_start")).as("s_us"),
          unix_micros(col("island_end")).as("e_us"))
      val w = Window.partitionBy("user_id").orderBy("s_us")
      isl.withColumn("next_s", lead(col("s_us"), 1).over(w))
        .filter(col("next_s").isNotNull &&
          col("next_s") - col("e_us") >= 4L * 3600L * 1000000L)
        .select(col("user_id"), col("e_us").as("gap_start_us"),
          col("next_s").as("gap_end_us"),
          (col("next_s") - col("e_us")).as("gap_micros"))
        .orderBy("user_id", "gap_start_us")
    },
    Some(s"""
      WITH e0 AS ($EventsMicrosSql),
      win AS (
        SELECT user_id, CAST(ts AS TIMESTAMP) AS w_start,
               make_timestamp(epoch_us(CAST(ts AS TIMESTAMP))
                 + (event_id % 50 + 10) * 60000000) AS w_end
        FROM e0),
      isl AS (${graft.ops.Intervals.coalesceSql("win", "user_id",
        "user_id", "w_start", "w_end")}),
      led AS (
        SELECT user_id, epoch_us(island_end) AS e_us,
               LEAD(epoch_us(island_start), 1)
                 OVER (PARTITION BY user_id ORDER BY epoch_us(island_start))
                 AS next_s
        FROM isl)
      SELECT user_id, e_us AS gap_start_us, next_s AS gap_end_us,
             next_s - e_us AS gap_micros
      FROM led
      WHERE next_s IS NOT NULL AND next_s - e_us >= ${4L * 3600L * 1000000L}
      ORDER BY user_id, gap_start_us
    """))

  /** Daily forward-filled resample of each user's value series
    * ([[graft.ops.Resample.ffill]]): the irregular event stream onto
    * an absolute-aligned day grid, each tick carrying the value as of
    * that instant. The oracle is a genuinely different algorithm —
    * DuckDB's ASOF LEFT JOIN from an independently built grid —
    * against the engine's union-tag running-last window; the aligned
    * tick-0 before each user's first observation must surface as NULL
    * in both. Values pass through untouched (no float arithmetic —
    * the fill picks one observed double), so the hash compare is
    * exact. */
  val resampleFfill = GQuery(
    "q_resample_ffill",
    (s, d) => graft.ops.Resample.ffill(
      Tables.events(s, d), Seq("user_id"), "ts", "value",
      tiebreakCol = "event_id", stepMicros = 86400000000L)
      .orderBy("user_id", "tick"),
    Some("""
      WITH obs AS (
        SELECT user_id, epoch_us(CAST(ts AS TIMESTAMP)) AS mt,
               arg_max(value, event_id) AS v
        FROM events
        WHERE user_id IS NOT NULL AND ts IS NOT NULL
        GROUP BY 1, 2),
      bounds AS (
        SELECT user_id, (MIN(mt) // 86400000000) * 86400000000 AS t0,
               MAX(mt) AS mx
        FROM obs GROUP BY 1),
      grid AS (
        SELECT user_id, unnest(range(t0, mx + 1, 86400000000)) AS mt
        FROM bounds)
      SELECT g.user_id, make_timestamp(g.mt) AS tick, o.v AS value
      FROM grid g ASOF LEFT JOIN obs o
        ON g.user_id = o.user_id AND g.mt >= o.mt
      ORDER BY g.user_id, tick
    """))

  /** Daily downsample of each user's value series
    * ([[graft.ops.Resample.aggregate]]): half-open absolute-aligned
    * day buckets with count/min/max and the fixed-point exact sum —
    * the rollup complement of the forward-filled grid. Only buckets
    * with observations appear, exactly as the oracle's GROUP BY
    * produces. */
  val resampleAgg = GQuery(
    "q_resample_agg",
    (s, d) => graft.ops.Resample.aggregate(
      Tables.events(s, d), Seq("user_id"), "ts", "value",
      stepMicros = 86400000000L)
      .orderBy("user_id", "tick"),
    Some(s"""
      SELECT user_id,
             make_timestamp((epoch_us(CAST(ts AS TIMESTAMP))
               // 86400000000) * 86400000000) AS tick,
             COUNT(*) AS n_obs,
             MIN(value) AS v_min,
             MAX(value) AS v_max,
             ${graft.ops.Exact.fixedSumSql("value", 2)} AS v_sum
      FROM events
      WHERE user_id IS NOT NULL AND ts IS NOT NULL
        AND value IS NOT NULL
      GROUP BY 1, 2
      ORDER BY user_id, tick
    """))

  def all: Seq[GQuery] = Seq(asofJoin, asofForward, asofSelf, rangeJoin,
    asofSkewPlain, asofSkewSalted, asofUniformPlain, asofUniformSalted,
    asofNearest, intervalOverlap, intervalCoalesce, intervalGaps,
    resampleFfill, resampleAgg)
}
