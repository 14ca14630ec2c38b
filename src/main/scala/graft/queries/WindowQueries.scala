package graft.queries

import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.Tables
import graft.ops.Validate

/** Window family — SURVEY.md §2.5 W1/W2/W3, §2.6 O1-O3.
  *
  * Scale notes: W1/W2 windows are partitioned by a key → hash shuffle,
  * parallel per key group, no global sort. Only the surrogate-key
  * window (W3) is a single-partition global order — bounded by DIM
  * cardinality (segments/priorities), never by fact rows; at 100 TB a
  * dim of a few thousand values is still a one-task window. Fact-side
  * surrogate keys at scale should switch to xxhash64 of the natural
  * key (stable, shuffle-free) — SURVEY.md §7.5.
  */
object WindowQueries extends QueryPack {

  /** W1: duplicate marking, ALL copies flagged (pandas
    * duplicated(keep=False) semantics). */
  val dupWindowMark = GQuery(
    "q_dup_window_mark",
    (s, d) => Tables.orders(s, d)
      .select(col("o_orderkey"), col("o_custkey"),
        Validate.duplicatedAll(col("o_custkey")).cast("int").as("is_dup"))
      .orderBy("o_orderkey"),
    Some("""
      SELECT o_orderkey, o_custkey,
             CAST(o_custkey IS NOT NULL
                  AND COUNT(*) OVER (PARTITION BY o_custkey) > 1 AS INTEGER) AS is_dup
      FROM orders ORDER BY o_orderkey
    """))

  /** W2: latest-record-per-key via row_number with a deterministic
    * tiebreak (reference: ORDER BY created_at DESC LIMIT 1 per key,
    * dags/DataWarehouse.py:91-99). */
  val latestPerKey = GQuery(
    "q_latest_per_key",
    (s, d) => {
      val w = Window.partitionBy(col("o_custkey"))
        .orderBy(col("o_orderdate").desc, col("o_orderkey").desc)
      Tables.orders(s, d)
        .withColumn("rn", row_number().over(w))
        .filter(col("rn") === 1)
        .select(col("o_custkey"), col("o_orderkey"),
          col("o_orderdate").cast("date").as("latest_order_date"))
        .orderBy("o_custkey")
    },
    Some("""
      SELECT o_custkey, o_orderkey,
             CAST(o_orderdate AS DATE) AS latest_order_date
      FROM (
        SELECT *, ROW_NUMBER() OVER (
            PARTITION BY o_custkey
            ORDER BY o_orderdate DESC, o_orderkey DESC) AS rn
        FROM orders
      ) WHERE rn = 1 ORDER BY o_custkey
    """))

  /** W3: dense surrogate keys over a distinct dim (SERIAL semantics —
    * stable because the ordering key is total). */
  val surrogateKeys = GQuery(
    "q_surrogate_keys",
    (s, d) => Tables.orders(s, d)
      .select(col("o_orderpriority")).distinct()
      .withColumn("priority_key",
        row_number().over(Window.orderBy(col("o_orderpriority"))))
      .orderBy("priority_key"),
    Some("""
      SELECT o_orderpriority,
             ROW_NUMBER() OVER (ORDER BY o_orderpriority) AS priority_key
      FROM (SELECT DISTINCT o_orderpriority FROM orders)
      ORDER BY priority_key
    """))

  /** O1+O3: ordered top-k (TakeOrderedAndProject — no full sort at
    * scale, each partition keeps k rows then the driver merges k). */
  val topkOrders = GQuery(
    "q_topk_orders",
    (s, d) => Tables.orders(s, d)
      .orderBy(desc("o_totalprice"), col("o_orderkey"))
      .limit(10)
      .select(col("o_orderkey"), col("o_totalprice")),
    Some("""
      SELECT o_orderkey, o_totalprice FROM orders
      ORDER BY o_totalprice DESC, o_orderkey LIMIT 10
    """))

  /** Batch sessionization (gap-and-island windows): per-user sessions
    * split at >30-minute inactivity gaps — lag to detect gaps, a
    * running sum to number islands, then one aggregate per session.
    * Identical semantics to the STREAMING
    * [[graft.streaming.Streams.sessionize]] (strictly-greater gap
    * opens a session), so the oracle-checked batch form pins what the
    * state-store form computes. Scale: both shuffles key on user_id —
    * one exchange reused by lag, the running sum, and the groupBy.
    * Gap compare uses exact integer micros on both engines. */
  val sessionizeBatch = GQuery(
    "q_sessionize_batch",
    (s, d) => {
      val GapMicros = 1800L * 1000000L
      val w = Window.partitionBy("user_id").orderBy("ts", "event_id")
      Tables.events(s, d)
        .withColumn("_prev", lag(col("ts"), 1).over(w))
        .withColumn("_new_sess",
          when(col("_prev").isNull ||
            unix_micros(col("ts")) - unix_micros(col("_prev")) > GapMicros, 1L)
            .otherwise(0L))
        .withColumn("session_id", sum("_new_sess").over(w))
        .groupBy("user_id", "session_id")
        .agg(min(col("ts")).as("session_start"),
          max(col("ts")).as("session_end"),
          count(lit(1)).as("n_events"))
        .orderBy("user_id", "session_id")
    },
    Some("""
      WITH g AS (
        SELECT user_id, event_id, ts,
               lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev_ts
        FROM events),
      f AS (
        SELECT *, CASE WHEN prev_ts IS NULL
                         OR epoch_us(ts) - epoch_us(prev_ts) > 1800000000
                       THEN 1 ELSE 0 END AS new_sess
        FROM g),
      s AS (
        SELECT *, SUM(new_sess) OVER (PARTITION BY user_id
                    ORDER BY ts, event_id ROWS UNBOUNDED PRECEDING) AS session_id
        FROM f)
      SELECT user_id, CAST(session_id AS BIGINT) AS session_id,
             CAST(MIN(ts) AS TIMESTAMP) AS session_start,
             CAST(MAX(ts) AS TIMESTAMP) AS session_end,
             COUNT(*) AS n_events
      FROM s GROUP BY user_id, session_id
      ORDER BY user_id, session_id
    """))

  /** Rolling-window feature extraction — the per-entity sliding-frame
    * features (trailing-3-order spend, momentum flags) a churn/LTV
    * training set is built from. Determinism discipline: money is
    * converted to integer CENTS before any frame aggregation —
    * sliding-frame float sums are engine-implementation-defined
    * association order (Spark recomputes per frame, DuckDB segment-
    * trees), so a double sum could drift in the last ulp; integer
    * sums cannot. Scale shape: one hash Exchange on the entity key;
    * the ordered frame walk, the lag pass, and the final per-entity
    * aggregate all reuse that partitioning (no second shuffle —
    * RobustSpec asserts the single-Exchange plan). */
  val rollingFeatures = GQuery(
    "q_rolling_features",
    (s, d) => {
      val cents = round(col("o_totalprice") * 100).cast("long")
      val byTime = Window.partitionBy("o_custkey")
        .orderBy(col("o_orderdate"), col("o_orderkey"))
      val frame3 = byTime.rowsBetween(-2, Window.currentRow)
      Tables.orders(s, d)
        .withColumn("_cents", cents)
        .withColumn("_sum3", sum(col("_cents")).over(frame3))
        .withColumn("_prev3", lag(col("_sum3"), 1).over(byTime))
        .withColumn("_rn", row_number().over(byTime))
        .withColumn("_cnt",
          count(lit(1)).over(Window.partitionBy("o_custkey")))
        .groupBy(col("o_custkey"))
        .agg(count(lit(1)).as("n_orders"),
          max(when(col("_rn") === col("_cnt"), col("_sum3")))
            .as("last3_cents"),
          max(col("_sum3")).as("max3_cents"),
          count(when(col("_sum3") > col("_prev3"), 1)).as("n_rising"))
        .orderBy("o_custkey")
    },
    Some("""
      WITH b AS (
        SELECT o_custkey, o_orderdate, o_orderkey,
               CAST(SUM(CAST(round(o_totalprice * 100) AS BIGINT))
                 OVER (PARTITION BY o_custkey
                       ORDER BY o_orderdate, o_orderkey
                       ROWS BETWEEN 2 PRECEDING AND CURRENT ROW)
                 AS BIGINT) AS sum3,
               ROW_NUMBER() OVER (PARTITION BY o_custkey
                                  ORDER BY o_orderdate, o_orderkey) AS rn,
               COUNT(*) OVER (PARTITION BY o_custkey) AS cnt
        FROM orders),
      f AS (
        SELECT *, LAG(sum3) OVER (PARTITION BY o_custkey
                    ORDER BY o_orderdate, o_orderkey) AS prev3
        FROM b)
      SELECT o_custkey, CAST(COUNT(*) AS BIGINT) AS n_orders,
             MAX(CASE WHEN rn = cnt THEN sum3 END) AS last3_cents,
             MAX(sum3) AS max3_cents,
             CAST(COUNT(CASE WHEN sum3 > prev3 THEN 1 END) AS BIGINT)
               AS n_rising
      FROM f GROUP BY o_custkey ORDER BY o_custkey
    """))

  /** Scalable global row numbering over a unique key: value-range
    * bucketing + per-bucket offsets instead of the single-partition
    * ORDER BY window (see GlobalIndex.scala for the one-Exchange
    * contract). The oracle is the thing the operator refuses to run:
    * a plain global row_number — identical answers, opposite plans. */
  val globalIndex = GQuery(
    "q_global_index",
    (s, d) => graft.ops.GlobalIndex
      .withGlobalIndex(
        Tables.orders(s, d).select("o_orderkey"),
        "o_orderkey", "global_idx", buckets = 64)
      .orderBy("o_orderkey"),
    Some("""
      SELECT o_orderkey,
             row_number() OVER (ORDER BY o_orderkey) AS global_idx
      FROM orders ORDER BY o_orderkey
    """))

  /** Ordered view→click→purchase funnel within a 7-day span:
    * chained first-eligible-step windows on ONE user-keyed exchange
    * (the per-step-join formulation — which the oracle uses — would
    * shuffle the event table once per step). */
  val eventFunnel = GQuery(
    "q_event_funnel",
    (s, d) => graft.ops.Funnel.funnel(
      Tables.events(s, d), "user_id", "ts", "event_type",
      Seq("view", "click", "purchase"), spanDays = 7),
    Some(graft.ops.Funnel.funnelSql(
      Seq("view", "click", "purchase"), spanDays = 7)))

  /** Weekly cohort retention (cohort = Monday week of first event),
    * offsets 0..4: window cohort derivation on the same user-keyed
    * exchange; the output is weeks² cells, not rows. */
  val cohortRetention = GQuery(
    "q_cohort_retention",
    (s, d) => graft.ops.Funnel.cohortRetention(
      Tables.events(s, d), "user_id", "ts", maxOffset = 4),
    Some(graft.ops.Funnel.cohortRetentionSql(maxOffset = 4)))

  def all: Seq[GQuery] =
    Seq(dupWindowMark, latestPerKey, surrogateKeys, topkOrders,
      sessionizeBatch, rollingFeatures, globalIndex, eventFunnel,
      cohortRetention)
}
