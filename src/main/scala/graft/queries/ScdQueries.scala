package graft.queries

import org.apache.spark.sql.functions._
import graft.Tables
import graft.ops.Scd

/** SCD2 dimension-history family ([[graft.ops.Scd]]) — the
  * time-travel generalization of the reference's latest-state upserts
  * (SURVEY.md §2.3). Oracles are independent formulations: DuckDB
  * LAG/LEAD windows for the history build, set algebra over
  * explicit key classes for the incremental tick.
  */
object ScdQueries extends QueryPack {

  /** 2024-01-15T00:00:00Z in epoch micros — mid-window of the events
    * table's January 2024 span, so the snapshot catches every user
    * mid-history. */
  private val SnapMicros = 1705276800000000L

  /** Events as a change log floored to whole micros on BOTH sides
    * (same precision discipline as TemporalQueries: Spark's
    * `Tables.events` already floors nanos → micros; the oracle floors
    * via epoch_us). */
  private val EvSql =
    "SELECT user_id, event_id, epoch_us(ts) AS tsu, event_type FROM events"

  /** Shared oracle CTE: the SCD2 history of each user's event_type
    * transitions — LAG detects changes, LEAD closes intervals, both
    * ordered by (micros, event_id) exactly like the engine's window.
    * `chgFilter` restricts which events count as state transitions
    * (the fact-join query builds the dimension from non-purchase
    * events only). */
  private def histCte(chgFilter: String = "TRUE") = s"""
    ev AS ($EvSql),
    m AS (
      SELECT user_id, event_id, tsu, event_type,
             LAG(event_type) OVER
               (PARTITION BY user_id ORDER BY tsu, event_id) AS prev
      FROM ev WHERE $chgFilter),
    ch AS (
      SELECT user_id, event_id, tsu, event_type FROM m
      WHERE event_type IS DISTINCT FROM prev),
    hist AS (
      SELECT user_id, event_type,
             CAST(ROW_NUMBER() OVER
               (PARTITION BY user_id ORDER BY tsu, event_id) AS BIGINT)
               AS version,
             tsu AS valid_from,
             LEAD(tsu) OVER
               (PARTITION BY user_id ORDER BY tsu, event_id) AS valid_to
      FROM ch)"""

  private def engineHistory(s: org.apache.spark.sql.SparkSession,
                            d: String) =
    Scd.fromChangeLog(
      Tables.events(s, d)
        .select("user_id", "event_id", "ts", "event_type"),
      keys = Seq("user_id"), ts = "ts", attrs = Seq("event_type"),
      tieBreak = Seq("event_id"))

  /** Full SCD2 build from a change log: collapse consecutive
    * duplicate states, number versions, close intervals. */
  val scd2History = GQuery(
    "q_scd2_history",
    (s, d) => engineHistory(s, d)
      .select(col("user_id"), col("event_type"), col("version"),
        unix_micros(col("valid_from")).as("valid_from"),
        unix_micros(col("valid_to")).as("valid_to"),
        col("is_current"))
      .orderBy("user_id", "version"),
    Some(s"""
      WITH ${histCte()}
      SELECT user_id, event_type, version,
             CAST(valid_from AS BIGINT) AS valid_from,
             CAST(valid_to AS BIGINT) AS valid_to,
             CAST(valid_to IS NULL AS INT) AS is_current
      FROM hist ORDER BY user_id, version
    """))

  /** Point-in-time dimension snapshot: each user's state at
    * [[SnapMicros]] — `valid_from` inclusive, `valid_to` exclusive
    * (users whose first event is later are absent, not null-padded). */
  val scd2Snapshot = GQuery(
    "q_scd2_snapshot",
    (s, d) => Scd
      .snapshotAsOf(engineHistory(s, d), timestamp_micros(lit(SnapMicros)))
      .select(col("user_id"), col("event_type"), col("version"),
        unix_micros(col("valid_from")).as("valid_from"))
      .orderBy("user_id"),
    Some(s"""
      WITH ${histCte()}
      SELECT user_id, event_type, version,
             CAST(valid_from AS BIGINT) AS valid_from
      FROM hist
      WHERE valid_from <= $SnapMicros
        AND (valid_to IS NULL OR $SnapMicros < valid_to)
      ORDER BY user_id
    """))

  /** One incremental SCD2 tick over a seeded customer dimension.
    * Seed: every key has an open current row (even keys already at
    * version 2 with a closed version-1 behind them — exercising
    * history passthrough and version increments past 1). The batch
    * mixes all four tick classes: changed attrs (%3==0, acctbal
    * +100), explicit no-ops (%5==1 of the rest), and brand-new keys
    * (+1000000 for %7==0); absent keys are implicit no-ops. */
  val scd2Apply = GQuery(
    "q_scd2_apply",
    (s, d) => {
      val cust = Tables.customer(s, d)
      val k = col("c_custkey")
      val curRows = cust.select(k, col("c_mktsegment"), col("c_acctbal"),
        when(k % 2 === 0, 2L).otherwise(1L).as("version"),
        when(k % 2 === 0, 500L).otherwise(0L).as("valid_from"),
        lit(null).cast("long").as("valid_to"),
        lit(1).as("is_current"))
      val histRows = cust.filter(k % 2 === 0)
        .select(k, col("c_mktsegment"),
          (col("c_acctbal") - 50).as("c_acctbal"),
          lit(1L).as("version"), lit(0L).as("valid_from"),
          lit(500L).cast("long").as("valid_to"), lit(0).as("is_current"))
      val inc = cust.filter(k % 3 === 0)
        .select(k, col("c_mktsegment"),
          (col("c_acctbal") + 100).as("c_acctbal"))
        .unionByName(cust.filter(k % 3 =!= 0 && k % 5 === 1)
          .select(k, col("c_mktsegment"), col("c_acctbal")))
        .unionByName(cust.filter(k % 7 === 0)
          .select((k + 1000000).as("c_custkey"),
            col("c_mktsegment"), col("c_acctbal")))
      Scd.applyChanges(curRows.unionByName(histRows), inc,
          keys = Seq("c_custkey"),
          attrs = Seq("c_mktsegment", "c_acctbal"),
          effectiveTs = lit(1000L))
        .orderBy("c_custkey", "version")
    },
    Some("""
      WITH cur AS (
        SELECT c_custkey, c_mktsegment, c_acctbal,
               CASE WHEN c_custkey % 2 = 0 THEN 2 ELSE 1 END AS version,
               CASE WHEN c_custkey % 2 = 0 THEN 500 ELSE 0 END AS valid_from
        FROM customer),
      hist AS (
        SELECT c_custkey, c_mktsegment, c_acctbal - 50 AS c_acctbal
        FROM customer WHERE c_custkey % 2 = 0),
      inc AS (
        SELECT c_custkey, c_mktsegment, c_acctbal + 100 AS c_acctbal
        FROM customer WHERE c_custkey % 3 = 0
        UNION ALL
        SELECT c_custkey, c_mktsegment, c_acctbal
        FROM customer WHERE c_custkey % 3 <> 0 AND c_custkey % 5 = 1
        UNION ALL
        SELECT c_custkey + 1000000, c_mktsegment, c_acctbal
        FROM customer WHERE c_custkey % 7 = 0),
      changedkeys AS (
        SELECT c.c_custkey FROM cur c JOIN inc i USING (c_custkey)
        WHERE i.c_mktsegment IS DISTINCT FROM c.c_mktsegment
           OR i.c_acctbal IS DISTINCT FROM c.c_acctbal),
      outrows AS (
        SELECT c_custkey, c_mktsegment, c_acctbal, 1 AS version,
               0 AS valid_from, 500 AS valid_to, 0 AS is_current
        FROM hist
        UNION ALL
        SELECT c_custkey, c_mktsegment, c_acctbal, version,
               valid_from, NULL, 1
        FROM cur
        WHERE c_custkey NOT IN (SELECT c_custkey FROM changedkeys)
        UNION ALL
        SELECT c_custkey, c_mktsegment, c_acctbal, version,
               valid_from, 1000, 0
        FROM cur
        WHERE c_custkey IN (SELECT c_custkey FROM changedkeys)
        UNION ALL
        SELECT i.c_custkey, i.c_mktsegment, i.c_acctbal,
               c.version + 1, 1000, NULL, 1
        FROM inc i JOIN cur c USING (c_custkey)
        WHERE i.c_custkey IN (SELECT c_custkey FROM changedkeys)
        UNION ALL
        SELECT i.c_custkey, i.c_mktsegment, i.c_acctbal, 1, 1000,
               NULL, 1
        FROM inc i
        WHERE i.c_custkey NOT IN (SELECT c_custkey FROM cur)
      )
      SELECT c_custkey, c_mktsegment, c_acctbal,
             CAST(version AS BIGINT) AS version,
             CAST(valid_from AS BIGINT) AS valid_from,
             CAST(valid_to AS BIGINT) AS valid_to,
             CAST(is_current AS INT) AS is_current
      FROM outrows ORDER BY c_custkey, version
    """))

  /** Fact rows joined to the dimension version valid at fact time —
    * SCD2's consumption pattern. Dimension: each user's state built
    * from NON-purchase events; facts: the purchases. The engine runs
    * [[graft.ops.AsOf.backward]] on `valid_from` with the version as
    * tie-break — because a key's intervals partition the timeline,
    * "latest valid_from at-or-before ts" IS interval containment
    * (the zero-length versions equal-instant supersession creates
    * lose every tie-break by construction). The oracle proves that
    * equivalence with a literal containment join, a genuinely
    * different formulation. Purchases before a user's first state
    * null-pad, left-join style. Scale shape: one keyed shuffle for
    * the as-of (AsOfSpec's plan contract), one for the history
    * build. */
  val scd2FactJoin = GQuery(
    "q_scd2_fact_join",
    (s, d) => {
      val ev = Tables.events(s, d)
        .select("event_id", "user_id", "ts", "event_type")
      val hist = Scd.fromChangeLog(
          ev.filter(col("event_type") =!= "purchase"),
          keys = Seq("user_id"), ts = "ts", attrs = Seq("event_type"),
          tieBreak = Seq("event_id"))
        .withColumnRenamed("event_type", "state")
      val facts = ev.filter(col("event_type") === "purchase")
        .select("event_id", "user_id", "ts")
      graft.ops.AsOf.backward(facts, hist,
          leftKey = "user_id", rightKey = "user_id",
          leftTime = "ts", rightTime = "valid_from",
          rightPayload = Seq("state", "version"),
          tieBreak = "version")
        .select(col("event_id"), col("user_id"), col("state"),
          col("version"))
        .orderBy("event_id")
    },
    Some(s"""
      WITH ${histCte("event_type <> 'purchase'")},
      facts AS (
        SELECT event_id, user_id, tsu FROM ev
        WHERE event_type = 'purchase')
      SELECT f.event_id, f.user_id,
             h.event_type AS state, h.version
      FROM facts f
      LEFT JOIN hist h
        ON h.user_id = f.user_id
       AND h.valid_from <= f.tsu
       AND (h.valid_to IS NULL OR f.tsu < h.valid_to)
      ORDER BY f.event_id
    """))

  def all: Seq[GQuery] =
    Seq(scd2History, scd2Snapshot, scd2Apply, scd2FactJoin)
}
