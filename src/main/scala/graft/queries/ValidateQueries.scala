package graft.queries

import org.apache.spark.sql.functions._
import graft.Tables
import graft.ops.Validate
import graft.ops.Validate.Rule

/** Validation family — SURVEY.md §2.2 P3-P6/P8, §2.4 A11, §2.5 W1.
  * Rules realized on `orders`/`customer`/`events` per FIXTURES.md §B.
  */
object ValidateQueries extends QueryPack {

  private def orderRules = Seq(
    Rule("Missing Customer", col("o_custkey").isNull),
    Rule("Invalid Status", !col("o_orderstatus").isin("F", "O")),
    Rule("Low Value", col("o_totalprice") < 1000),
    Rule("Duplicate Customer", Validate.duplicatedAll(col("o_custkey"))))

  private val orderRulesSql = """
      CASE WHEN o_custkey IS NULL THEN 'Missing Customer' END,
      CASE WHEN NOT (o_orderstatus IN ('F','O')) THEN 'Invalid Status' END,
      CASE WHEN o_totalprice < 1000 THEN 'Low Value' END,
      CASE WHEN o_custkey IS NOT NULL
            AND COUNT(*) OVER (PARTITION BY o_custkey) > 1
           THEN 'Duplicate Customer' END"""

  /** P5: error annotation — `; `-joined failed-rule names, rule order
    * preserved (reference: dags/DataWarehouse.py:626-634). */
  val errorAnnotation = GQuery(
    "q_error_annotation",
    (s, d) => Validate.annotate(Tables.orders(s, d), orderRules)
      .select(col("o_orderkey"), col("error_details"))
      .orderBy("o_orderkey"),
    Some(s"""
      SELECT o_orderkey,
             concat_ws('; ', $orderRulesSql) AS error_details
      FROM orders ORDER BY o_orderkey
    """))

  /** P4 + A11: good/bad split counts and the circuit-breaker rate. */
  val quarantineStats = GQuery(
    "q_quarantine_stats",
    (s, d) => Validate.annotate(Tables.orders(s, d), orderRules)
      .agg(
        count(lit(1)).as("total_rows"),
        count(when(col("error_details") =!= "", 1)).as("bad_rows"),
        count(when(col("error_details") === "", 1)).as("good_rows"))
      .withColumn("error_rate_pct",
        round(col("bad_rows") * lit(100.0) / col("total_rows"), 4)),
    Some(s"""
      WITH annotated AS (
        SELECT concat_ws('; ', $orderRulesSql) AS error_details
        FROM orders
      )
      SELECT COUNT(*) AS total_rows,
             COUNT(CASE WHEN error_details <> '' THEN 1 END) AS bad_rows,
             COUNT(CASE WHEN error_details = '' THEN 1 END) AS good_rows,
             ROUND(COUNT(CASE WHEN error_details <> '' THEN 1 END) * 100.0
                   / COUNT(*), 4) AS error_rate_pct
      FROM annotated
    """))

  /** P6: domain-whitelist violations (narrowed whitelist so the clean
    * testdata yields violations). */
  val domainWhitelist = GQuery(
    "q_domain_whitelist",
    (s, d) => Tables.customer(s, d)
      .filter(!col("c_mktsegment").isin("BUILDING", "AUTOMOBILE", "MACHINERY"))
      .select(col("c_custkey"), col("c_mktsegment"))
      .orderBy("c_custkey"),
    Some("""
      SELECT c_custkey, c_mktsegment FROM customer
      WHERE NOT (c_mktsegment IN ('BUILDING','AUTOMOBILE','MACHINERY'))
      ORDER BY c_custkey
    """))

  /** P8: lenient numeric coercion — regex-extract then try_cast; the
    * not-numeric flag fires only on originally-non-null input
    * (reference: dags/Reprocessing.py:85-93). */
  val coerceNumeric = GQuery(
    "q_coerce_numeric",
    (s, d) => {
      // hash-spread: the regex-extract pass dominates (Tables.spread)
      val e = Tables.spread(s, Tables.events(s, d), "event_id")
      val kRaw = regexp_extract(col("props"), "\"k\": (\\d+)", 1)
      e.select(
          col("event_id"),
          kRaw.try_cast("int").as("k_value"),
          (col("event_type").try_cast("double").isNull &&
            col("event_type").isNotNull).cast("int").as("type_not_numeric"))
        .orderBy("event_id")
    },
    Some("""
      SELECT event_id,
             TRY_CAST(regexp_extract(props, '"k": (\d+)', 1) AS INTEGER) AS k_value,
             CAST(TRY_CAST(event_type AS DOUBLE) IS NULL
                  AND event_type IS NOT NULL AS INTEGER) AS type_not_numeric
      FROM events ORDER BY event_id
    """))

  /** Functional-dependency audit ([[Validate.fdViolations]]): the
    * user_id → country dependency over a feed derived from events,
    * with planted corruption — every event_id % 997 == 0 row reports
    * a shifted country, every % 1009 == 0 row a NULL (a null-vs-value
    * split IS a violation, surfaced as `__null__`). The audit emits
    * only the violating keys with their evidence pair; clean keys —
    * the overwhelming majority — never leave the aggregate. */
  val fdViolations = GQuery(
    "q_fd_violations",
    (s, d) => Validate
      .fdViolations(
        Tables.events(s, d).select(col("user_id"),
          when(pmod(col("event_id"), lit(1009)) === 0, lit(null))
            .when(pmod(col("event_id"), lit(997)) === 0,
              concat(lit("C"),
                pmod(col("user_id") + 1, lit(7)).cast("string")))
            .otherwise(concat(lit("C"),
              pmod(col("user_id"), lit(7)).cast("string")))
            .as("country")),
        col("user_id"), col("country"))
      .orderBy("fd_key"),
    Some("""
      WITH feed AS (
        SELECT user_id,
               CASE WHEN event_id % 1009 = 0 THEN NULL
                    WHEN event_id % 997 = 0
                      THEN 'C' || CAST((user_id + 1) % 7 AS VARCHAR)
                    ELSE 'C' || CAST(user_id % 7 AS VARCHAR) END
                 AS country
        FROM events),
      pairs AS (
        SELECT user_id AS fd_key,
               coalesce(CAST(country AS VARCHAR), '__null__') AS attr
        FROM feed GROUP BY 1, 2)
      SELECT fd_key, COUNT(*) AS n_values,
             MIN(attr) AS min_attr, MAX(attr) AS max_attr
      FROM pairs GROUP BY fd_key HAVING COUNT(*) > 1
      ORDER BY fd_key
    """))

  def all: Seq[GQuery] =
    Seq(errorAnnotation, quarantineStats, domainWhitelist, coerceNumeric,
      fdViolations)
}
