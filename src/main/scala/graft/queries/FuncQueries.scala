package graft.queries

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.IntegerType
import graft.Tables
import graft.ops.SafeCast

/** Scalar-function family — SURVEY.md §2.8 F1-F16.
  * All expressions are built-in Catalyst functions (codegen'd), no
  * UDFs — per-row, shuffle-free, fully pushdown-transparent.
  */
object FuncQueries extends QueryPack {

  /** F1/F2/F3/F8/F15: string normalization battery. DuckDB has no
    * initcap, so the oracle spells out the same first-upper/rest-lower
    * transform. */
  val stringFuncs = GQuery(
    "q_string_funcs",
    (s, d) => Tables.customer(s, d).select(
      col("c_custkey"),
      upper(trim(col("c_name"))).as("name_upper"),
      lower(col("c_mktsegment")).as("segment_lower"),
      regexp_replace(col("c_mktsegment"), "BUILDING", "BLDG").as("segment_replaced"),
      concat(col("c_name"), lit("#"), col("c_custkey").cast("string")).as("name_tagged"),
      concat(upper(substring(lower(col("c_mktsegment")), 1, 1)),
        substring(lower(col("c_mktsegment")), 2, 1000)).as("segment_title"),
      length(col("c_name")).as("name_len"))
      .orderBy("c_custkey"),
    Some("""
      SELECT c_custkey,
             UPPER(TRIM(c_name)) AS name_upper,
             LOWER(c_mktsegment) AS segment_lower,
             REGEXP_REPLACE(c_mktsegment, 'BUILDING', 'BLDG', 'g') AS segment_replaced,
             c_name || '#' || CAST(c_custkey AS VARCHAR) AS name_tagged,
             UPPER(SUBSTRING(LOWER(c_mktsegment), 1, 1))
               || SUBSTRING(LOWER(c_mktsegment), 2, 1000) AS segment_title,
             LENGTH(c_name) AS name_len
      FROM customer ORDER BY c_custkey
    """))

  /** F4-F7/F16: the dirty-value safe-cast battery — 'n/a', unit
    * suffixes, and empty strings synthesized deterministically then
    * recovered through regex-strip + NULLIF + try_cast. */
  val safeCastDirty = GQuery(
    "q_safe_cast_dirty",
    (s, d) => {
      val p = Tables.part(s, d)
      val dirtySize = when(col("p_partkey") % 7 === 0, lit("n/a"))
        .when(col("p_partkey") % 5 === 0,
          concat(col("p_size").cast("string"), lit("px")))
        .otherwise(col("p_size").cast("string"))
      val dirtyBrand = when(col("p_partkey") % 11 === 0, lit(""))
        .otherwise(col("p_brand"))
      p.select(
          col("p_partkey"),
          SafeCast.safeNumeric(dirtySize, IntegerType).as("parsed_size"),
          SafeCast.emptyToNull(dirtyBrand).as("brand_or_null"))
        .orderBy("p_partkey")
    },
    Some("""
      SELECT p_partkey,
             TRY_CAST(NULLIF(REGEXP_REPLACE(
               CASE WHEN p_partkey % 7 = 0 THEN 'n/a'
                    WHEN p_partkey % 5 = 0 THEN CAST(p_size AS VARCHAR) || 'px'
                    ELSE CAST(p_size AS VARCHAR) END,
               '[^0-9.]', '', 'g'), '') AS INTEGER) AS parsed_size,
             NULLIF(CASE WHEN p_partkey % 11 = 0 THEN '' ELSE p_brand END, '')
               AS brand_or_null
      FROM part ORDER BY p_partkey
    """))

  /** F9/F10: CASE value mapping + IN-list flags (boolean→'Yes'/'No'
    * shape from the reference export). */
  val caseMapping = GQuery(
    "q_case_map",
    (s, d) => Tables.orders(s, d).select(
      col("o_orderkey"),
      when(col("o_orderstatus") === "F", "Finished")
        .when(col("o_orderstatus") === "O", "Open")
        .otherwise("Pending").as("status_label"),
      when(col("o_orderpriority").isin("1-URGENT", "2-HIGH"), "Yes")
        .otherwise("No").as("is_priority"))
      .orderBy("o_orderkey"),
    Some("""
      SELECT o_orderkey,
             CASE WHEN o_orderstatus = 'F' THEN 'Finished'
                  WHEN o_orderstatus = 'O' THEN 'Open'
                  ELSE 'Pending' END AS status_label,
             CASE WHEN o_orderpriority IN ('1-URGENT','2-HIGH') THEN 'Yes'
                  ELSE 'No' END AS is_priority
      FROM orders ORDER BY o_orderkey
    """))

  /** F11-F14: date arithmetic — day diffs, extraction, GREATEST,
    * DATE casts. */
  val dateFuncs = GQuery(
    "q_date_funcs",
    // hash-spread: one heavy broadcast-join+projection pass over the
    // single-row-group fact (Tables.spread scaladoc)
    (s, d) => Tables.spread(s, Tables.lineitem(s, d), "l_orderkey")
      .join(Tables.orders(s, d), col("l_orderkey") === col("o_orderkey"))
      .select(
        col("l_orderkey"), col("l_linenumber"),
        datediff(col("l_shipdate").cast("date"), col("o_orderdate").cast("date"))
          .as("ship_delay_days"),
        year(col("l_shipdate")).as("ship_year"),
        month(col("l_shipdate")).as("ship_month"),
        greatest(col("l_shipdate").cast("date"), col("o_orderdate").cast("date"))
          .as("latest_date"))
      // ship_delay_days tie-break: (orderkey, linenumber) is not
      // unique in lineitem (planted dup lines with different
      // shipdates); every output column is a function of (order,
      // ship date), and delay_days pins the ship date given the
      // order — total ordering up to identical rows (the
      // q_star_fact_load sf1 finding).
      .orderBy("l_orderkey", "l_linenumber", "ship_delay_days"),
    Some("""
      SELECT l.l_orderkey, l.l_linenumber,
             datediff('day', CAST(o.o_orderdate AS DATE),
                      CAST(l.l_shipdate AS DATE)) AS ship_delay_days,
             EXTRACT(YEAR FROM l.l_shipdate) AS ship_year,
             EXTRACT(MONTH FROM l.l_shipdate) AS ship_month,
             GREATEST(CAST(l.l_shipdate AS DATE),
                      CAST(o.o_orderdate AS DATE)) AS latest_date
      FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
      ORDER BY l_orderkey, l_linenumber, ship_delay_days
    """))

  /** F13: tenure-in-months with Postgres age() month-borrow semantics
    * (see [[graft.ops.Dates.tenureMonths]] for the months_between
    * divergence pin). Reference computes this for every exported
    * customer (churn_export_dag_cloude.py:348-351); the fixed reference
    * date stands in for NOW() so the oracle is deterministic. The
    * order-date corpus spans leap years, so day-borrow and Feb-29
    * created dates are both exercised. */
  val tenureMonths = GQuery(
    "q_tenure_months",
    (s, d) => {
      val ref = to_date(lit("2026-08-15"))
      Tables.orders(s, d).select(
          col("o_orderkey"),
          col("o_orderdate").cast("date").as("created_date"),
          graft.ops.Dates.tenureMonths(ref, col("o_orderdate").cast("date"))
            .as("tenure_in_months"))
        .orderBy("o_orderkey")
    },
    Some("""
      SELECT o_orderkey,
             CAST(o_orderdate AS DATE) AS created_date,
             EXTRACT(YEAR FROM age(TIMESTAMP '2026-08-15', o_orderdate)) * 12
               + EXTRACT(MONTH FROM age(TIMESTAMP '2026-08-15', o_orderdate))
               AS tenure_in_months
      FROM orders ORDER BY o_orderkey
    """))

  /** Semi-structured extraction: the events `props` column carries a
    * JSON payload; `from_json` with a declared schema is the idiomatic
    * (and codegen'd) path — typed NULL on malformed input, schema
    * errors surface at plan time, unlike per-field regex scraping. A
    * schema-conformance flag rides along (the training-pipeline shape:
    * parse, validate, quarantine on NULL). */
  val jsonProps = GQuery(
    "q_json_props",
    // hash-spread: the from_json parse pass dominates (Tables.spread)
    (s, d) => Tables.spread(s, Tables.events(s, d), "event_id").select(
        col("event_id"),
        from_json(col("props"),
          org.apache.spark.sql.types.StructType.fromDDL("k INT"))
          .getField("k").as("k_value"))
      .withColumn("parsed_ok",
        col("k_value").isNotNull.cast("int"))
      .orderBy("event_id"),
    Some("""
      SELECT event_id,
             CAST(json_extract_string(props, '$.k') AS INTEGER) AS k_value,
             CAST(CAST(json_extract_string(props, '$.k') AS INTEGER)
                  IS NOT NULL AS INTEGER) AS parsed_ok
      FROM events ORDER BY event_id
    """))

  def all: Seq[GQuery] =
    Seq(stringFuncs, safeCastDirty, caseMapping, dateFuncs, tenureMonths,
      jsonProps)
}
