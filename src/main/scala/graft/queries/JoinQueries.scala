package graft.queries

import org.apache.spark.sql.functions._
import graft.Tables
import graft.ops.Exact

/** Join family — SURVEY.md §2.3 J1/J2/J7/J8/J10/J12, §2.7 U2.
  *
  * Scale notes: anti/semi joins on a key shuffle both sides on that
  * key (or broadcast the smaller side — Catalyst decides; customer is
  * broadcastable vs orders at every SF since it grows slower). The
  * decorrelated scalar-subquery pattern (J10) pre-aggregates the fact
  * side BEFORE the join, so the join input is one row per key — this
  * is the shape Catalyst rewrites correlated subqueries into, written
  * explicitly.
  */
object JoinQueries extends QueryPack {

  /** J2/J8/U2: NOT EXISTS as left_anti — customers with no orders. */
  val antiJoinNoOrders = GQuery(
    "q_anti_join",
    (s, d) => Tables.customer(s, d)
      .join(Tables.orders(s, d),
        col("c_custkey") === col("o_custkey"), "left_anti")
      .select(col("c_custkey"), col("c_name"))
      .orderBy("c_custkey"),
    Some("""
      SELECT c_custkey, c_name FROM customer c
      WHERE NOT EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey)
      ORDER BY c_custkey
    """))

  /** EXISTS as left_semi — customers with at least one order. */
  val semiJoinWithOrders = GQuery(
    "q_semi_join",
    (s, d) => Tables.customer(s, d)
      .join(Tables.orders(s, d),
        col("c_custkey") === col("o_custkey"), "left_semi")
      .select(col("c_custkey"), col("c_mktsegment"))
      .orderBy("c_custkey"),
    Some("""
      SELECT c_custkey, c_mktsegment FROM customer c
      WHERE EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey)
      ORDER BY c_custkey
    """))

  /** J10: correlated scalar subquery, decorrelated — per-customer
    * billing total with COALESCE 0 default (reference:
    * dags/churn_export_dag_cloude.py:353-355). */
  val customerTotals = GQuery(
    "q_scalar_subquery_total",
    (s, d) => {
      val totals = Tables.orders(s, d)
        .groupBy(col("o_custkey"))
        .agg(Exact.fixedSum(col("o_totalprice"), 2).as("t"))
      Tables.customer(s, d)
        .join(totals, col("c_custkey") === col("o_custkey"), "left")
        .select(col("c_custkey"),
          coalesce(col("t"), lit(0.0)).as("total_spent"))
        .orderBy("c_custkey")
    },
    Some(s"""
      SELECT c.c_custkey,
             COALESCE((SELECT ${Exact.fixedSumSql("o.o_totalprice", 2)}
                       FROM orders o WHERE o.o_custkey = c.c_custkey), 0) AS total_spent
      FROM customer c ORDER BY c_custkey
    """))

  /** J12: orphan-key audit across the star — one UNION ALL report. */
  val orphanChecks = GQuery(
    "q_orphan_checks",
    (s, d) => {
      def orphans(name: String, left: org.apache.spark.sql.DataFrame,
                  right: org.apache.spark.sql.DataFrame,
                  lk: String, rk: String) =
        left.join(right, col(lk) === col(rk), "left_anti")
          .agg(count(lit(1)).as("orphan_cnt"))
          .select(lit(name).as("check_name"), col("orphan_cnt"))
      Seq(
        orphans("lineitem_without_order", Tables.lineitem(s, d),
          Tables.orders(s, d), "l_orderkey", "o_orderkey"),
        orphans("order_without_customer", Tables.orders(s, d),
          Tables.customer(s, d), "o_custkey", "c_custkey"),
        orphans("customer_without_nation", Tables.customer(s, d),
          Tables.nation(s, d), "c_nationkey", "n_nationkey"))
        .reduce(_ unionByName _).orderBy("check_name")
    },
    Some("""
      SELECT 'lineitem_without_order' AS check_name, COUNT(*) AS orphan_cnt
        FROM lineitem l
        WHERE NOT EXISTS (SELECT 1 FROM orders o WHERE o.o_orderkey = l.l_orderkey)
      UNION ALL
      SELECT 'order_without_customer', COUNT(*)
        FROM orders o
        WHERE NOT EXISTS (SELECT 1 FROM customer c WHERE c.c_custkey = o.o_custkey)
      UNION ALL
      SELECT 'customer_without_nation', COUNT(*)
        FROM customer c
        WHERE NOT EXISTS (SELECT 1 FROM nation n WHERE n.n_nationkey = c.c_nationkey)
      ORDER BY check_name
    """))

  /** J1: equi inner join + aggregate (dup-vs-bronze count shape). */
  val innerJoinCount = GQuery(
    "q_inner_join_count",
    (s, d) => Tables.orders(s, d)
      .join(Tables.customer(s, d), col("o_custkey") === col("c_custkey"))
      .filter(col("c_acctbal") < 0)
      .agg(count(lit(1)).as("debtor_orders"),
        countDistinct(col("c_custkey")).as("debtor_customers")),
    Some("""
      SELECT COUNT(*) AS debtor_orders,
             COUNT(DISTINCT c.c_custkey) AS debtor_customers
      FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
      WHERE c.c_acctbal < 0
    """))

  /** TPC-H Q3 shape (shipping-priority top-k): segment-filtered
    * customers ⋈ orders ⋈ lineitem with date windows on both sides,
    * grouped revenue, global top-10. The multi-way-join OLAP canary:
    * filters push into all three scans before the joins, the
    * broadcast-sized dims go broadcast, and the top-k plans as
    * TakeOrderedAndProject. Revenue is the exact scaled-integer
    * product-sum (cents × discount-cents → 10⁻⁴ units — the
    * Exact.fixedSum rule applied to a product), with orderkey in the
    * ordering for a total order. */
  val tpchQ3 = GQuery(
    "q_tpch_q3",
    (s, d) => {
      val cutoff = "1998-01-01"
      val rev = (round(col("l_extendedprice") * 100).cast("long") *
        round((lit(1.0) - col("l_discount")) * 100).cast("long"))
      Tables.customer(s, d).filter(col("c_mktsegment") === "BUILDING")
        .join(Tables.orders(s, d),
          col("c_custkey") === col("o_custkey"))
        .filter(col("o_orderdate") < lit(cutoff).cast("timestamp"))
        .join(Tables.lineitem(s, d),
          col("o_orderkey") === col("l_orderkey"))
        .filter(col("l_shipdate") > lit(cutoff).cast("timestamp"))
        .groupBy(col("l_orderkey"),
          col("o_orderdate").cast("date").as("order_date"),
          col("o_orderpriority"))
        .agg((sum(rev).cast("double") / 10000.0).as("revenue"))
        .orderBy(col("revenue").desc, col("order_date"),
          col("l_orderkey"))
        .limit(10)
    },
    Some("""
      SELECT l_orderkey, CAST(o_orderdate AS DATE) AS order_date,
             o_orderpriority,
             CAST(SUM(CAST(ROUND(l_extendedprice * 100) AS BIGINT) *
                      CAST(ROUND((1.0 - l_discount) * 100) AS BIGINT))
               AS DOUBLE) / 10000.0 AS revenue
      FROM customer
      JOIN orders ON c_custkey = o_custkey
      JOIN lineitem ON o_orderkey = l_orderkey
      WHERE c_mktsegment = 'BUILDING'
        AND o_orderdate < TIMESTAMP '1998-01-01'
        AND l_shipdate > TIMESTAMP '1998-01-01'
      GROUP BY l_orderkey, CAST(o_orderdate AS DATE), o_orderpriority
      ORDER BY revenue DESC, order_date, l_orderkey
      LIMIT 10
    """))

  /** TPC-H Q5 shape (local-supplier volume): the six-way
    * region→nation→{customer, supplier}→orders→lineitem join with the
    * same-nation constraint (customer and supplier share n_nationkey),
    * revenue per nation in a region-year window. The deepest join
    * chain in the registry — region/nation/supplier broadcast, the
    * fact-side join keys on custkey then orderkey, and the same-nation
    * predicate closes the loop AFTER the supplier join (the classic
    * Q5 correlation Catalyst must not lose). */
  val tpchQ5 = GQuery(
    "q_tpch_q5",
    (s, d) => {
      val rev = (round(col("l_extendedprice") * 100).cast("long") *
        round((lit(1.0) - col("l_discount")) * 100).cast("long"))
      Tables.region(s, d).filter(col("r_name") === "ASIA")
        .join(Tables.nation(s, d),
          col("r_regionkey") === col("n_regionkey"))
        .join(Tables.customer(s, d),
          col("n_nationkey") === col("c_nationkey"))
        .join(Tables.orders(s, d), col("c_custkey") === col("o_custkey"))
        .filter(col("o_orderdate") >= lit("1996-01-01").cast("timestamp") &&
          col("o_orderdate") < lit("1998-01-01").cast("timestamp"))
        .join(Tables.lineitem(s, d), col("o_orderkey") === col("l_orderkey"))
        .join(Tables.supplier(s, d),
          col("l_suppkey") === col("s_suppkey") &&
            col("s_nationkey") === col("c_nationkey"))
        .groupBy(col("n_name"))
        .agg((sum(rev).cast("double") / 10000.0).as("revenue"),
          count(lit(1)).as("n_items"))
        .orderBy(col("n_name"))
    },
    Some("""
      SELECT n_name,
             CAST(SUM(CAST(ROUND(l_extendedprice * 100) AS BIGINT) *
                      CAST(ROUND((1.0 - l_discount) * 100) AS BIGINT))
               AS DOUBLE) / 10000.0 AS revenue,
             COUNT(*) AS n_items
      FROM region
      JOIN nation ON r_regionkey = n_regionkey
      JOIN customer ON n_nationkey = c_nationkey
      JOIN orders ON c_custkey = o_custkey
      JOIN lineitem ON o_orderkey = l_orderkey
      JOIN supplier ON l_suppkey = s_suppkey
                   AND s_nationkey = c_nationkey
      WHERE r_name = 'ASIA'
        AND o_orderdate >= TIMESTAMP '1996-01-01'
        AND o_orderdate < TIMESTAMP '1998-01-01'
      GROUP BY n_name
      ORDER BY n_name
    """))

  /** TPC-H Q18 shape (large-volume customers): semi-join against an
    * AGGREGATE-filtered key set — orders whose total lineitem
    * quantity crosses a threshold, then the customer⋈orders⋈lineitem
    * rollup for just those orders. The shape the registry lacked:
    * the filter is a HAVING over a grouped fact, so the semi-join's
    * build side is itself an exchange output (map-side combined),
    * not a scan — and only qualifying orders ever reach the wide
    * join. Threshold picked to qualify a thin slice at every SF
    * (quantities are uniform 1..50 over ~4 lines/order). */
  val tpchQ18 = GQuery(
    "q_tpch_q18",
    (s, d) => {
      val li = Tables.lineitem(s, d)
      val qualifying = li.groupBy("l_orderkey")
        .agg(sum(round(col("l_quantity")).cast("long")).as("_sumq"))
        .filter(col("_sumq") > 180L)
      Tables.orders(s, d)
        .join(qualifying, col("o_orderkey") === col("l_orderkey"))
        .join(Tables.customer(s, d),
          col("o_custkey") === col("c_custkey"))
        .select(col("c_custkey"), col("c_mktsegment"),
          col("o_orderkey"),
          col("o_orderdate").cast("date").as("order_date"),
          col("_sumq").as("total_qty"))
        .orderBy(col("total_qty").desc, col("o_orderkey"))
        .limit(50)
    },
    Some("""
      WITH q AS (
        SELECT l_orderkey,
               CAST(SUM(CAST(ROUND(l_quantity) AS BIGINT)) AS BIGINT)
                 AS total_qty
        FROM lineitem GROUP BY l_orderkey
        HAVING SUM(CAST(ROUND(l_quantity) AS BIGINT)) > 180)
      SELECT c_custkey, c_mktsegment, o_orderkey,
             CAST(o_orderdate AS DATE) AS order_date, total_qty
      FROM q
      JOIN orders ON o_orderkey = l_orderkey
      JOIN customer ON o_custkey = c_custkey
      ORDER BY total_qty DESC, o_orderkey
      LIMIT 50
    """))

  def all: Seq[GQuery] = Seq(
    antiJoinNoOrders, semiJoinWithOrders, customerTotals,
    orphanChecks, innerJoinCount, tpchQ3, tpchQ5, tpchQ18)
}
