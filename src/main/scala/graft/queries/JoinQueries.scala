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

  def all: Seq[GQuery] = Seq(
    antiJoinNoOrders, semiJoinWithOrders, customerTotals,
    orphanChecks, innerJoinCount)
}
