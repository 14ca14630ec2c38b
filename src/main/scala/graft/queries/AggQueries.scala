package graft.queries

import org.apache.spark.sql.functions._
import graft.Tables
import graft.ops.Exact

/** Aggregation family — SURVEY.md §2.4 A1-A8/A10, §2.7 U1.
  *
  * Scale notes: every aggregate here is a hash aggregate with map-side
  * partial aggregation (Spark plans partial_/final_ automatically), so
  * the shuffle moves one row per (group × partition), not per input
  * row. Grouping cardinalities are tiny and fixed (flags, priorities),
  * independent of data size — these queries scale linearly with input
  * and the shuffle is O(groups × partitions).
  */
object AggQueries extends QueryPack {

  /** A1+A6+A8 flagship aggregate (TPC-H Q1 shape): grouped exact sums
    * + counts over lineitem. */
  val pricingSummary = GQuery(
    "q_agg_pricing",
    (s, d) => Tables.lineitem(s, d)
      .groupBy(col("l_returnflag"), col("l_linestatus"))
      .agg(
        Exact.fixedSum(col("l_quantity"), 2).as("sum_qty"),
        Exact.fixedSum(col("l_extendedprice"), 2).as("sum_base_price"),
        Exact.fixedSum(col("l_extendedprice") * (lit(1) - col("l_discount")), 4)
          .as("sum_disc_price"),
        Exact.fixedAvg(col("l_quantity"), 2).as("avg_qty"),
        count(lit(1)).as("count_order"))
      .orderBy("l_returnflag", "l_linestatus"),
    Some(s"""
      SELECT l_returnflag, l_linestatus,
             ${Exact.fixedSumSql("l_quantity", 2)} AS sum_qty,
             ${Exact.fixedSumSql("l_extendedprice", 2)} AS sum_base_price,
             ${Exact.fixedSumSql("l_extendedprice * (1 - l_discount)", 4)} AS sum_disc_price,
             ${Exact.fixedAvgSql("l_quantity", 2)} AS avg_qty,
             COUNT(*) AS count_order
      FROM lineitem
      GROUP BY l_returnflag, l_linestatus
      ORDER BY l_returnflag, l_linestatus
    """))

  /** A2: multi-column conditional audit in ONE pass (reference
    * COUNT(*) FILTER — dags/SQL/DWH_Quality_Checks.sql:44-51). */
  val conditionalAudit = GQuery(
    "q_conditional_audit",
    (s, d) => Tables.lineitem(s, d).agg(
      count(lit(1)).as("total_rows"),
      count(when(col("l_orderkey").isNull, 1)).as("null_orderkey"),
      count(when(col("l_quantity").isNull, 1)).as("null_quantity"),
      count(when(col("l_discount") > 0.05, 1)).as("high_discount"),
      count(when(col("l_returnflag") === "R", 1)).as("returned_rows"),
      count(when(col("l_quantity") < 0, 1)).as("negative_qty")),
    Some("""
      SELECT COUNT(*) AS total_rows,
             COUNT(CASE WHEN l_orderkey IS NULL THEN 1 END) AS null_orderkey,
             COUNT(CASE WHEN l_quantity IS NULL THEN 1 END) AS null_quantity,
             COUNT(CASE WHEN l_discount > 0.05 THEN 1 END) AS high_discount,
             COUNT(CASE WHEN l_returnflag = 'R' THEN 1 END) AS returned_rows,
             COUNT(CASE WHEN l_quantity < 0 THEN 1 END) AS negative_qty
      FROM lineitem
    """))

  /** A3: GROUP BY + HAVING duplicate detection. */
  val dupHaving = GQuery(
    "q_dup_having",
    (s, d) => Tables.orders(s, d)
      .groupBy(col("o_custkey")).agg(count(lit(1)).as("order_cnt"))
      .filter(col("order_cnt") > 1)
      .orderBy("o_custkey"),
    Some("""
      SELECT o_custkey, COUNT(*) AS order_cnt FROM orders
      GROUP BY o_custkey HAVING COUNT(*) > 1 ORDER BY o_custkey
    """))

  /** A5: exact COUNT(DISTINCT) consistency check. */
  val countDistinctCheck = GQuery(
    "q_count_distinct",
    (s, d) => Tables.orders(s, d).agg(
      countDistinct(col("o_custkey")).as("distinct_customers"),
      count(lit(1)).as("total_orders")),
    Some("""
      SELECT COUNT(DISTINCT o_custkey) AS distinct_customers,
             COUNT(*) AS total_orders
      FROM orders
    """))

  /** A6: min/max range profiling (exact — no FP-order sensitivity). */
  val minmaxProfile = GQuery(
    "q_minmax_profile",
    (s, d) => Tables.lineitem(s, d).agg(
      min(col("l_quantity")).as("min_qty"), max(col("l_quantity")).as("max_qty"),
      min(col("l_extendedprice")).as("min_price"), max(col("l_extendedprice")).as("max_price"),
      min(col("l_discount")).as("min_disc"), max(col("l_discount")).as("max_disc"),
      min(col("l_shipdate").cast("date")).as("min_shipdate"),
      max(col("l_shipdate").cast("date")).as("max_shipdate")),
    Some("""
      SELECT min(l_quantity) AS min_qty, max(l_quantity) AS max_qty,
             min(l_extendedprice) AS min_price, max(l_extendedprice) AS max_price,
             min(l_discount) AS min_disc, max(l_discount) AS max_disc,
             min(CAST(l_shipdate AS DATE)) AS min_shipdate,
             max(CAST(l_shipdate AS DATE)) AS max_shipdate
      FROM lineitem
    """))

  /** A7: distribution counts ordered by frequency. */
  val distribution = GQuery(
    "q_distribution",
    (s, d) => Tables.orders(s, d)
      .groupBy(col("o_orderpriority")).agg(count(lit(1)).as("cnt"))
      .orderBy(desc("cnt"), col("o_orderpriority")),
    Some("""
      SELECT o_orderpriority, COUNT(*) AS cnt FROM orders
      GROUP BY o_orderpriority ORDER BY cnt DESC, o_orderpriority
    """))

  /** A4: SELECT DISTINCT dim extraction. */
  val distinctDims = GQuery(
    "q_distinct_dims",
    (s, d) => Tables.orders(s, d)
      .select(col("o_orderstatus"), col("o_orderpriority")).distinct()
      .orderBy("o_orderstatus", "o_orderpriority"),
    Some("""
      SELECT DISTINCT o_orderstatus, o_orderpriority FROM orders
      ORDER BY o_orderstatus, o_orderpriority
    """))

  /** U1: UNION ALL layer summary of 1-row aggregates. */
  val unionSummary = GQuery(
    "q_union_summary",
    (s, d) => {
      def c(name: String) = Tables.t(s, d, name)
        .agg(count(lit(1)).as("row_cnt")).select(lit(name).as("layer"), col("row_cnt"))
      Seq("lineitem", "orders", "customer", "supplier", "part")
        .map(c).reduce(_ unionByName _)
        .orderBy("layer")
    },
    Some("""
      SELECT 'lineitem' AS layer, COUNT(*) AS row_cnt FROM lineitem
      UNION ALL SELECT 'orders', COUNT(*) FROM orders
      UNION ALL SELECT 'customer', COUNT(*) FROM customer
      UNION ALL SELECT 'supplier', COUNT(*) FROM supplier
      UNION ALL SELECT 'part', COUNT(*) FROM part
      ORDER BY layer
    """))

  /** A10: batch stats — conditional counts + ratio in one aggregate
    * (reference export stats: dags/churn_export_dag_cloude.py:550-553). */
  val batchStats = GQuery(
    "q_batch_stats",
    (s, d) => Tables.events(s, d).agg(
      count(lit(1)).as("total_events"),
      count(when(col("event_type") === "purchase", 1)).as("purchases"),
      count(when(col("event_type") === "error", 1)).as("errors"),
      countDistinct(col("user_id")).as("active_users"))
      .withColumn("purchase_pct",
        round(col("purchases") * lit(100.0) / col("total_events"), 4)),
    Some("""
      SELECT COUNT(*) AS total_events,
             COUNT(CASE WHEN event_type = 'purchase' THEN 1 END) AS purchases,
             COUNT(CASE WHEN event_type = 'error' THEN 1 END) AS errors,
             COUNT(DISTINCT user_id) AS active_users,
             ROUND(COUNT(CASE WHEN event_type = 'purchase' THEN 1 END) * 100.0
                   / COUNT(*), 4) AS purchase_pct
      FROM events
    """))

  /** Robust outlier profile ([[graft.ops.Robust.outlierProfile]]):
    * per-priority discrete median / MAD over order totals + the
    * |x − med| > 5·MAD outlier count. The oracle runs the mirrored
    * rank arithmetic — every output value is either a value present
    * in the data or an IEEE subtraction of two such values, so the
    * double columns compare byte-exactly (see Robust's determinism
    * scaladoc). Plan: ONE Exchange on the group key; both rank
    * passes and the final aggregate reuse it (RobustSpec asserts). */
  val robustOutliers = GQuery(
    "q_robust_outliers",
    (s, d) => graft.ops.Robust.outlierProfile(
      Tables.orders(s, d), Seq("o_orderpriority"), "o_totalprice",
      "o_orderkey", k = 5)
      .orderBy("o_orderpriority"),
    Some(graft.ops.Robust.outlierProfileSql(
      "orders", "o_orderpriority", "o_orderpriority",
      "o_totalprice", "o_orderkey", k = 5) + " ORDER BY 1"))

  /** Robust winsorization ([[graft.ops.Robust.winsorize]]): every
    * order's total clamped into its priority's med ± 5·MAD band —
    * per-row output, so every clamp decision is oracle-checked
    * byte-exactly (the band edges are IEEE ops on discrete rank
    * values; see Robust's determinism scaladoc). */
  val robustWinsorize = GQuery(
    "q_robust_winsorize",
    (s, d) => graft.ops.Robust.winsorize(
      Tables.orders(s, d)
        .select("o_orderpriority", "o_totalprice", "o_orderkey"),
      Seq("o_orderpriority"), "o_totalprice", "o_orderkey",
      k = 5, as = "win_total")
      .select("o_orderkey", "o_totalprice", "win_total")
      .orderBy("o_orderkey"),
    Some(graft.ops.Robust.winsorizeSql(
      "orders", "o_orderpriority", "o_totalprice", "o_orderkey", k = 5,
      keepSelect = "tb AS o_orderkey, x AS o_totalprice",
      as = "win_total") + " ORDER BY 1"))

  /** Equal-frequency decile binning per segment
    * ([[graft.ops.Robust.equalFrequencyBins]]): customer balances
    * discretized into 10 per-mktsegment buckets under the explicit
    * (acctbal, custkey) total order. The per-bin aggregate makes the
    * equal-frequency property AND the exact boundaries the compared
    * surface — ntile's integer rank arithmetic must agree between
    * engines down to the bucket split of non-divisible groups. */
  val featureBinning = GQuery(
    "q_feature_binning",
    (s, d) => graft.ops.Robust.equalFrequencyBins(
      Tables.customer(s, d)
        .select("c_mktsegment", "c_acctbal", "c_custkey"),
      Seq("c_mktsegment"), "c_acctbal", "c_custkey", nBins = 10)
      .groupBy("c_mktsegment", "bin")
      .agg(count(lit(1)).as("n"),
        min("c_acctbal").as("lo"), max("c_acctbal").as("hi"),
        sum("c_custkey").as("id_sum"))
      .orderBy("c_mktsegment", "bin"),
    Some("""
      SELECT c_mktsegment, bin, COUNT(*) AS n,
             MIN(c_acctbal) AS lo, MAX(c_acctbal) AS hi,
             CAST(SUM(c_custkey) AS BIGINT) AS id_sum
      FROM (
        SELECT c_mktsegment, c_acctbal, c_custkey,
               ntile(10) OVER (PARTITION BY c_mktsegment
                 ORDER BY c_acctbal, c_custkey) AS bin
        FROM customer)
      GROUP BY c_mktsegment, bin ORDER BY c_mktsegment, bin
    """))

  /** Exact global top-10% by balance via histogram refinement
    * ([[graft.ops.Robust.topFraction]]): membership must equal the
    * oracle's independent full-rank formulation exactly — including
    * the boundary-bin tie resolution — while the engine never sorts
    * more than one bin. */
  val topFraction = GQuery(
    "q_top_fraction",
    (s, d) => graft.ops.Robust.topFraction(
      Tables.customer(s, d).select("c_custkey", "c_acctbal"),
      "c_acctbal", "c_custkey", keepMille = 100, binWidth = 500.0)
      .orderBy("c_custkey"),
    Some("""
      SELECT c_custkey, c_acctbal FROM (
        SELECT c_custkey, c_acctbal,
               ROW_NUMBER() OVER (ORDER BY c_acctbal DESC, c_custkey ASC)
                 AS rn,
               COUNT(*) OVER () AS n
        FROM customer WHERE c_acctbal IS NOT NULL)
      WHERE rn <= (n * 100 + 999) // 1000
      ORDER BY c_custkey
    """),
    eager = true)

  /** OLAP rollup hierarchy in one pass: (priority, status) revenue
    * with subtotal and grand-total rows via ROLLUP — the report shape
    * the reference built as separate GROUP BY queries. Rollup nulls
    * are disambiguated from data nulls through grouping() sentinels
    * in BOTH engines; money goes through the DECIMAL(18,4) exact-sum
    * convention. Catalyst plans rollup as one Expand + aggregate —
    * one pass over the fact, not one query per level. */
  val rollupReport = GQuery(
    "q_rollup_report",
    (s, d) => Tables.orders(s, d)
      .rollup(col("o_orderpriority"), col("o_orderstatus"))
      .agg(Exact.fixedSum(col("o_totalprice"), 2).as("revenue"),
        count(lit(1)).as("n_orders"),
        // grouping() is only legal inside the rollup aggregate
        grouping(col("o_orderpriority")).as("_gp"),
        grouping(col("o_orderstatus")).as("_gs"))
      .select(
        when(col("_gp") === 1, lit("<all>"))
          .otherwise(col("o_orderpriority")).as("priority"),
        when(col("_gs") === 1, lit("<all>"))
          .otherwise(col("o_orderstatus")).as("status"),
        col("revenue"), col("n_orders"))
      .orderBy("priority", "status"),
    Some(s"""
      SELECT CASE WHEN GROUPING(o_orderpriority) = 1 THEN '<all>'
                  ELSE o_orderpriority END AS priority,
             CASE WHEN GROUPING(o_orderstatus) = 1 THEN '<all>'
                  ELSE o_orderstatus END AS status,
             ${Exact.fixedSumSql("o_totalprice", 2)} AS revenue,
             COUNT(*) AS n_orders
      FROM orders
      GROUP BY ROLLUP (o_orderpriority, o_orderstatus)
      ORDER BY priority, status
    """))

  /** Pivot report: priority rows × status columns, exact-decimal
    * revenue per cell (empty cells null in both engines). Spark's
    * `pivot` with EXPLICIT values keeps the plan a single aggregate
    * (no distinct-values pre-query); the oracle is the portable
    * SUM(CASE) formulation. */
  val pivotReport = GQuery(
    "q_pivot_report",
    (s, d) => Tables.orders(s, d)
      .groupBy(col("o_orderpriority").as("priority"))
      .pivot("o_orderstatus", Seq("F", "O", "P"))
      .agg(Exact.fixedSum(col("o_totalprice"), 2))
      .orderBy("priority"),
    Some(s"""
      SELECT o_orderpriority AS priority,
             ${Exact.fixedSumSql(
               "CASE WHEN o_orderstatus = 'F' THEN o_totalprice END", 2)}
               AS "F",
             ${Exact.fixedSumSql(
               "CASE WHEN o_orderstatus = 'O' THEN o_totalprice END", 2)}
               AS "O",
             ${Exact.fixedSumSql(
               "CASE WHEN o_orderstatus = 'P' THEN o_totalprice END", 2)}
               AS "P"
      FROM orders GROUP BY o_orderpriority ORDER BY priority
    """))

  /** CUBE report: all four grouping combinations (both dims, each
    * alone, grand total) in ONE Expand + aggregate pass — the rollup
    * gate's lattice completion. Same grouping-sentinel and
    * DECIMAL-money conventions. */
  val cubeReport = GQuery(
    "q_cube_report",
    (s, d) => Tables.orders(s, d)
      .cube(col("o_orderpriority"), col("o_orderstatus"))
      .agg(Exact.fixedSum(col("o_totalprice"), 2).as("revenue"),
        count(lit(1)).as("n_orders"),
        grouping(col("o_orderpriority")).as("_gp"),
        grouping(col("o_orderstatus")).as("_gs"))
      .select(
        when(col("_gp") === 1, lit("<all>"))
          .otherwise(col("o_orderpriority")).as("priority"),
        when(col("_gs") === 1, lit("<all>"))
          .otherwise(col("o_orderstatus")).as("status"),
        col("revenue"), col("n_orders"))
      .orderBy("priority", "status"),
    Some(s"""
      SELECT CASE WHEN GROUPING(o_orderpriority) = 1 THEN '<all>'
                  ELSE o_orderpriority END AS priority,
             CASE WHEN GROUPING(o_orderstatus) = 1 THEN '<all>'
                  ELSE o_orderstatus END AS status,
             ${Exact.fixedSumSql("o_totalprice", 2)} AS revenue,
             COUNT(*) AS n_orders
      FROM orders
      GROUP BY CUBE (o_orderpriority, o_orderstatus)
      ORDER BY priority, status
    """))

  /** Exact weighted median ([[graft.ops.Robust.weightedMedian]]):
    * per-language median document length (n_chars) weighted by token
    * count — the importance-weighted statistic. Engine windows the
    * per-(lang, value) compressed frame; the oracle re-derives the
    * cumulative weights through a values-triangle JOIN (no window) —
    * a genuinely different prefix-sum mechanism. */
  val weightedMedianQ = GQuery(
    "q_weighted_median",
    (s, d) => graft.ops.Robust.weightedMedian(
      Tables.documents(s, d)
        .select(col("lang"), col("n_chars"),
          graft.ops.TextOps.tokenCount(col("text")).cast("long")
            .as("w")),
      Seq("lang"), "n_chars", "w")
      .orderBy("lang"),
    Some("""
      WITH pv AS (
        SELECT lang, n_chars,
               CAST(SUM(len(string_split(text, ' '))) AS BIGINT) AS w
        FROM documents GROUP BY lang, n_chars),
      cum AS (
        SELECT a.lang, a.n_chars,
               CAST(SUM(b.w) AS BIGINT) AS cumw
        FROM pv a JOIN pv b
          ON a.lang = b.lang AND b.n_chars <= a.n_chars
        GROUP BY a.lang, a.n_chars),
      tot AS (SELECT lang, CAST(SUM(w) AS BIGINT) AS tw
              FROM pv GROUP BY lang)
      SELECT c.lang,
             MIN(c.n_chars) AS weighted_median,
             CAST(MIN(t.tw) AS BIGINT) AS total_weight
      FROM cum c JOIN tot t USING (lang)
      WHERE c.cumw * 2 >= t.tw
      GROUP BY c.lang
      ORDER BY c.lang
    """))

  def all: Seq[GQuery] = Seq(
    pricingSummary, conditionalAudit, dupHaving, countDistinctCheck,
    minmaxProfile, distribution, distinctDims, unionSummary, batchStats,
    robustOutliers, robustWinsorize, featureBinning, topFraction,
    rollupReport, pivotReport, cubeReport, weightedMedianQ)
}
