package graft.ops

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Order-independent aggregation helpers.
  *
  * Double summation is not associative, so a shuffle-order-dependent
  * `sum(double)` can drift between runs (and vs the DuckDB oracle) in
  * the last ulps. Fixed-point business values (prices, quantities,
  * rates with k decimal digits) are instead summed as exact scaled
  * integers: round(x·10^k) per row is deterministic (same IEEE input →
  * same product → same half-up rounding in Spark and DuckDB), and the
  * int64 sum is exact and order-independent at any parallelism — this
  * is what makes the same query bit-stable on 32 local threads and on
  * 1000 executors.
  */
object Exact {

  /** Exact fixed-point sum of a double column with k decimal digits,
    * returned as double. */
  def fixedSum(c: Column, k: Int): Column = {
    val f = math.pow(10, k)
    sum(round(c * f).cast("long")).cast("double") / f
  }

  /** SQL text of the same computation for the DuckDB oracle. */
  def fixedSumSql(expr: String, k: Int): String = {
    val f = s"1e$k"
    s"CAST(SUM(CAST(ROUND(($expr) * $f) AS BIGINT)) AS DOUBLE) / $f"
  }

  /** Exact fixed-point average (sum/count), double result. */
  def fixedAvg(c: Column, k: Int): Column = {
    val f = math.pow(10, k)
    sum(round(c * f).cast("long")).cast("double") / f / count(lit(1))
  }

  def fixedAvgSql(expr: String, k: Int): String =
    s"${fixedSumSql(expr, k)} / COUNT(*)"
}
