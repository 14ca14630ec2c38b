package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Interval coalescing (gaps-and-islands): merge each key's
  * overlapping — and optionally abutting — intervals into maximal
  * disjoint spans. The consolidation primitive behind downtime
  * reports, coverage maps, and stitching chunk-level activity back
  * into continuous spans; the dual of sessionization (which builds
  * intervals from points — this merges intervals that already
  * exist).
  *
  * Determinism discipline: all boundary comparisons are integer
  * microseconds (`unix_micros`); an island BREAK happens at row i iff
  * `start_i > max(end_0..i-1)` (`>=` when abutting intervals must
  * stay separate) — pure integer window arithmetic, identical in the
  * SQL mirror.
  *
  * Scale shape: ONE hash Exchange on the key; the running-max pass,
  * the island-numbering running sum, and the final per-island
  * aggregate all reuse that partitioning (plan-asserted in
  * IntervalsSpec). Per-key interval counts bound the window sort —
  * the same per-group-sort contract every window op here carries. */
object Intervals {

  /** One row per (key, island): `island_start`, `island_end`,
    * `n_merged`. `mergeAbutting=true` (default) treats [a,b)+[b,c) as
    * one island — half-open adjacency has no gap between them. */
  def coalesce(df: DataFrame, keyCols: Seq[String],
               startCol: String, endCol: String,
               mergeAbutting: Boolean = true): DataFrame = {
    require(keyCols.nonEmpty, "coalesce needs at least one key column")
    val reserved = Set("_s", "_e", "_pmax", "_island")
    val hits = df.columns.toSet.intersect(reserved)
    require(hits.isEmpty,
      s"input columns collide with Intervals internals: ${hits.mkString(", ")}")
    val keyCs = keyCols.map(col)
    val ord = Seq(col("_s").asc, col("_e").asc)
    val wPrev = Window.partitionBy(keyCs: _*).orderBy(ord: _*)
      .rowsBetween(Window.unboundedPreceding, -1)
    val wRun = Window.partitionBy(keyCs: _*).orderBy(ord: _*)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val gap =
      if (mergeAbutting) col("_s") > col("_pmax") else col("_s") >= col("_pmax")
    df.filter(col(startCol).isNotNull && col(endCol).isNotNull &&
        col(endCol) > col(startCol))
      .withColumn("_s", unix_micros(col(startCol).cast("timestamp")))
      .withColumn("_e", unix_micros(col(endCol).cast("timestamp")))
      .withColumn("_pmax", max(col("_e")).over(wPrev))
      .withColumn("_island",
        sum(when(col("_pmax").isNull || gap, 1L).otherwise(0L)).over(wRun))
      .groupBy(keyCs :+ col("_island"): _*)
      .agg(timestamp_micros(min(col("_s"))).as("island_start"),
        timestamp_micros(max(col("_e"))).as("island_end"),
        count(lit(1)).as("n_merged"))
      .drop("_island")
  }

  /** DuckDB mirror: emits a full SELECT over `table` with the same
    * integer-micros island arithmetic, keyed by `keyExpr` (aliased
    * `keyAs`). */
  def coalesceSql(table: String, keyExpr: String, keyAs: String,
                  startExpr: String, endExpr: String,
                  mergeAbutting: Boolean = true): String = {
    val cmp = if (mergeAbutting) ">" else ">="
    s"""
    WITH _iv AS (
      SELECT $keyExpr AS k,
             epoch_us(CAST($startExpr AS TIMESTAMP)) AS s,
             epoch_us(CAST($endExpr AS TIMESTAMP)) AS e
      FROM $table
      WHERE $startExpr IS NOT NULL AND $endExpr IS NOT NULL
        AND $endExpr > $startExpr),
    _pm AS (
      SELECT *, MAX(e) OVER (PARTITION BY k ORDER BY s, e
                 ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
               AS pmax
      FROM _iv),
    _isl AS (
      SELECT *, SUM(CASE WHEN pmax IS NULL OR s $cmp pmax
                         THEN 1 ELSE 0 END)
                  OVER (PARTITION BY k ORDER BY s, e
                    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
               AS island
      FROM _pm)
    SELECT k AS $keyAs,
           make_timestamp(MIN(s)) AS island_start,
           make_timestamp(MAX(e)) AS island_end,
           COUNT(*) AS n_merged
    FROM _isl GROUP BY k, island"""
  }
}
