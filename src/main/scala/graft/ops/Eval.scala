package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Offline score-evaluation metrics — the model/heuristic validation
  * leg of the quality-scoring family: does a score (a quality
  * heuristic, a classifier probability, a retrieval score) actually
  * separate and calibrate against outcomes, measured per group so
  * drift across segments is visible. Reference scope: the reference's
  * ML DAG evaluates sklearn-side; here the metrics are engine
  * operators so they run where the data is.
  *
  * Arithmetic contract: AUC is the Mann–Whitney rank-sum statistic
  * with EXACT tie handling in integers — `2·midrank` of a score value
  * is `2·cnt_less + cnt_eq + 1` (always an integer), so
  *
  *   `auc_milli = (1000 · (Σ_pos 2·midrank − nPos·(nPos+1)))
  *                 div (2 · nPos · nNeg)`
  *
  * is exact integer division — no float rank averaging, no libm. The
  * identity ties it to the oracle's independent formulation
  * (ascending RANK r1 + descending RANK r2: `2·mid = r1 + n − r2 + 1`).
  * BIGINT bounds: Σ 2·midrank < 2n² per group — safe through ~6·10⁷
  * rows per group; beyond that widen to DECIMAL(38) (the
  * [[Skew.joinForecast]] posture).
  *
  * Scale shape: the engine NEVER windows over raw rows. Scores are
  * first aggregated per (group, score) — one map-side-combinable
  * exchange whose width is the distinct-score cardinality — and the
  * rank prefix-sum runs over that compressed frame partitioned by
  * group. Groups with a missing class are dropped in both engines
  * (AUC is undefined there; emitting a sentinel would poison the
  * downstream average).
  */
object Eval {

  /** Per-group ROC AUC (milli) of `score` predicting boolean `label`:
    * (group, n_pos, n_neg, auc_milli), groups with both classes only,
    * ordered by group. */
  def groupedAuc(df: DataFrame, group: Column, score: Column,
                 label: Column): DataFrame = {
    val perScore = df
      .select(group.as("grp"), score.as("_s"),
        label.cast("boolean").as("_y"))
      .groupBy("grp", "_s")
      .agg(count(lit(1)).cast("long").as("_n"),
        count(when(col("_y"), 1)).cast("long").as("_np"))
    val w = Window.partitionBy(col("grp")).orderBy(col("_s"))
      .rowsBetween(Window.unboundedPreceding, -1)
    perScore
      .withColumn("_less", coalesce(sum(col("_n")).over(w), lit(0L)))
      .groupBy(col("grp"))
      .agg(
        sum(col("_np") * (lit(2L) * col("_less") + col("_n") + lit(1L)))
          .cast("long").as("_s2"),
        sum(col("_np")).cast("long").as("n_pos"),
        sum(col("_n")).cast("long").as("_nt"))
      .withColumn("n_neg", (col("_nt") - col("n_pos")).cast("long"))
      .filter(col("n_pos") > 0 && col("n_neg") > 0)
      .withColumn("auc_milli", expr(
        "(1000 * (_s2 - n_pos * (n_pos + 1))) div (2 * n_pos * n_neg)"))
      .select(col("grp"), col("n_pos"), col("n_neg"), col("auc_milli"))
      .orderBy("grp")
  }

  /** DuckDB mirror of [[groupedAuc]] over events (score = value,
    * label = event_type match, group = event day) — formulated with
    * the two-RANK identity over raw rows, vs the engine's
    * distinct-score prefix sums. */
  def groupedAucSql(labelType: String): String =
    s"""
      WITH r AS (
        SELECT CAST(ts AS DATE) AS grp,
               event_type = '$labelType' AS y,
               RANK() OVER (PARTITION BY CAST(ts AS DATE)
                 ORDER BY value) AS r1,
               RANK() OVER (PARTITION BY CAST(ts AS DATE)
                 ORDER BY value DESC) AS r2,
               COUNT(*) OVER (PARTITION BY CAST(ts AS DATE)) AS n
        FROM events),
      agg AS (
        SELECT grp,
               CAST(SUM(CASE WHEN y THEN r1 + n - r2 + 1 END) AS BIGINT)
                 AS s2,
               CAST(COUNT(CASE WHEN y THEN 1 END) AS BIGINT) AS np,
               CAST(COUNT(*) AS BIGINT) AS n
        FROM r GROUP BY grp)
      SELECT grp, np AS n_pos, n - np AS n_neg,
             (1000 * (s2 - np * (np + 1))) // (2 * np * (n - np))
               AS auc_milli
      FROM agg WHERE np > 0 AND n - np > 0
      ORDER BY grp
    """

  /** Calibration / reliability table: fixed-width score bins with
    * per-bin observed positive rate (milli). `binWidth` in score
    * units; bins clamped to [0, nBins-1] (underflow and overflow
    * buckets — negative scores land in bin 0, not a negative id). One
    * map-side-combinable aggregate; bin boundaries are IEEE-exact
    * cross-engine (double divide + floor, the perMille rule). */
  def calibrationBins(df: DataFrame, score: Column, label: Column,
                      binWidth: Double, nBins: Int): DataFrame =
    df.select(
      least(lit(nBins - 1), greatest(lit(0),
        floor(score.cast("double") / binWidth))).cast("int").as("bin"),
      label.cast("boolean").as("_y"))
      .groupBy("bin")
      .agg(count(lit(1)).cast("long").as("n"),
        count(when(col("_y"), 1)).cast("long").as("n_pos"))
      .withColumn("pos_milli", expr("(1000 * n_pos) div n"))
      .orderBy("bin")

  /** DuckDB mirror of [[calibrationBins]] over events. */
  def calibrationBinsSql(labelType: String, binWidth: Double,
                         nBins: Int): String =
    s"""
      SELECT CAST(LEAST(${nBins - 1},
                         GREATEST(0, FLOOR(value / $binWidth))) AS INT)
               AS bin,
             CAST(COUNT(*) AS BIGINT) AS n,
             CAST(COUNT(CASE WHEN event_type = '$labelType' THEN 1 END)
               AS BIGINT) AS n_pos,
             (1000 * CAST(COUNT(CASE WHEN event_type = '$labelType'
                THEN 1 END) AS BIGINT)) // COUNT(*) AS pos_milli
      FROM events
      GROUP BY 1 ORDER BY 1
    """
}
