package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Robust (median / MAD) distribution profiling — the outlier gate a
  * training-data pipeline wants where mean/stddev checks break: one
  * corrupt feed of 1e9-valued prices moves a mean arbitrarily but
  * moves the median not at all, so "|x − median| > k · MAD" keeps
  * flagging exactly the bad rows while the z-score equivalent flags
  * nothing (the outliers inflated the stddev themselves).
  *
  * Determinism discipline: the median here is DISCRETE — the value at
  * rank ceil(n/2) under an explicit (value, tieBreak) total order —
  * never an interpolated midpoint. An interpolated median is one
  * float add+divide computed by two engines in possibly different
  * association order; the discrete median is a VALUE THAT EXISTS IN
  * THE DATA, so the cross-engine comparison is byte-exact, and the
  * MAD (discrete median of |x − med|) stays exact because IEEE
  * subtraction of identical inputs is identical everywhere.
  *
  * Scale shape: ONE Exchange on the group columns; the two rank
  * passes (by value, then by deviation) and the final aggregate are
  * in-partition sorts/windows over the same partitioning — asserted
  * in RobustSpec. Group count is the monitoring dimensionality
  * (priorities, domains, days) — per-group row counts can be huge,
  * group counts are not; a single group bounded by one partition's
  * memory is the same contract every sort-based window op carries.
  * For quantiles over UNGROUPED billions use the mergeable
  * [[Sketches.histogramProfile]] family instead — this op is the
  * exact-arithmetic contract.
  */
object Robust {

  /** ceil(n/2) rank — the discrete median position. */
  private def medRank: Column = expr("(_cnt + 1) DIV 2")

  /** Per-group robust profile: n, discrete median `med`, discrete
    * MAD `mad`, and `n_outliers` = rows with |x − med| > k · mad.
    * `tieBreak` must totally order rows within a group (a key
    * column) so both rank passes are deterministic. */
  def outlierProfile(df: DataFrame, groupCols: Seq[String], of: String,
                     tieBreak: String, k: Int): DataFrame = {
    require(groupCols.nonEmpty, "outlierProfile needs group columns")
    require(k > 0, s"k must be positive: $k")
    val g = groupCols.map(col)
    val part = Window.partitionBy(g: _*)
    val byVal = part.orderBy(col(of), col(tieBreak))
    val withMed = df
      .withColumn("_rn", row_number().over(byVal))
      .withColumn("_cnt", count(lit(1)).over(part))
      .withColumn("_med",
        max(when(col("_rn") === medRank, col(of))).over(part))
      .withColumn("_dev", abs(col(of) - col("_med")))
    val byDev = part.orderBy(col("_dev"), col(tieBreak))
    withMed
      .withColumn("_rn2", row_number().over(byDev))
      .withColumn("_mad",
        max(when(col("_rn2") === medRank, col("_dev"))).over(part))
      .groupBy(g: _*)
      .agg(count(lit(1)).as("n"),
        max(col("_med")).as("med"),
        max(col("_mad")).as("mad"),
        count(when(col("_dev") > col("_mad") * k, 1)).as("n_outliers"))
  }

  /** Per-row winsorization: clamp `of` into the per-group robust band
    * `[med − k·mad, med + k·mad]` as new column `as`, keeping every
    * row — the feature-preprocessing companion to [[outlierProfile]]
    * (profile tells you HOW MANY rows are wild; winsorize caps them
    * so a downstream sum/mean/model isn't dragged by one corrupt
    * feed). Same determinism contract: med/mad are discrete rank
    * values, the band edges are single IEEE ops on them, and the
    * clamp either returns the original value or an edge — so results
    * compare byte-exactly cross-engine. Same scale shape: the two
    * rank passes and the clamp share ONE hash Exchange on the group
    * key (plan-asserted in RobustSpec); no join back. */
  def winsorize(df: DataFrame, groupCols: Seq[String], of: String,
                tieBreak: String, k: Int, as: String): DataFrame = {
    require(groupCols.nonEmpty, "winsorize needs group columns")
    require(k > 0, s"k must be positive: $k")
    val g = groupCols.map(col)
    val part = Window.partitionBy(g: _*)
    val byVal = part.orderBy(col(of), col(tieBreak))
    val withMed = df
      .withColumn("_rn", row_number().over(byVal))
      .withColumn("_cnt", count(lit(1)).over(part))
      .withColumn("_med",
        max(when(col("_rn") === medRank, col(of))).over(part))
      .withColumn("_dev", abs(col(of) - col("_med")))
    val byDev = part.orderBy(col("_dev"), col(tieBreak))
    withMed
      .withColumn("_rn2", row_number().over(byDev))
      .withColumn("_mad",
        max(when(col("_rn2") === medRank, col("_dev"))).over(part))
      .withColumn(as, least(
        greatest(col(of), col("_med") - col("_mad") * k),
        col("_med") + col("_mad") * k))
      .drop("_rn", "_cnt", "_med", "_dev", "_rn2", "_mad")
  }

  /** DuckDB mirror of [[winsorize]]'s band arithmetic: the shared CTE
    * chain, then the clamp per row. Emits columns: every expr in
    * `keepExprs` (qualified against the chain's row alias) plus the
    * clamped value as `$as`. */
  def winsorizeSql(table: String, groupExpr: String, ofExpr: String,
                   tieBreakExpr: String, k: Int,
                   keepSelect: String, as: String): String = s"""
    WITH r1 AS (
      SELECT *, $groupExpr AS g, $ofExpr AS x, $tieBreakExpr AS tb,
             ROW_NUMBER() OVER (PARTITION BY $groupExpr
               ORDER BY $ofExpr, $tieBreakExpr) AS rn,
             COUNT(*) OVER (PARTITION BY $groupExpr) AS cnt
      FROM $table),
    m AS (
      SELECT *, MAX(CASE WHEN rn = (cnt + 1) // 2 THEN x END)
                  OVER (PARTITION BY g) AS med
      FROM r1),
    dv AS (SELECT *, abs(x - med) AS dev FROM m),
    r2 AS (
      SELECT *, ROW_NUMBER() OVER (PARTITION BY g
                  ORDER BY dev, tb) AS rn2
      FROM dv),
    mm AS (
      SELECT *, MAX(CASE WHEN rn2 = (cnt + 1) // 2 THEN dev END)
                  OVER (PARTITION BY g) AS mad
      FROM r2)
    SELECT $keepSelect,
           least(greatest(x, med - mad * $k), med + mad * $k) AS $as
    FROM mm"""

  /** DuckDB mirror of [[outlierProfile]] — same discrete ranks, same
    * arithmetic; emits a full SELECT over `table` grouped by
    * `groupExpr`, aliasing the group as `groupAs`. */
  def outlierProfileSql(table: String, groupExpr: String, groupAs: String,
                        ofExpr: String, tieBreakExpr: String,
                        k: Int): String = s"""
    WITH r1 AS (
      SELECT $groupExpr AS g, $ofExpr AS x, $tieBreakExpr AS tb,
             ROW_NUMBER() OVER (PARTITION BY $groupExpr
               ORDER BY $ofExpr, $tieBreakExpr) AS rn,
             COUNT(*) OVER (PARTITION BY $groupExpr) AS cnt
      FROM $table),
    m AS (
      SELECT *, MAX(CASE WHEN rn = (cnt + 1) // 2 THEN x END)
                  OVER (PARTITION BY g) AS med
      FROM r1),
    dv AS (SELECT *, abs(x - med) AS dev FROM m),
    r2 AS (
      SELECT *, ROW_NUMBER() OVER (PARTITION BY g
                  ORDER BY dev, tb) AS rn2
      FROM dv),
    mm AS (
      SELECT *, MAX(CASE WHEN rn2 = (cnt + 1) // 2 THEN dev END)
                  OVER (PARTITION BY g) AS mad
      FROM r2)
    SELECT g AS $groupAs, CAST(COUNT(*) AS BIGINT) AS n,
           MAX(med) AS med, MAX(mad) AS mad,
           CAST(COUNT(CASE WHEN dev > mad * $k THEN 1 END) AS BIGINT)
             AS n_outliers
    FROM mm GROUP BY g"""

  /** EXACT global top-fraction selection WITHOUT a global sort — the
    * quality-gate shape ("keep the best 10% of the corpus by score")
    * at 100 TB, where `orderBy(score).limit(k)` is a per-partition
    * heap of k elements (k = billions for a corpus-sized fraction)
    * and a global range sort shuffles everything.
    *
    * Histogram refinement instead: one counting pass bins the scores
    * ([[Sketches.histogramProfile]] shape); the bin histogram is
    * bounded driver metadata (the IVF-codebook posture), so the
    * driver walks it top-down to find the BOUNDARY bin — every row
    * above it is in by count alone, and only the boundary bin itself
    * needs exact ordering, via TakeOrderedAndProject bounded by
    * `need <= that bin's population`. Total cost: two scans + a heap
    * over one bin, zero global sorts, zero corpus-wide shuffles.
    *
    * Selection is the exact top `ceil(n * keepMille / 1000)` rows
    * under (`of` DESC, `tieBreak` ASC) — the same set any rank-based
    * definition yields (bins partition the order, so binning cannot
    * change membership), which is what the oracle checks with an
    * independent full-rank formulation. Null scores never select.
    * Choose `binWidth` so a single bin stays heap-friendly; a
    * degenerate all-one-value bin still resolves exactly through the
    * tieBreak heap.
    *
    * The driver-side histogram budget is EXECUTABLE, not advisory
    * (the BoundedDim posture): before collecting, the score range is
    * measured and `range / binWidth` must stay under [[MaxBins]] —
    * one pathological outlier (a 1e18 score over binWidth 0.1) would
    * otherwise silently make the "bounded driver metadata" collect
    * data-sized. The loud error names the remedy: clamp or winsorize
    * the score first ([[outlierProfile]] finds the offenders), or
    * widen binWidth. */
  val MaxBins = 4_000_000L // ~64 MB of (bin, count) driver rows

  def topFraction(df: DataFrame, of: String, tieBreak: String,
                  keepMille: Int, binWidth: Double): DataFrame = {
    require(keepMille > 0 && keepMille <= 1000,
      s"keepMille must be in (0, 1000]: $keepMille")
    require(binWidth > 0, s"binWidth must be positive: $binWidth")
    val scored = df.filter(col(of).isNotNull)
    val binCol = floor(col(of) / binWidth).cast("long")
    // one cheap map-side-combinable pre-scan makes the budget check
    // run BEFORE any driver collect can blow up
    val bounds = scored
      .agg(min(binCol).as("lo"), max(binCol).as("hi")).collect()(0)
    if (!bounds.isNullAt(0)) {
      val binSpan = bounds.getLong(1) - bounds.getLong(0) + 1
      require(binSpan <= MaxBins,
        s"topFraction histogram would span $binSpan bins " +
          s"(score range [${bounds.getLong(0) * binWidth}, " +
          s"${(bounds.getLong(1) + 1) * binWidth}) / binWidth=" +
          s"$binWidth) > $MaxBins — the driver histogram is only " +
          "bounded if the range is: winsorize/clamp the score " +
          "column first or widen binWidth")
    }
    val hist = scored.groupBy(binCol.as("bin"))
      .agg(count(lit(1)).as("n"))
      .collect().map(r => r.getLong(0) -> r.getLong(1))
      .sortBy(-_._1) // highest bin first
    val n = hist.map(_._2).sum
    if (n == 0) return scored
    val k = (n * keepMille + 999) / 1000
    // walk bins top-down: everything above the boundary bin is in
    var above = 0L
    var i = 0
    while (i < hist.length && above + hist(i)._2 < k) {
      above += hist(i)._2; i += 1
    }
    val boundaryBin = hist(i)._1
    // a boundary bin needing more than Int.MaxValue rows would
    // silently truncate through limit(); that means the binning is
    // far too coarse for the data — fail with the remedy
    require(k - above <= Int.MaxValue,
      s"boundary bin needs ${k - above} rows (> Int.MaxValue); " +
        s"narrow binWidth=$binWidth so bins stay heap-sized")
    val need = (k - above).toInt
    val wholeBins = scored.filter(binCol > boundaryBin)
    val boundary = scored.filter(binCol === boundaryBin)
      .orderBy(col(of).desc, col(tieBreak).asc)
      .limit(need)
    wholeBins.unionByName(boundary)
  }

  /** Equal-frequency (quantile) discretization per group: `nBins`
    * ntile buckets under the explicit (value, tieBreak) total order —
    * the standard feature-binning prep (decile features, rank
    * normalization) with the same determinism discipline as the
    * median above: ntile over a TOTAL order is pure integer rank
    * arithmetic, identical in both engines, no interpolated
    * boundaries. Scale shape: one Exchange on the group + an
    * in-partition sort — per-GROUP binning by design; for ungrouped
    * global binning at corpus scale use [[Sketches]] histogram
    * thresholds instead (a global ntile would single-partition the
    * sort). */
  def equalFrequencyBins(df: DataFrame, groupCols: Seq[String],
                         of: String, tieBreak: String,
                         nBins: Int): DataFrame = {
    require(nBins > 0, s"nBins must be positive: $nBins")
    require(groupCols.nonEmpty,
      "per-group binning needs group columns (global ntile would " +
        "single-partition the sort; use histogram thresholds instead)")
    val w = Window.partitionBy(groupCols.map(col): _*)
      .orderBy(col(of).asc, col(tieBreak).asc)
    df.withColumn("bin", ntile(nBins).over(w))
  }

  /** Per-group exact WEIGHTED median (lower): the smallest value v
    * with `2·cumweight(v) ≥ totalweight` under integer weights — the
    * importance-weighted corpus statistic (median doc length weighted
    * by sampling weight, median score weighted by token count) that
    * the unweighted median misreports whenever weights correlate with
    * the value.
    *
    * Scale shape: the row stream is FIRST compressed to per-(group,
    * value) weight sums — one map-side-combinable exchange at
    * distinct-value width — and the cumulative-weight window runs
    * over that compressed frame (the groupedAuc posture: never a
    * window over raw rows). All-integer compare (2·cum vs W), exact
    * cross-engine. Weights must be non-negative; zero-weight values
    * never become the median unless the whole group is zero-weight
    * (then the smallest value wins — both engines alike, since
    * 2·0 ≥ 0 already holds at the first row). */
  def weightedMedian(df: DataFrame, groupCols: Seq[String], of: String,
                     weight: String): DataFrame = {
    require(groupCols.nonEmpty, "weightedMedian needs group columns")
    val g = groupCols.map(col)
    val perValue = df.groupBy((g :+ col(of)): _*)
      .agg(sum(col(weight).cast("long")).as("_w"))
    val part = Window.partitionBy(g: _*)
    val cum = part.orderBy(col(of))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    perValue
      .withColumn("_cum", sum(col("_w")).over(cum))
      .withColumn("_tot", sum(col("_w")).over(part))
      .filter(col("_cum") * 2 >= col("_tot"))
      .withColumn("_rn", row_number().over(part.orderBy(col(of))))
      .filter(col("_rn") === 1)
      .select((g :+ col(of).as("weighted_median") :+
        col("_tot").cast("long").as("total_weight")): _*)
  }
}
