package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Categorical distribution drift between two corpus slices (old
  * batch vs new batch, yesterday vs today, corpus vs eval) — the
  * monitoring gate that catches "the new crawl is 40% one domain" or
  * "the language mix shifted" before training does.
  *
  * The classic measures (PSI, chi-square) divide and take logs in
  * floating point — cross-engine log/div results differ in the last
  * ulp, which the repo's byte-exact oracle discipline forbids. This
  * op uses the deterministic core instead: per-category
  * MILLI-PROPORTIONS by integer division (exact in both engines),
  * their signed difference, and the squared-difference sum as the
  * drift statistic. Monotone in the same shifts chi-square flags;
  * reproducible everywhere.
  *
  * Scale shape: one groupBy Exchange per slice (map-side combined,
  * output = category cardinality — the monitoring dimensionality,
  * bounded and small); a join of the two category-sized aggregates
  * (full outer: a category absent from one side IS the drift
  * signal); totals via a broadcast one-row cross join, the repo's
  * standard pattern. Nothing here touches raw-row volume after the
  * first aggregation.
  */
object Drift {

  /** Per-category drift profile between slices `a` and `b` over
    * category column `of`: counts, milli-proportions, and the
    * squared milli-difference `d2`. Sum `d2` (or filter on it) for
    * the drift verdict; categories missing on one side appear with
    * count 0. Null categories are real categories (a null-rate shift
    * is drift) and are kept as the string "__null__". */
  def categoricalProfile(a: DataFrame, b: DataFrame,
                         of: String): DataFrame = {
    def side(df: DataFrame, cnt: String) =
      df.select(coalesce(col(of).cast("string"), lit("__null__"))
          .as("category"))
        .groupBy("category").agg(count(lit(1)).as(cnt))
    countedDrift(side(a, "cnt_a"), side(b, "cnt_b"))
  }

  /** Drift between two ALREADY-COUNTED (category, cnt) frames — the
    * stored-profile consumer: yesterday's persisted category counts
    * (or a [[Sketches.histogramProfile]]'s (bin, n) rows, bins being
    * categories) against today's, NO rescan of either corpus. Inputs:
    * `a` with columns (category, cnt_a), `b` with (category, cnt_b).
    * Same output contract as [[categoricalProfile]]. */
  def countedDrift(a: DataFrame, b: DataFrame): DataFrame = {
    val j = a.join(b, Seq("category"), "full_outer")
      .na.fill(0L, Seq("cnt_a", "cnt_b"))
    val tot = j.agg(sum(col("cnt_a")).as("_ta"),
      sum(col("cnt_b")).as("_tb"))
    j.crossJoin(broadcast(tot))
      .select(col("category"), col("cnt_a"), col("cnt_b"),
        expr("CAST(1000 * cnt_a DIV _ta AS BIGINT)").as("milli_a"),
        expr("CAST(1000 * cnt_b DIV _tb AS BIGINT)").as("milli_b"))
      .withColumn("d2",
        (col("milli_a") - col("milli_b")) *
          (col("milli_a") - col("milli_b")))
  }

  /** Associative merge of stored (category, cnt) profiles — the
    * maintenance half of the stored-profile story: count each
    * ingest batch once, append its profile, and fold profiles
    * instead of ever rescanning the corpus ([[countedDrift]] then
    * consumes the fold). Plain union + sum: exactly associative and
    * commutative (integer addition), so profiles can merge in any
    * order, any grouping, on any schedule — the same contract as
    * [[Sketches]] merges, but exact. Scale shape: inputs are
    * category-cardinality-sized; the merge never touches raw rows. */
  def mergeCounts(profiles: Seq[DataFrame]): DataFrame = {
    require(profiles.nonEmpty, "mergeCounts needs at least one profile")
    profiles.map(_.select(col("category"), col("cnt")))
      .reduce(_ unionByName _)
      .groupBy("category").agg(sum("cnt").as("cnt"))
  }

  /** DuckDB mirror of [[categoricalProfile]]. */
  def categoricalProfileSql(aSelect: String, bSelect: String,
                            ofExpr: String): String = s"""
    WITH ca AS (
      SELECT coalesce(CAST($ofExpr AS VARCHAR), '__null__') AS category,
             COUNT(*) AS cnt_a
      FROM ($aSelect) GROUP BY 1),
    cb AS (
      SELECT coalesce(CAST($ofExpr AS VARCHAR), '__null__') AS category,
             COUNT(*) AS cnt_b
      FROM ($bSelect) GROUP BY 1),
    j AS (
      SELECT coalesce(ca.category, cb.category) AS category,
             coalesce(cnt_a, 0) AS cnt_a, coalesce(cnt_b, 0) AS cnt_b
      FROM ca FULL OUTER JOIN cb USING (category)),
    t AS (SELECT SUM(cnt_a) AS ta, SUM(cnt_b) AS tb FROM j)
    SELECT j.category, CAST(j.cnt_a AS BIGINT) AS cnt_a,
           CAST(j.cnt_b AS BIGINT) AS cnt_b,
           CAST(1000 * j.cnt_a // t.ta AS BIGINT) AS milli_a,
           CAST(1000 * j.cnt_b // t.tb AS BIGINT) AS milli_b,
           CAST((1000 * j.cnt_a // t.ta - 1000 * j.cnt_b // t.tb)
             * (1000 * j.cnt_a // t.ta - 1000 * j.cnt_b // t.tb)
             AS BIGINT) AS d2
    FROM j CROSS JOIN t"""
}
