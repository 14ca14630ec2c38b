package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Mergeable second-order sufficient statistics — the sketch-family
  * member for CONTINUOUS pairs: per group, the exact scaled sums
  * (n, Σx, Σy, Σx², Σy², Σxy) from which mean / variance /
  * covariance / correlation / regression slope all derive. Count each
  * batch once, fold profiles forever (exactly associative integer
  * sums — the HLL/CMS/histogram maintenance posture, here for
  * feature-correlation and drift monitoring instead of cardinality).
  *
  * Exactness discipline ([[Exact]]): x and y are fixed-point business
  * values with kx/ky decimal digits; each row contributes
  * `round(x·10^kx)` as int64 (IEEE-deterministic in both engines),
  * products stay inside int64 by the documented bounds, and the SUMS
  * — which do overflow int64 at corpus scale — accumulate in
  * DECIMAL(38,0) (Spark) / HUGEINT (DuckDB), both exact. Second
  * moments surface as STRINGS at the result edge: DuckDB's HUGEINT
  * materializes as float64 in comparison harnesses, and a 6e19 sum
  * does not survive a double round trip.
  *
  * The derived regression slope stays integer: sign factored out
  * before the division (Spark `div` truncates toward zero, DuckDB
  * `//` floors — they agree only on non-negatives), micro-scaled.
  *
  * Scale shape: ONE map-side-combinable aggregate per profile; merge
  * is a second aggregate over profile-sized (group-cardinality) rows.
  */
object SuffStats {

  private val D = DecimalType(38, 0)

  private def scaled(c: Column, k: Int): Column = {
    require(k >= 0 && k <= 6, s"fixed-point digits must be in [0,6]: $k")
    round(c * math.pow(10, k)).cast("long")
  }

  /** Per-group exact profile of the (x, y) pair. Internal columns
    * (n, sx, sy long; sxx, syy, sxy DECIMAL(38,0)) — feed to
    * [[merge]] / [[finalize]]. Rows with a null x or y are excluded
    * whole (a half-null row would desync Σx from Σxy). */
  def profile(df: DataFrame, keys: Seq[String], xCol: String,
              yCol: String, kx: Int, ky: Int): DataFrame = {
    require(keys.nonEmpty, "profile needs at least one key column")
    val xi = scaled(col(xCol), kx)
    val yi = scaled(col(yCol), ky)
    df.filter(col(xCol).isNotNull && col(yCol).isNotNull)
      .groupBy(keys.map(col): _*)
      .agg(count(lit(1)).as("n"),
        sum(xi).as("sx"), sum(yi).as("sy"),
        sum((xi * xi).cast(D)).as("sxx"),
        sum((yi * yi).cast(D)).as("syy"),
        sum((xi * yi).cast(D)).as("sxy"))
  }

  /** Fold stored profiles: exactly associative, any grouping of
    * batches yields the direct whole-data profile. */
  def merge(profiles: DataFrame, keys: Seq[String]): DataFrame =
    profiles.groupBy(keys.map(col): _*)
      .agg(sum("n").cast("long").as("n"),
        sum("sx").cast("long").as("sx"),
        sum("sy").cast("long").as("sy"),
        sum("sxx").cast(D).as("sxx"),
        sum("syy").cast(D).as("syy"),
        sum("sxy").cast(D).as("sxy"))

  /** Result-edge projection: moments as exact integer STRINGS plus
    * the derived y-on-x regression slope in micro units
    * (`10^6 · (nΣxy − ΣxΣy) / (nΣxx − Σx²)`, null for a constant x —
    * the slope of the SCALED series; rescale by 10^(kx−ky) downstream
    * if the raw-unit slope is wanted). */
  def finalize(profile: DataFrame, keys: Seq[String]): DataFrame =
    profile
      .withColumn("_num", col("n").cast(D) * col("sxy") -
        col("sx").cast(D) * col("sy").cast(D))
      .withColumn("_den", col("n").cast(D) * col("sxx") -
        col("sx").cast(D) * col("sx").cast(D))
      .select(keys.map(col) ++ Seq(col("n"), col("sx"), col("sy"),
        col("sxx").cast("string").as("sxx_s"),
        col("syy").cast("string").as("syy_s"),
        col("sxy").cast("string").as("sxy_s"),
        expr("""CASE WHEN _den = 0 THEN NULL
                ELSE CAST(sign(_num) AS BIGINT) *
                     CAST((abs(_num) * 1000000) div abs(_den) AS BIGINT)
                END""").as("slope_micro")): _*)
}
