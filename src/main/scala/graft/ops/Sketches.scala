package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Mergeable cardinality sketches for monitoring at 100 TB — the
  * exact `COUNT(DISTINCT)` family (A5, the layer-consistency checks)
  * stops being runnable as one query when the key set itself is
  * billions: exact distinct shuffles every distinct value. The
  * HLL sketch (Spark ships the Apache DataSketches HllSketch binary
  * under `hll_sketch_agg`/`hll_union_agg`) replaces that with a
  * fixed-size state per group that is:
  *
  *  - **mergeable**: sketch(slice A) ∪ sketch(slice B) ≡ sketch(A∪B)
  *    — so per-partition / per-day / per-file sketches can be stored
  *    as small binary columns and rolled up later without rescanning
  *    (the monitoring pattern: every ingest batch persists its
  *    profile, the dashboard unions months of them in milliseconds);
  *  - **bounded-error**: relative standard error ≈ 1.04/√(2^lgK)
  *    (~1.6 % at the default lgK=12), enforced against exact counts
  *    in SketchSpec and in the oracle-gated q_sketch_distinct.
  *
  * Caveat that shapes the verification contract: the estimate is NOT
  * bit-stable across partitionings — DataSketches' sparse→HLL mode
  * promotion depends on the order values arrive, so repartitioning
  * or merging slices shifts the estimate a few counts (inside the
  * error bound; measured ±0.6 % in SketchSpec). That is why the
  * oracle gate compares an error VERDICT against the exact count,
  * never the raw estimate.
  */
object Sketches {

  val DefaultLgK = 12

  /** Per-group HLL sketches of `of` as a binary column `sketch` —
    * the storable/mergeable profile artifact. */
  def hllProfile(df: DataFrame, groupCols: Seq[String], of: String,
                 lgK: Int = DefaultLgK): DataFrame =
    df.groupBy(groupCols.map(col): _*)
      .agg(hll_sketch_agg(col(of), lit(lgK)).as("sketch"))

  /** Roll up stored profiles (same group columns, same lgK family)
    * into one sketch per group — no raw-data rescan. */
  def mergeProfiles(profiles: DataFrame,
                    groupCols: Seq[String]): DataFrame =
    profiles.groupBy(groupCols.map(col): _*)
      .agg(hll_union_agg(col("sketch")).as("sketch"))

  /** Distinct-count estimate from a sketch column. */
  def estimate(sketch: Column): Column = hll_sketch_estimate(sketch)
}
