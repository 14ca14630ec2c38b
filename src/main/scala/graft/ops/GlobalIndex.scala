package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Scalable global row numbering — `row_number() OVER (ORDER BY k)`
  * without the single-partition sort that makes the naive window a
  * scale-killer (BoundedDim.scala guards surrogate keys against
  * exactly that plan; this is the unbounded-cardinality complement).
  *
  * Strategy: deterministic value-range bucketing + per-bucket offsets.
  *  1. min/max of the key (one scalar aggregate, broadcast back);
  *  2. bucket = floor((k - min) * B / (max - min + 1)) — a PURE
  *     function of the value, monotone in k, so bucket order IS key
  *     order. Unlike repartitionByRange's sampled boundaries this is
  *     replay-stable: re-evaluating the frame in the counts branch
  *     and the rows branch cannot disagree on a row's bucket, so no
  *     cache/checkpoint is needed for correctness;
  *  3. per-bucket counts -> exclusive prefix sum over <= B rows (the
  *     only single-partition window, bounded by the bucket count,
  *     like the driver-bounded collects audited in BASELINE.md);
  *  4. global_idx = bucket_offset + row_number within bucket.
  *
  * The big data moves through exactly one hash Exchange (the
  * per-bucket window); the counts branch prunes to the key column
  * before its partial aggregate. Skewed VALUE ranges put more rows in
  * one bucket — the in-bucket sort stays external-sort-safe, and
  * Skew.keyProfile is the diagnostic for choosing a better B or a
  * pre-transform. Requires a UNIQUE numeric key: ties under
  * row_number are nondeterministic, and an index is only meaningful
  * over a total order.
  */
object GlobalIndex {

  def withGlobalIndex(df: DataFrame, key: String, idxCol: String,
                      buckets: Int = 64): DataFrame = {
    require(buckets >= 1 && buckets <= (1 << 20),
      s"buckets out of range: $buckets")
    // DECIMAL(38,0) + `div`, not long `*`/double `/`: long
    // (k−mn)·buckets overflows once the key range exceeds 2^63/B —
    // KernelPropertySpec caught exactly that on a ±Long.MaxValue/4
    // span (the smallest key landed in a wrapped-negative bucket) —
    // and Divide's double rounding could break the bucket-order ==
    // key-order invariant the offsets depend on. Decimal is exact at
    // any long range, IntegralDivide truncates exactly.
    val k = col(key).cast("decimal(38,0)")
    val mm = df.agg(min(k).as("_mn"), max(k).as("_mx"))
    val b = df.crossJoin(broadcast(mm))
      .withColumn("_num", (k - col("_mn")) * lit(buckets))
      .withColumn("_den", col("_mx") - col("_mn") + lit(1))
      .withColumn("_bkt", expr("cast(_num div _den as int)"))
      .drop("_mn", "_mx", "_num", "_den")
    val offs = b.groupBy("_bkt").agg(count(lit(1)).as("_cnt"))
      .withColumn("_off",
        coalesce(
          sum(col("_cnt")).over(
            Window.orderBy("_bkt")
              .rowsBetween(Window.unboundedPreceding, -1)),
          lit(0L)))
      .select("_bkt", "_off")
    b.join(broadcast(offs), Seq("_bkt"))
      .withColumn(idxCol,
        col("_off") + row_number().over(
          Window.partitionBy("_bkt").orderBy(col(key))))
      .drop("_bkt", "_off")
  }
}
