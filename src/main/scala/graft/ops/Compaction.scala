package graft.ops

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.SparkSession

/** Small-file compaction for append-accumulating parquet layers.
  *
  * Every incremental protocol in this engine (ledger appends, upsert
  * overwrites, streaming sinks) produces files sized by the BATCH, not
  * by what a scan wants: a year of small batches leaves thousands of
  * KB-files whose open/footer overhead dominates the read path, and at
  * 100 TB the driver-side listing alone becomes the bottleneck.
  * Compaction rewrites a layer to ~`targetBytes` files:
  *
  *  - the output file count comes from the FS-reported layer size
  *    (metadata only, no scan) — `ceil(bytes / targetBytes)`;
  *  - `repartition(n)` (round-robin) balances rows evenly across
  *    output files regardless of input skew;
  *  - the rewrite publishes via [[Upsert.atomicOverwrite]], so readers
  *    never observe a half-compacted layer and a crash leaves the old
  *    layer intact — compaction is always safe to re-run.
  *
  * Returns the output file count, or 0 when the layer is below
  * `minBytes` (compacting a near-empty layer is pure churn). */
object Compaction {

  def compact(spark: SparkSession, path: String, targetBytes: Long,
              minBytes: Long = 0L): Int = {
    require(targetBytes > 0, s"targetBytes must be positive: $targetBytes")
    val p = new Path(path)
    // resolve the FS from the path, not the default scheme — a layer
    // on s3a:// etc. must not hit the local default FS
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(p)) return 0
    val bytes = fs.getContentSummary(p).getLength
    if (bytes < minBytes || bytes == 0) return 0
    val n = math.max(1L, (bytes + targetBytes - 1) / targetBytes).toInt
    Upsert.atomicOverwrite(spark.read.parquet(path).repartition(n), path)
    n
  }
}
