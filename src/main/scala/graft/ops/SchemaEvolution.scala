package graft.ops

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StructType

/** Schema-evolution reads over a parquet layer whose batches were
  * written under different schema versions — the lakehouse reality
  * that a long-lived table's early files lack columns added later.
  * Reference scope: the reference rebuilds layers wholesale on DDL
  * change; at 100 TB you cannot rewrite history for a column add, so
  * the read path must absorb it.
  *
  * Posture (the repo's explicit-schema rule, extended):
  *
  *  - Reads go through ONE caller-owned TARGET schema — never
  *    `mergeSchema=true`, whose effective schema depends on which
  *    files exist at plan time (a moving contract, and a full
  *    footer-scan at planning on wide layers). Parquet resolves
  *    columns BY NAME per file, so files predating a column yield
  *    null for it — exactly the semantics a backfill can own.
  *  - Missing-value policy is EXPLICIT: [[backfill]] applies declared
  *    defaults; rows backfilled are countable (audit surface), never
  *    silently defaulted at write time.
  *
  * Scale shape: free — by-name resolution and null-fill happen inside
  * the parquet reader per file; no extra pass, no shuffle, and column
  * pruning/pushdown still apply to the target columns. */
object SchemaEvolution {

  /** Read batch dirs under the explicit `target` schema: batches
    * written before a column existed surface it as null. Paths are
    * explicit (a manifest/ledger decision, the Ledger posture) rather
    * than partition-discovered — discovery would bolt inferred
    * partition columns onto the caller's schema contract. */
  def readWithTarget(spark: SparkSession, target: StructType,
                     paths: String*): DataFrame =
    spark.read.schema(target).parquet(paths: _*)

  /** Apply declared defaults to evolution nulls, tagging each row
    * with `_backfilled` (how many of the defaulted columns were
    * absent for this row) so the audit is one aggregate away. */
  def backfill(df: DataFrame, defaults: Map[String, Column]): DataFrame = {
    val tagged = defaults.foldLeft(df.withColumn("_backfilled", lit(0))) {
      case (d, (c, dflt)) =>
        d.withColumn("_backfilled",
            col("_backfilled") + when(col(c).isNull, 1).otherwise(0))
          .withColumn(c, coalesce(col(c), dflt))
    }
    tagged
  }
}
