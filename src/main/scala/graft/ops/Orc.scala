package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StructType

/** ORC interchange — columnar sibling of the [[JsonlExport]] /
  * [[JsonlIngest]] pair, for pipelines whose neighbors speak ORC
  * (Hive-era warehouses, Trino fleets) rather than JSONL or parquet.
  *
  * Same sink discipline as JSONL: ONE hash repartition to a bounded
  * writer count (never `coalesce(1)` — a single writer serializes the
  * corpus through one task; never a global sort — a range Exchange
  * buys a columnar consumer nothing), in-partition sort on the shard
  * key so re-exports are content-deterministic.
  *
  * Same source discipline as [[JsonlIngest]]: an EXPLICIT schema,
  * never inference — schema-on-read drift is how a second full pass
  * sneaks into an ingest, and how a column silently changes type
  * between batches. Spark's ORC reader pushes predicates and prunes
  * columns like the parquet one (plan-asserted in OrcSpec), so a
  * filtered probe over an ORC landing zone scans footers, not data.
  */
object Orc {

  /** Write `df` as `shards` ORC files under `path` (overwrite),
    * rows routed and ordered by `shardBy`. */
  def write(df: DataFrame, path: String, shards: Int,
            shardBy: String): Unit = {
    require(shards > 0, s"shards must be positive: $shards")
    df.repartition(shards, col(shardBy))
      .sortWithinPartitions(shardBy)
      .write.mode("overwrite").orc(path)
  }

  /** Read ORC under `path` with the explicit `schema`. */
  def read(s: SparkSession, path: String, schema: StructType): DataFrame =
    s.read.schema(schema).orc(path)
}
