package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** JSONL corpus EXPORT — the outbound half of the interchange
  * contract ([[JsonlIngest]] is inbound): one JSON object per line,
  * field order fixed by the DataFrame's column order, sharded into a
  * bounded file count so a downstream loader parallelizes over files
  * without a planner.
  *
  * Scale shape: ONE hash repartition to `shards` writer tasks —
  * never `coalesce(1)` (a single writer serializes the whole corpus
  * through one task) and never an `orderBy` (a global range sort
  * buys nothing a line-oriented consumer can use). In-partition sort
  * by the shard key keeps file contents deterministic for a given
  * input, so re-exports are byte-stable and diffable.
  *
  * Fidelity contract (oracle-gated in q_jsonl_export): what Spark's
  * JSON writer emits, an INDEPENDENT parser (DuckDB `read_json`)
  * must read back to the identical rows — escapes, unicode, nested
  * quotes all round-trip. Null fields are OMITTED from the object
  * (the JSONL convention: absent key ≡ null), which explicit-schema
  * readers on both engines surface as null again.
  */
object JsonlExport {

  /** Write every row of `df` as one JSON line under `path`
    * (overwrite), `shards` part files, rows routed and ordered by
    * `shardBy`. All of `df`'s columns become fields, in order. */
  def write(df: DataFrame, path: String, shards: Int,
            shardBy: String): Unit = {
    require(shards > 0, s"shards must be positive: $shards")
    df.repartition(shards, col(shardBy))
      .sortWithinPartitions(shardBy)
      .select(to_json(struct(df.columns.map(col): _*)).as("value"))
      .write.mode("overwrite").text(path)
  }
}
