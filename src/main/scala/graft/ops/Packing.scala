package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Context-length packing — group documents into fixed token-budget
  * packs (the pretraining batch-construction op: a 4k-context run
  * wants sequences packed near the budget, not one short doc per
  * sequence).
  *
  * Shape: greedy sequential packing by running token count. The naive
  * formulation is ONE global ordered cumsum — a single-partition
  * window, the exact trap [[BoundedDim]] guards against, unusable at
  * corpus scale. Instead docs hash into `buckets` independent streams
  * (deterministic `id % buckets`), each bucket packs in parallel under
  * a PARTITIONED window, and the pack key is (bucket, local pack).
  * Packing quality is unchanged — greedy fill within each stream —
  * and the plan carries `buckets`-way parallelism at any corpus size.
  *
  * Semantics (pinned in PackingSpec, mirrored by the SQL oracle):
  * a document never splits; a pack's fill may overflow `budget` only
  * by its final straddling document; docs larger than the budget get
  * a pack of their own. Assignment is pure arithmetic over the
  * exclusive running sum: pack = floor(prev_cum / budget).
  */
object Packing {

  def assignments(docs: DataFrame, idCol: String, tokens: Column,
                  budget: Long, buckets: Int): DataFrame = {
    require(budget > 0 && buckets > 0)
    val w = Window.partitionBy("pack_bucket").orderBy(col(idCol))
    docs
      .withColumn("_tok", tokens.cast("long"))
      .withColumn("pack_bucket", (col(idCol) % buckets).cast("int"))
      .withColumn("_cum", sum(col("_tok")).over(w))
      .withColumn("pack_id",
        floor((col("_cum") - col("_tok")).cast("double") / budget)
          .cast("long"))
      .drop("_cum")
      .withColumnRenamed("_tok", "pack_tokens_doc")
  }

  /** DuckDB mirror of the assignment arithmetic. */
  def assignmentsSql(table: String, idExpr: String, tokExpr: String,
                     budget: Long, buckets: Int): String =
    s"""
      SELECT *,
             CAST($idExpr % $buckets AS INT) AS pack_bucket,
             CAST(floor((SUM($tokExpr) OVER (
                     PARTITION BY $idExpr % $buckets ORDER BY $idExpr)
                   - $tokExpr) / $budget) AS BIGINT) AS pack_id,
             CAST($tokExpr AS BIGINT) AS pack_tokens_doc
      FROM $table"""
}
