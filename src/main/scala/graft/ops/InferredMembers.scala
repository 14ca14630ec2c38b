package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Late-arriving dimension handling ("inferred members"): facts whose
  * dimension key has no dim row yet must still load NOW — dropping
  * them under-counts the fact table, and holding them back couples
  * fact latency to dim latency. The standard warehouse answer is a
  * PLACEHOLDER dim row per unknown key (attributes defaulted, flagged
  * `is_inferred`), which a later dim batch corrects through the
  * existing partial-column upsert ([[Upsert.merge]] keeps unlisted
  * columns, so the correction clears the flag and fills attributes
  * without touching surrogate keys). Extends the reference's star
  * load, which inner-joins facts to dim_customer and silently drops
  * unmatched rows (create_load_data_gold.sql:122-140 — the J6 drop
  * documented in SURVEY §2.3).
  *
  * Scale shape: the unknown-key discovery is a fact-side DISTINCT on
  * the key followed by a left-anti against the dim — the dim side is
  * broadcast-sized in every star schema; the distinct is the same
  * map-side-combinable shuffle the join itself needs, so inferring
  * members adds no new exchange class. The fact join afterwards is
  * inner-complete by construction.
  */
object InferredMembers {

  /** Dim frame completed with placeholder rows for every key present
    * in `facts` but absent from `dim`: placeholders carry the key,
    * `defaults` for the listed attribute columns, null for the rest,
    * and `is_inferred = 1` (existing rows get 0). */
  def completeDim(dim: DataFrame, facts: DataFrame, key: String,
                  defaults: Map[String, Column]): DataFrame = {
    val missing = facts.select(col(key)).distinct()
      .join(dim.select(col(key)), Seq(key), "left_anti")
    val placeholder = dim.columns.filterNot(_ == key).foldLeft(missing) {
      case (d, c) => d.withColumn(c,
        defaults.getOrElse(c, lit(null)).cast(
          dim.schema(c).dataType))
    }
    dim.withColumn("is_inferred", lit(0))
      .unionByName(placeholder.withColumn("is_inferred", lit(1)))
  }
}
