package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Golden-record construction — the step AFTER dedup finds clusters:
  * collapse each cluster of duplicate records into ONE surviving row
  * by per-field survivorship, the standard MDM/entity-resolution
  * merge (customer records from three feeds: take the newest non-null
  * value of each field independently, so a stale row's good fields
  * still survive a newer row's nulls).
  *
  * Policy: per field, the value from the highest-`priority` row WHERE
  * THAT FIELD IS NON-NULL (latest-non-null). A field null in every
  * member stays null. Priorities must order rows within a cluster
  * deterministically (make them unique — e.g. updated_at micros with
  * an id tie-break folded in); survivorship is then retry-stable and
  * partitioning-invariant like everything else here.
  *
  * Scale shape: ONE map-side-combinable aggregate on the cluster key
  * — `max_by(field, priority-if-non-null)` per field, no window, no
  * sort, no join back. Contrast with the latest-ROW pick
  * (latest-per-key, W2): that keeps one whole row; this merges
  * fields ACROSS rows, which no single-row pick can express. */
object Survivorship {

  /** One surviving row per cluster: `cluster` key column plus each of
    * `fields` resolved latest-non-null by `priority`. max_by skips
    * rows whose ordering value is null, so masking the priority on
    * null fields implements "non-null wins regardless of recency";
    * the all-null cluster yields null. */
  def goldenRecord(df: DataFrame, cluster: Column, priority: Column,
                   fields: Seq[String]): DataFrame = {
    require(fields.nonEmpty, "goldenRecord needs at least one field")
    df.groupBy(cluster.as("cluster_key"))
      .agg(
        max_by(col(fields.head), when(col(fields.head).isNotNull, priority))
          .as(fields.head),
        fields.tail.map(f =>
          max_by(col(f), when(col(f).isNotNull, priority)).as(f)): _*)
  }

  /** DuckDB mirror of one field's survivorship (arg_max skips NULL
    * ordering values the same way once the FILTER masks them). */
  def goldenFieldSql(fieldExpr: String, priorityExpr: String): String =
    s"arg_max($fieldExpr, CASE WHEN $fieldExpr IS NOT NULL " +
      s"THEN $priorityExpr END)"
}
