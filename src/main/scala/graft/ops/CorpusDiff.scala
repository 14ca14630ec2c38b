package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Corpus snapshot diff — the dataset-versioning audit: given two
  * versions of a corpus keyed by document id, classify every id as
  * `added` / `removed` / `changed` / `unchanged` (content compared by
  * md5, so "changed" means the BYTES moved, not a re-run artifact).
  * This is the answer to "what exactly is different about v2 of the
  * training set?" — the release-notes primitive a data-governance
  * review wants next to the funnel's drop accounting.
  *
  * Scale shape: each side reduces to (id, fixed-width content hash)
  * in its scan projection — the full-outer join then shuffles hashes,
  * never document bodies; one keyed Exchange per side, fixed-width
  * rows. The per-status rollup reuses nothing heavier than a
  * status-cardinality aggregate.
  */
object CorpusDiff {

  /** Per-id diff rows: (id, status). Feed [[summarize]] for the
    * rollup, or join back to either side for release notes. */
  def diff(oldV: DataFrame, newV: DataFrame, idCol: String,
           contentCol: String): DataFrame = {
    def side(df: DataFrame, h: String) =
      df.select(col(idCol), md5(col(contentCol)).as(h))
    side(oldV, "_h_old")
      .join(side(newV, "_h_new"), Seq(idCol), "full_outer")
      .select(col(idCol),
        when(col("_h_old").isNull, lit("added"))
          .when(col("_h_new").isNull, lit("removed"))
          .when(col("_h_old") =!= col("_h_new"), lit("changed"))
          .otherwise(lit("unchanged")).as("status"))
  }

  /** Rollup: per status, row count and id sum (the membership
    * signature convention — equal counts with different members
    * cannot collide). */
  def summarize(d: DataFrame, idCol: String): DataFrame =
    d.groupBy("status")
      .agg(count(lit(1)).as("n"), sum(col(idCol)).as("id_sum"))

  /** Column-attributed diff — the CDC shape: per key, not just THAT a
    * row changed but WHICH columns did (`changed_cols` is the
    * comma-joined subset, in caller column order — deterministic).
    * Null-safe per-column compare (`<=>`-negation), so value→null and
    * null→value transitions attribute correctly; presence flags
    * rather than key-null checks decide added/removed, so an all-null
    * payload row still classifies by membership. Output is
    * violation-sized (unchanged rows never leave the join — the
    * FD-audit lesson).
    *
    * Scale shape: one full-outer keyed join over keys + compared
    * columns only (the scan prunes to exactly those), per-row string
    * assembly, no second pass.
    */
  def diffColumns(oldV: DataFrame, newV: DataFrame, keys: Seq[String],
                  cols: Seq[String]): DataFrame = {
    require(keys.nonEmpty && cols.nonEmpty,
      "diffColumns needs keys and compared columns")
    require(keys.intersect(cols).isEmpty,
      s"keys and cols overlap: ${keys.intersect(cols).mkString(", ")}")
    def side(df: DataFrame, p: String, flag: String) =
      df.select((keys ++ cols).map(c => col(c).as(s"$p$c")) :+
        lit(true).as(flag): _*)
    val o = side(oldV, "_o_", "_in_old")
    val n = side(newV, "_n_", "_in_new")
    val j = o.join(n,
      keys.map(k => col(s"_o_$k") === col(s"_n_$k")).reduce(_ && _),
      "full_outer")
    val changed = concat_ws(",",
      cols.map(c => when(!(col(s"_o_$c") <=> col(s"_n_$c")), lit(c))): _*)
    val status = when(col("_in_old").isNull, lit("added"))
      .when(col("_in_new").isNull, lit("removed"))
      .when(changed =!= "", lit("changed"))
      .otherwise(lit("unchanged"))
    j.select(
      keys.map(k => coalesce(col(s"_o_$k"), col(s"_n_$k")).as(k)) ++
        Seq(status.as("status"),
          when(status === "changed", changed)
            .otherwise(lit(null)).as("changed_cols")): _*)
      .filter(col("status") =!= "unchanged")
  }

  /** DuckDB mirror of diff + summarize over two SELECTs. */
  def summarizeSql(oldSelect: String, newSelect: String,
                   idExpr: String, contentExpr: String): String = s"""
    WITH o AS (SELECT $idExpr AS id, md5($contentExpr) AS h
               FROM ($oldSelect)),
    n AS (SELECT $idExpr AS id, md5($contentExpr) AS h
          FROM ($newSelect)),
    j AS (
      SELECT coalesce(o.id, n.id) AS id,
             CASE WHEN o.h IS NULL THEN 'added'
                  WHEN n.h IS NULL THEN 'removed'
                  WHEN o.h <> n.h THEN 'changed'
                  ELSE 'unchanged' END AS status
      FROM o FULL OUTER JOIN n ON o.id = n.id)
    SELECT status, COUNT(*) AS n,
           CAST(SUM(id) AS BIGINT) AS id_sum
    FROM j GROUP BY status"""
}
