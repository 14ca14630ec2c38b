package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Incrementally-maintained aggregate views over a [[TableStore]] —
  * the derived-table tick every downstream consumer of a 100 TB fact
  * wants: a materialized `GROUP BY` kept in lockstep with the source
  * by consuming its adds-only change feed, with per-tick work
  * proportional to the DELTA (plus the view, which is group-count
  * sized), never a full source recompute.
  *
  * Mechanics per [[tick]]:
  *  1. the view's consumed position is `TableStore.maxBatchId` of the
  *     view's OWN log — the Delta txn posture: position and result
  *     commit atomically, so a tick that crashed anywhere simply
  *     re-runs from the last position that actually landed;
  *  2. the delta is `TableStore.readChangesSince(src, position)` —
  *     compaction/OPTIMIZE commits contribute nothing, and a content
  *     REWRITE in the source (delete/restore/overwrite) fails the
  *     tick loudly with the resync remedy rather than silently
  *     serving a stale view (the feed's own contract);
  *  3. the delta's partial aggregate combines with the view rows by
  *     group (count and sums are commutative monoids) and the result
  *     OVERWRITES the view as one commit carrying the consumed
  *     source version as its batch id.
  *
  * Concurrent tickers are safe: the overwrite is snapshot-dependent,
  * so the loser surfaces as a loud ConcurrentModificationException
  * and its retry observes the winner's position. A tick with nothing
  * new returns None and commits nothing.
  *
  * Reference anchor: the gold-layer aggregate tables the reference
  * rebuilds per DAG run (dags/DataWarehouse.py gold queries) — here
  * they become incremental instead of full-rebuild.
  */
object DerivedView {

  /** One maintenance tick of a (groupCols, COUNT(*), SUM(sumCols...))
    * view at `viewRoot` over the store at `srcRoot`. Returns the
    * committed view version, or None when the view is already at the
    * source's head. View schema: groupCols ++ `n_rows` ++
    * `sum_<c>` per sum column — sums are LONG (declare integer
    * columns; exactness is the point of maintaining the view). */
  def tick(spark: SparkSession, srcRoot: String, viewRoot: String,
           groupCols: Seq[String], sumCols: Seq[String]): Option[Long] = {
    require(groupCols.nonEmpty, "a view needs at least one group column")
    val to = TableStore.versions(spark, srcRoot).lastOption
      .getOrElse(return None) // source never committed: nothing to do
    val from = TableStore.maxBatchId(spark, viewRoot).getOrElse(0L)
    if (to <= from) return None // already at the head
    val delta = TableStore.readChangesSince(spark, srcRoot, from, Some(to))
    val partial = delta.groupBy(groupCols.map(col): _*).agg(
      count(lit(1)).as("n_rows"),
      sumCols.map(c => sum(col(c)).as(s"sum_$c")): _*)
    val combined =
      if (TableStore.versions(spark, viewRoot).isEmpty) partial
      else TableStore.read(spark, viewRoot).unionByName(partial)
        .groupBy(groupCols.map(col): _*).agg(
          sum(col("n_rows")).as("n_rows"),
          sumCols.map(c => sum(col(s"sum_$c")).as(s"sum_$c")): _*)
    Some(TableStore.overwrite(combined, viewRoot, batchId = Some(to)))
  }
}
