package graft.queries

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType
import graft.Tables
import graft.ops.Partitioned

/** Run-date partition pruning — SURVEY.md §2.2 P10.
  *
  * The reference fact queries filter `WHERE f.run_date = %(run_date)s`
  * (dags/ml_churn_pipeline.py:153). Here the fact is WRITTEN
  * partitioned by run month and the slice read prunes at planning time
  * (PartitionFilters — asserted structurally in PruningSpec; this
  * query verifies the VALUES that flow through the pruned scan).
  */
object PartitionQueries extends QueryPack {

  private def fixturePath(d: String): String =
    s"/tmp/graft_fixtures/fact_part_${new java.io.File(d).getName}/fact"

  /** Schema version of the fixture projection — bump when the fact
    * columns below change so stale fixtures rebuild. */
  private val FixtureVersion = 2

  /** Idempotent fixture ensure: write the run-month-partitioned fact
    * once per sf dir, skip when the completed marker already matches.
    * The marker carries a FINGERPRINT (source file size+mtime +
    * projection version), not mere existence — a regenerated sf
    * dataset or a changed projection rebuilds instead of silently
    * serving stale data against a fresh oracle. Bench calls this
    * untimed via `prepare`; the query body calls it too so
    * Verify/standalone runs stay self-sufficient — the repeat call is
    * two filesystem stats. */
  private def ensureFixture(s: org.apache.spark.sql.SparkSession,
                            d: String): Unit = {
    val path = fixturePath(d)
    val hconf = s.sparkContext.hadoopConfiguration
    val marker = new org.apache.hadoop.fs.Path(s"$path/_GRAFT_COMPLETE")
    val fs = marker.getFileSystem(hconf)
    val src = new org.apache.hadoop.fs.Path(s"$d/orders.parquet")
    val srcFs = src.getFileSystem(hconf)
    val st = srcFs.getFileStatus(src)
    val fingerprint = s"v$FixtureVersion:${st.getLen}:${st.getModificationTime}"
    val current =
      if (!fs.exists(marker)) None
      else {
        val in = fs.open(marker)
        try Some(new String(in.readAllBytes(), "UTF-8")) finally in.close()
      }
    if (!current.contains(fingerprint)) {
      // start from a clean directory: dynamic partition overwrite only
      // replaces partitions present in the NEW write, so run_month
      // partitions from an older source/projection would otherwise
      // survive the rebuild as stale or mixed-schema data
      fs.delete(new org.apache.hadoop.fs.Path(path), true)
      val fact = Tables.orders(s, d).select(
        col("o_orderkey"), col("o_orderstatus"), col("o_totalprice"),
        date_format(col("o_orderdate"), "yyyy-MM").as("run_month"))
      Partitioned.writeBy(fact, path, "run_month")
      val out = fs.create(marker, true)
      try out.write(fingerprint.getBytes("UTF-8")) finally out.close()
    }
  }

  val runMonthPruning = GQuery(
    "q_runmonth_pruning",
    (s, d) => {
      ensureFixture(s, d)
      Partitioned.readSlice(s, fixturePath(d), "run_month", "1995-03")
        .groupBy("o_orderstatus")
        .agg(
          count(lit(1)).as("n_orders"),
          sum(col("o_totalprice").cast(DecimalType(18, 4))).cast("double")
            .as("total_price"))
        .orderBy("o_orderstatus")
    },
    Some("""
      SELECT o_orderstatus,
             COUNT(*) AS n_orders,
             CAST(SUM(CAST(o_totalprice AS DECIMAL(18,4))) AS DOUBLE)
               AS total_price
      FROM orders
      WHERE strftime(o_orderdate, '%Y-%m') = '1995-03'
      GROUP BY o_orderstatus
      ORDER BY o_orderstatus
    """),
    prepare = Some(ensureFixture))

  def all: Seq[GQuery] = Seq(runMonthPruning)
}
