package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}

/** One named engine query: a Spark implementation plus (when the
  * semantics are ANSI-SQL-expressible) a DuckDB oracle over the same
  * parquet tables. Conventions that keep the driver's hash compare
  * deterministic (see the builder contract in SparkEntry):
  *
  *  - every result has an explicit total ORDER BY in BOTH forms;
  *  - double aggregates go through DECIMAL(18,4) (exact, order-
  *    independent) and are cast back to double at the end, so Spark's
  *    partition-order float summation can never drift from DuckDB's;
  *  - aggregate/computed columns carry identical aliases in both forms;
  *  - timestamps are projected as DATE or STRING at the result edge.
  */
/** The sf dir the CURRENT Verify run reads — consulted when an
  * oracle embeds a written-fixture path ([[GQuery.oracleAt]]), so the
  * wire-contract queries gate at ANY scale factor instead of pinning
  * /tmp paths keyed to sf0.01 at build time. Defaults to the driver's
  * contract SF; [[graft.Verify]] overwrites it from argv before the
  * oracle map is rendered. */
object OracleContext {
  @volatile var sfDir: String = "/root/testdata/sf0.01"
}

final case class GQuery(
    name: String,
    run: (SparkSession, String) => DataFrame,
    oracle: Option[String],
    /** sfDir-dependent oracle SQL (written-file fixtures embed paths
      * derived from the sf dir); rendered against
      * [[OracleContext.sfDir]] at dump time. Mutually exclusive with
      * [[oracle]] — when both are set, `oracleAt` wins. */
    oracleAt: Option[String => String] = None,
    /** headline queries get timed by Bench at sf0.1 */
    bench: Boolean = true,
    /** untimed fixture setup: Bench runs this before the timed body so
      * one-off fixture I/O (e.g. the partitioned-fact write) doesn't
      * pollute the query's measurement; `run` must still be
      * self-sufficient (idempotent ensure) for Verify/standalone use */
    prepare: Option[(SparkSession, String) => Unit] = None,
    /** true when `run` EXECUTES Spark jobs at DataFrame-construction
      * time (funnel accounting queries collect per-stage counts, store
      * bootstraps write to disk) — the returned frame's plan is then a
      * LocalTableScan with zero insight, so Explain's default sweep
      * skips these (explicit-name requests still run them) */
    eager: Boolean = false)

trait QueryPack {
  def all: Seq[GQuery]
}
