package graft.sources

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.execution.datasources.{HadoopFsRelation, LogicalRelation}
import org.apache.spark.sql.execution.datasources.parquet.ParquetFileFormat
import org.apache.spark.sql.execution.datasources.v2.DataSourceV2Relation
import org.apache.spark.sql.types.StructType

/** Analysis rewrite: every [[GraftStoreTable]] relation becomes a
  * NATIVE parquet file-source relation over a [[GraftFileIndex]] —
  * the Delta-lake architecture for putting a log-governed table on
  * Spark's first-class read path. What the swap buys, relative to the
  * DSv2 V1Scan fallback the table otherwise plans through:
  *
  *  - FileSourceScanExec: vectorized parquet reader inside
  *    whole-stage codegen, zero per-row adapter cost;
  *  - Catalyst's own pushdown: filters reach the scan as
  *    `PushedFilters` (parquet row-group pruning) AND reach the
  *    file index as data filters (log-stats FILE pruning);
  *  - column pruning into the reader (`ReadSchema`), AQE, runtime
  *    filters — everything the planner knows how to do with a
  *    HadoopFsRelation.
  *
  * The rewrite preserves the relation's resolved output attributes
  * (same names, types, exprIds), so parent operators are untouched.
  * Snapshots carrying merge-on-read delete vectors are left on the
  * dv-aware V1Scan path — a raw file scan would resurrect deleted
  * rows; correctness owns the fork. */
case class GraftRewrite(session: SparkSession) extends Rule[LogicalPlan] {

  override def apply(plan: LogicalPlan): LogicalPlan =
    plan.transformUp {
      case r: DataSourceV2Relation
          if r.table.isInstanceOf[GraftStoreTable] &&
            !r.table.asInstanceOf[GraftStoreTable].hasDeleteVectors =>
        val t = r.table.asInstanceOf[GraftStoreTable]
        val index = new GraftFileIndex(session, t.root,
          t.resolvedVersion, t.liveEntries)
        val rel = HadoopFsRelation(
          location = index,
          partitionSchema = new StructType(),
          dataSchema = t.schema,
          bucketSpec = None,
          fileFormat = new ParquetFileFormat(),
          options = Map.empty)(session)
        LogicalRelation(rel, r.output, None, isStreaming = false,
          stream = None)
    }
}
