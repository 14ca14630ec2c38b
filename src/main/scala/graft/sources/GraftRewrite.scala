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
  * rows; correctness owns the fork.
  *
  * DML TARGETS are left alone: the relation under a
  * `DeleteFromTable`/`UpdateTable`/`MergeIntoTable` must stay a V2
  * relation for [[GraftDmlRule]] to claim once the command resolves
  * (the rewrite would otherwise fire in the iteration where the
  * relation resolves but the condition hasn't yet — stranding the
  * command over a plain parquet relation no DML path understands).
  * A merge's SOURCE side still rewrites: only the mutation target is
  * protected. */
case class GraftRewrite(session: SparkSession) extends Rule[LogicalPlan] {

  import org.apache.spark.sql.catalyst.plans.logical.{DeleteFromTable, MergeIntoTable, UpdateTable}

  private def dmlTargets(plan: LogicalPlan): Set[LogicalPlan] =
    plan.collect {
      case d: DeleteFromTable =>
        d.table.collect { case r: DataSourceV2Relation => r }
      case u: UpdateTable =>
        u.table.collect { case r: DataSourceV2Relation => r }
      case m: MergeIntoTable =>
        m.targetTable.collect { case r: DataSourceV2Relation => r }
    }.flatten.toSet

  import org.apache.spark.sql.catalyst.expressions.{Alias, Literal}
  import org.apache.spark.sql.catalyst.expressions.aggregate.{AggregateExpression, Count}
  import org.apache.spark.sql.catalyst.plans.logical.{Aggregate, LocalRelation, Project, SubqueryAlias}

  /** A bare graft snapshot under aliases/trivial projections — the
    * only shape whose row count the LOG answers exactly (any Filter
    * or join in between makes the count data-dependent). Matches the
    * V2 relation AND the already-rewritten file-index form (the two
    * can race within the resolution fixed point). Yields the
    * log-exact row count. */
  private object MetaCountable {
    def unapply(plan: LogicalPlan): Option[Long] = plan match {
      case SubqueryAlias(_, child) => unapply(child)
      case p @ Project(_, child) if p.projectList.forall(
        _.isInstanceOf[org.apache.spark.sql.catalyst.expressions.Attribute]) =>
        unapply(child)
      case r: DataSourceV2Relation
          if r.table.isInstanceOf[GraftStoreTable] &&
            !r.table.asInstanceOf[GraftStoreTable].hasDeleteVectors =>
        Some(r.table.asInstanceOf[GraftStoreTable]
          .liveEntries.map(_.rows).sum)
      case l: LogicalRelation => l.relation match {
        case h: HadoopFsRelation if h.location.isInstanceOf[GraftFileIndex] =>
          Some(h.location.asInstanceOf[GraftFileIndex]
            .entries.map(_.rows).sum)
        case _ => None
      }
      case _ => None
    }
  }

  private def isCountStar(e: org.apache.spark.sql.catalyst.expressions.NamedExpression): Boolean =
    e match {
      case Alias(AggregateExpression(
        Count(Seq(Literal(v, _))), _, false, None, _), _) => v != null
      case _ => false
    }

  override def apply(plan: LogicalPlan): LogicalPlan = {
    val protectedRels = dmlTargets(plan)
    // metadata-only COUNT(*) pre-pass (top-down: the count subsumes
    // its relation before the bottom-up scan rewrite converts it):
    // an ungrouped, unfiltered count over a vector-free snapshot is
    // the sum of the log's per-file footer row counts — exact by the
    // commit contract, ZERO data IO. At a million files this is the
    // difference between an instant dashboard tick and a full scan
    // (the metaStats contract on the query path). DV-carrying
    // snapshots fall through: their logical count is footer rows
    // minus vectored rows, which the dv-aware scan owns.
    // transformDownWithSubqueries: a bare COUNT(*) inside a SCALAR
    // SUBQUERY (`SELECT (SELECT COUNT(*) FROM wh.t) AS n, …` — the
    // dashboard-tile shape) short-circuits to the log sum too, not
    // just top-level counts
    val counted = plan.transformDownWithSubqueries {
      case a @ Aggregate(Nil, aggs, MetaCountable(total), _)
          if a.resolved && aggs.nonEmpty && aggs.forall(isCountStar) =>
        LocalRelation(a.output.map(_.asInstanceOf[
          org.apache.spark.sql.catalyst.expressions.Attribute]),
          Seq(org.apache.spark.sql.catalyst.InternalRow(
            Seq.fill(aggs.size)(total): _*)))
    }
    // transformUpWithSubqueries: relations INSIDE subquery expressions
    // (IN/EXISTS/scalar over a graft store — the reference's literal
    // DELETE shapes, and any SELECT with a store-reading subquery) get
    // the same native vectorized scan as top-level relations. DML
    // targets are top-level by grammar, so the protection set is
    // never shadowed by a subquery relation (those are reads).
    counted.transformUpWithSubqueries {
      case r: DataSourceV2Relation
          if r.table.isInstanceOf[GraftStoreTable] &&
            !r.table.asInstanceOf[GraftStoreTable].hasDeleteVectors &&
            !protectedRels.contains(r) =>
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
}
