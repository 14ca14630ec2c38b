package graft.sources

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.UnresolvedAttribute
import org.apache.spark.sql.catalyst.expressions.{Attribute, AttributeReference, Expression, ExprId, SubqueryExpression}
import org.apache.spark.sql.catalyst.expressions.aggregate.AggregateExpression
import org.apache.spark.sql.catalyst.plans.logical._
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.execution.{SparkPlan, SparkStrategy}
import org.apache.spark.sql.execution.datasources.v2.{DataSourceV2Relation, V2CommandExec}
import org.apache.spark.sql.graftbridge.Bridge

import graft.ops.Dml

/** Row-level DML on the SQL surface: `DELETE FROM` / `UPDATE` /
  * `MERGE INTO` against [[GraftCatalog]] tables, routed through the
  * same proportional copy-on-write commits the API takes
  * ([[graft.ops.Dml]] — log-stats pruning, exact touched-file
  * discovery, one commit). The reference's correction loop IS these
  * statements — and its literal DELETEs are IN-SUBQUERY deletes: the
  * correction-loop upsert (dags/Reprocessing.py:117-126), the
  * self-referencing GROUP-BY-HAVING dup delete
  * (dags/DataWarehouse.py:531-540), and the staging-vs-bronze dedup
  * (dags/DataWarehouse.py:666-673) — so a reference user gets their
  * mutation surface verbatim, subqueries included — uncorrelated
  * AND correlated EXISTS/NOT EXISTS (see [[GraftDmlRule
  * .screenPredicate]]).
  *
  * Mechanics: Spark parses the statements into
  * `DeleteFromTable`/`UpdateTable`/`MergeIntoTable`; for tables that
  * are not `SupportsRowLevelOperations` its own rewrites give up
  * (UPDATE/MERGE throw TABLE_OPERATION). [[GraftDmlRule]] — an
  * injected resolution rule — claims the fully-RESOLVED command when
  * the target is a graft store, screens the shapes the engine refuses
  * (subqueries, nondeterminism, time-travel pins), and replaces the
  * node with a leaf command carrying the store root, the resolved
  * expressions, and the attribute maps needed to re-bind them by NAME
  * at execution ([[GraftRewrite]] leaves DML targets un-rewritten so
  * the V2 relation is still visible here). [[GraftDmlStrategy]] plans
  * the leaf into a [[V2CommandExec]] that runs the store op — EXPLAIN
  * stays side-effect-free, execution happens exactly once at
  * `collect`. */
object GraftDmlRule {

  /** The graft V2 relation under optional subquery aliases. */
  private[sources] object GraftTarget {
    def unapply(plan: LogicalPlan)
        : Option[(DataSourceV2Relation, GraftStoreTable)] = plan match {
      case SubqueryAlias(_, child) => unapply(child)
      case r: DataSourceV2Relation
          if r.table.isInstanceOf[GraftStoreTable] =>
        Some((r, r.table.asInstanceOf[GraftStoreTable]))
      case _ => None
    }
  }

  /** VALUE expressions (UPDATE/MERGE assignments, MERGE ON and action
    * conditions): no subqueries — a value position has no Filter to
    * re-plan them through, and the merge rewrite evaluates values in
    * projections where IN/EXISTS are not plannable. */
  private[sources] def screen(what: String, exprs: Seq[Expression]): Unit =
    exprs.foreach { e =>
      require(!SubqueryExpression.hasSubquery(e),
        s"graft $what does not support subqueries — materialize the " +
          "subquery (temp view / join through MERGE) first")
      require(!e.exists(_.isInstanceOf[AggregateExpression]),
        s"graft $what does not allow aggregate functions")
      require(e.deterministic,
        s"graft $what must be deterministic — discovery and rewrite " +
          "evaluate it in separate jobs")
    }

  /** PREDICATE positions (DELETE / UPDATE WHERE): subqueries are
    * allowed, UNCORRELATED and CORRELATED — the reference's literal
    * DELETE statements are IN-subquery deletes
    * (dags/DataWarehouse.py:531-540 self-referencing dup delete,
    * :666-673 staging⋈bronze dedup, dags/Reprocessing.py:117-126
    * correction upsert), its gold quality corpus is built on
    * correlated NOT EXISTS
    * (dags/SQL/Gold/create_load_data_gold.sql:142-145), and every
    * Postgres-ported dedup-delete writes `WHERE EXISTS (SELECT 1
    * FROM s WHERE s.id = t.id)` — so refusing either form would
    * break a reference user on day one. The resolved subquery plans
    * ride the command into [[graft.ops.Dml]], whose discovery and
    * rewrite passes re-plan the predicate as a fresh Filter —
    * Spark's own RewritePredicateSubquery turns IN/EXISTS into
    * (existence) joins there. Correlated plans have their
    * `OuterReference`s rebound by NAME against the op's aliased
    * target scans ([[GraftDmlExecHelpers.rebind]] — the fresh
    * Filter's analysis re-discovers the correlation through the
    * [[graft.ops.Dml.TargetAlias]] qualifier, exactly the semi/anti
    * decorrelation Spark applies to the original statement).
    * Pre-image semantics hold by construction: a SELF-referencing
    * subquery's relation pinned its snapshot version at statement
    * analysis, and the one commit happens after every evaluation —
    * both passes read pre-delete state (DmlSubquerySpec pins the IN
    * form, DmlExistsSpec the correlated form).
    *
    * Correlated refs must point at the TARGET relation (for
    * DELETE/UPDATE there is no other outer scope — rebind throws on
    * anything else). Nondeterminism anywhere in the inner plan is
    * refused for the same reason the outer predicate must be
    * deterministic — discovery and rewrite evaluate it twice. */
  private[sources] def screenPredicate(what: String, e: Expression): Unit = {
    def planDeterministic(p: LogicalPlan): Boolean =
      p.expressions.forall(_.deterministic) &&
        p.children.forall(planDeterministic) &&
        !p.expressions.exists(_.exists {
          case s: SubqueryExpression => !planDeterministic(s.plan)
          case _ => false
        })
    e.foreach {
      case s: SubqueryExpression =>
        require(!s.isCorrelated ||
          s.isInstanceOf[org.apache.spark.sql.catalyst.expressions.Exists],
          s"graft $what supports correlated subqueries as EXISTS / " +
            "NOT EXISTS only — rewrite the correlated " +
            s"${s.getClass.getSimpleName} as EXISTS (SELECT 1 … " +
            "WHERE <correlation>)")
        require(planDeterministic(s.plan),
          s"graft $what subqueries must be deterministic — discovery " +
            "and rewrite evaluate the predicate in separate jobs")
      case _ => ()
    }
    require(!e.exists(_.isInstanceOf[AggregateExpression]),
      s"graft $what does not allow aggregate functions outside a " +
        "subquery")
    require(e.deterministic,
      s"graft $what must be deterministic — discovery and rewrite " +
        "evaluate it in separate jobs")
  }

  private[sources] def requireWritable(t: GraftStoreTable,
                                       what: String): Unit =
    require(t.requestedVersion.isEmpty,
      s"a time-travel pin is read-only: $what targets ${t.root}'s " +
        "latest version — drop VERSION AS OF / TIMESTAMP AS OF")

  /** `Seq` of conjunction factors. */
  private[sources] def conjuncts(e: Expression): Seq[Expression] =
    e match {
      case org.apache.spark.sql.catalyst.expressions.And(l, r) =>
        conjuncts(l) ++ conjuncts(r)
      case other => Seq(other)
    }
}

case class GraftDmlRule(session: SparkSession) extends Rule[LogicalPlan] {
  import GraftDmlRule._

  override def apply(plan: LogicalPlan): LogicalPlan = plan.transformUp {
    case d @ DeleteFromTable(GraftTarget(rel, table), cond)
        if d.resolved =>
      requireWritable(table, "DELETE")
      screenPredicate("DELETE", cond)
      GraftDeleteCommand(table.root, cond, rel.output)

    case u @ UpdateTable(GraftTarget(rel, table), assignments, cond)
        if u.resolved =>
      requireWritable(table, "UPDATE")
      screen("UPDATE", assignments.map(_.value))
      cond.foreach(screenPredicate("UPDATE", _))
      val set = assignments.map { a =>
        a.key match {
          case attr: AttributeReference => attr.name -> a.value
          case other => throw new IllegalArgumentException(
            s"graft UPDATE assigns whole columns only, got $other — " +
              "nested-field updates are not supported")
        }
      }
      GraftUpdateCommand(table.root, set, cond, rel.output)

    case m @ MergeIntoTable(GraftTarget(rel, table), source, onCond,
        matchedActions, notMatchedActions, notMatchedBySourceActions,
        withSchemaEvolution) if m.resolved =>
      requireWritable(table, "MERGE")
      // withSchemaEvolution is already DONE by the time this rule
      // claims the command: the AUTOMATIC_SCHEMA_EVOLUTION capability
      // routes Spark's ResolveMergeIntoSchemaEvolution through the
      // catalog's alterTable (one schema commit), and the merge here
      // resolves against the EVOLVED relation — nothing left to do.
      val actionExprs = (matchedActions ++ notMatchedActions ++
        notMatchedBySourceActions).flatMap {
        case UpdateAction(c, as, _) => c.toSeq ++ as.map(_.value)
        case InsertAction(c, as) => c.toSeq ++ as.map(_.value)
        case DeleteAction(c) => c.toSeq
        case other => throw new IllegalArgumentException(
          s"graft MERGE does not support action $other")
      }
      screen("MERGE", onCond +: actionExprs)
      // the equi-key the proportional touch discovery keys on: one
      // conjunct of ON must be a bare target column = source expr
      val targetIds = rel.output.map(_.exprId).toSet
      val sourceIds = source.output.map(_.exprId).toSet
      def refsOnly(e: Expression, ids: Set[ExprId]): Boolean =
        e.references.forall(a => ids.contains(a.exprId))
      val equi = conjuncts(onCond).collectFirst {
        case org.apache.spark.sql.catalyst.expressions.EqualTo(
            l: AttributeReference, r)
            if targetIds.contains(l.exprId) && refsOnly(r, sourceIds) =>
          (l, r)
        case org.apache.spark.sql.catalyst.expressions.EqualTo(
            l, r: AttributeReference)
            if targetIds.contains(r.exprId) && refsOnly(l, sourceIds) =>
          (r, l)
      }.getOrElse(throw new IllegalArgumentException(
        "graft MERGE needs at least one `target.column = " +
          "source_expression` equality in ON (same types — a coerced " +
          "key hides the column behind a cast) to key the touch " +
          "discovery on"))
      GraftMergeCommand(table.root, source, onCond, equi._1, equi._2,
        matchedActions, notMatchedActions, notMatchedBySourceActions,
        rel.output)
  }
}

/** Shared execution plumbing: re-bind resolved expressions by NAME so
  * they evaluate against the store's own reads (fresh parquet scans
  * whose attributes differ from the analyzed relation's). Correlated
  * subqueries rebind INSIDE the inner plan too: each
  * `OuterReference(attr)` becomes an UnresolvedAttribute QUALIFIED by
  * [[graft.ops.Dml.TargetAlias]] (the alias [[graft.ops.Dml]] wraps
  * around every frame it evaluates the predicate against), and the
  * subquery's outer-tracking fields are cleared — re-analysis of the
  * op's fresh Filter then re-discovers the correlation against the
  * aliased scan, never against a same-named inner column (the
  * qualifier is what prevents `s.id = t.id` from collapsing to
  * `s.id = s.id` when the subquery reads a same-schema table). */
private[sources] trait GraftDmlExecHelpers { self: V2CommandExec =>

  protected def rebind(e: Expression,
                       byId: Map[ExprId, String]): Column =
    Bridge.column(rebindExpr(e, byId))

  private def rebindExpr(e: Expression,
                         byId: Map[ExprId, String]): Expression =
    e.transform {
      case s: SubqueryExpression if s.isCorrelated =>
        import org.apache.spark.sql.catalyst.expressions.{And, Exists, OuterReference}
        import org.apache.spark.sql.catalyst.plans.logical.Filter
        def outerUnresolved(a: AttributeReference): UnresolvedAttribute =
          byId.get(a.exprId) match {
            case Some(n) =>
              UnresolvedAttribute(Seq(graft.ops.Dml.TargetAlias, n))
            case None => throw new IllegalArgumentException(
              s"correlated subquery reference $a is not a column of " +
                "the target table — only target columns can be " +
                "referenced from a DML predicate's subquery")
          }
        // the command's expressions ride through the session's
        // OPTIMIZER before execution, and PullupCorrelatedPredicates
        // moves the correlation out of the inner plan into joinCond
        // (bare outer attrs, no OuterReference wrapper). Reinject it
        // as a Filter over the (already optimized) plan with the
        // outer side rebound — re-analysis of the op's fresh Filter
        // then re-discovers the correlation through the TargetAlias
        // qualifier and decorrelates it again against the new scan.
        val ex = s match {
          case ex: Exists => ex
          case other => throw new IllegalArgumentException(
            "only correlated EXISTS / NOT EXISTS is supported in a " +
              "DML predicate — rewrite a correlated " +
              s"${other.getClass.getSimpleName} as EXISTS (SELECT 1 " +
              "… WHERE <correlation>)")
        }
        val innerOut = ex.plan.outputSet
        val reinjected = ex.joinCond.map(_.transform {
          case OuterReference(a: AttributeReference) => outerUnresolved(a)
          case a: AttributeReference if !innerOut.contains(a) =>
            outerUnresolved(a)
        })
        // the un-optimized shape (OuterReference still inside the
        // plan) rebinds in place — covers EXPLAIN-time rendering and
        // API callers handing an analyzed-but-unoptimized predicate
        val newPlan0 = ex.plan.transformAllExpressions {
          case OuterReference(a: AttributeReference) => outerUnresolved(a)
        }
        val newPlan =
          if (reinjected.isEmpty) newPlan0
          else Filter(reinjected.reduce(And), newPlan0)
        ex.copy(plan = newPlan, outerAttrs = Nil, joinCond = Nil)
      case a: AttributeReference => byId.get(a.exprId) match {
        case Some(n) => UnresolvedAttribute(Seq(n))
        case None => throw new IllegalArgumentException(
          s"expression column $a resolves to neither the target " +
            "table nor the merge source")
      }
    }

  protected def attrMap(attrs: Seq[Attribute]): Map[ExprId, String] =
    attrs.map(a => a.exprId -> a.name).toMap
}

/** `SupportsSubquery` marks the node a legal host for IN/EXISTS in
  * CheckAnalysis (the DeleteFromTable posture this command replaces —
  * predicate subqueries ride the command into execution). */
case class GraftDeleteCommand(root: String, cond: Expression,
                              targetAttrs: Seq[Attribute])
    extends LeafCommand with SupportsSubquery {
  override def simpleString(maxFields: Int): String =
    s"GraftDelete $root cond=${cond.sql}"
}

case class GraftUpdateCommand(root: String,
                              set: Seq[(String, Expression)],
                              cond: Option[Expression],
                              targetAttrs: Seq[Attribute])
    extends LeafCommand with SupportsSubquery {
  override def simpleString(maxFields: Int): String =
    s"GraftUpdate $root set=[${set.map(_._1).mkString(",")}]"
}

/** A LEAF on purpose: the source plan rides as a field, not a child —
  * the command's expressions reference target attributes no child
  * could provide (CheckAnalysis would flag them missing), and the
  * source re-enters its own full analyze/optimize cycle at execution
  * (`Bridge.dataFrame`), so nothing is lost by hiding it here. */
case class GraftMergeCommand(root: String, source: LogicalPlan,
                             onCond: Expression,
                             targetKey: AttributeReference,
                             sourceKey: Expression,
                             matchedActions: Seq[MergeAction],
                             notMatchedActions: Seq[MergeAction],
                             notMatchedBySourceActions: Seq[MergeAction],
                             targetAttrs: Seq[Attribute])
    extends LeafCommand {
  override def innerChildren: Seq[LogicalPlan] = Seq(source)
  override def simpleString(maxFields: Int): String =
    s"GraftMerge $root on=${onCond.sql}"
}

case class GraftDmlStrategy(session: SparkSession) extends SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case d: GraftDeleteCommand =>
      GraftDeleteExec(d) :: Nil
    case u: GraftUpdateCommand =>
      GraftUpdateExec(u) :: Nil
    case m: GraftMergeCommand =>
      GraftMergeExec(m) :: Nil
    case _ => Nil
  }
}

/** Each exec carries its LOGICAL command as one opaque field (the
  * GraftMergeExec pattern) ON PURPOSE: were the predicate a direct
  * Expression field, the physical preparation's PlanSubqueries would
  * rewrite any InSubquery inside it into an InSubqueryExec — a
  * driver-materialized IN the re-analysis in [[graft.ops.Dml]] could
  * neither plan nor afford (the dup-key set of a 100 TB table is
  * data-sized). Hidden in the command, the resolved subquery PLANS
  * reach run() intact and re-plan as existence JOINS inside the
  * discovery/rewrite Filters. */
case class GraftDeleteExec(cmd: GraftDeleteCommand)
    extends V2CommandExec with GraftDmlExecHelpers {
  override def output: Seq[Attribute] = Seq.empty
  override def children: Seq[SparkPlan] = Seq.empty
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[SparkPlan]): SparkPlan = this
  override def run(): Seq[InternalRow] = {
    Dml.delete(session, cmd.root,
      rebind(cmd.cond, attrMap(cmd.targetAttrs)))
    Seq.empty
  }
}

case class GraftUpdateExec(cmd: GraftUpdateCommand)
    extends V2CommandExec with GraftDmlExecHelpers {
  override def output: Seq[Attribute] = Seq.empty
  override def children: Seq[SparkPlan] = Seq.empty
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[SparkPlan]): SparkPlan = this
  override def run(): Seq[InternalRow] = {
    val byId = attrMap(cmd.targetAttrs)
    Dml.update(session, cmd.root,
      cmd.set.map { case (c, v) => c -> rebind(v, byId) },
      cmd.cond.map(rebind(_, byId)))
    Seq.empty
  }
}

/** MERGE execution: the source plan runs as its own frame with
  * columns renamed positionally to `__graft_src_<i>` (disjoint from
  * any target name by construction), every action expression re-bound
  * into the (target ∪ renamed-source) namespace, and the whole thing
  * handed to [[graft.ops.Dml.merge]]'s proportional commit. */
case class GraftMergeExec(cmd: GraftMergeCommand)
    extends V2CommandExec with GraftDmlExecHelpers {
  override def output: Seq[Attribute] = Seq.empty
  override def children: Seq[SparkPlan] = Seq.empty
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[SparkPlan]): SparkPlan = this

  override def run(): Seq[InternalRow] = {
    val srcNames = cmd.source.output.zipWithIndex
      .map { case (_, i) => s"__graft_src_$i" }
    val src = Bridge.dataFrame(session, cmd.source).toDF(srcNames: _*)
    val byId = attrMap(cmd.targetAttrs) ++
      cmd.source.output.zip(srcNames).map { case (a, n) => a.exprId -> n }
    val targetCols = cmd.targetAttrs.map(_.name)

    def toSet(as: Seq[Assignment]): Seq[(String, Column)] =
      as.map { a =>
        a.key match {
          case attr: AttributeReference => attr.name -> rebind(a.value, byId)
          case other => throw new IllegalArgumentException(
            s"graft MERGE assigns whole columns only, got $other")
        }
      }

    val matched = cmd.matchedActions.map {
      case UpdateAction(c, as, _) =>
        Dml.WhenMatched(c.map(rebind(_, byId)), Some(toSet(as)))
      case DeleteAction(c) =>
        Dml.WhenMatched(c.map(rebind(_, byId)), None)
      case other => throw new IllegalArgumentException(
        s"unsupported WHEN MATCHED action $other")
    }
    val notMatched = cmd.notMatchedActions.map {
      case InsertAction(c, as) =>
        val given = toSet(as).toMap
        // SQL allows a partial INSERT column list: unnamed target
        // columns land as NULL (and face the CHECK constraints)
        val values = targetCols.map(tc =>
          tc -> given.getOrElse(tc,
            org.apache.spark.sql.functions.lit(null)))
        Dml.WhenNotMatched(c.map(rebind(_, byId)), values)
      case other => throw new IllegalArgumentException(
        s"unsupported WHEN NOT MATCHED action $other")
    }
    val nmbs = cmd.notMatchedBySourceActions.map {
      case UpdateAction(c, as, _) =>
        Dml.WhenNotMatchedBySource(c.map(rebind(_, byId)), Some(toSet(as)))
      case DeleteAction(c) =>
        Dml.WhenNotMatchedBySource(c.map(rebind(_, byId)), None)
      case other => throw new IllegalArgumentException(
        s"unsupported WHEN NOT MATCHED BY SOURCE action $other")
    }

    Dml.merge(session, cmd.root, src,
      on = rebind(cmd.onCond, byId),
      targetKey = cmd.targetKey.name,
      sourceKey = rebind(cmd.sourceKey, byId),
      matched = matched, notMatched = notMatched,
      notMatchedBySource = nmbs)
    Seq.empty
  }
}
