package graft.plans

import org.apache.spark.sql.{Column, Row, SparkSession}
import org.apache.spark.sql.catalyst.analysis.UnresolvedAttribute
import org.apache.spark.sql.catalyst.expressions.{And, Attribute,
  AttributeReference, EqualTo, Expression, SubqueryExpression}
import org.apache.spark.sql.catalyst.plans.logical.{Assignment,
  DeleteFromTable, InsertAction, LogicalPlan, MergeIntoTable,
  SubqueryAlias, UpdateAction, UpdateTable}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.connector.catalog.Identifier
import org.apache.spark.sql.execution.command.LeafRunnableCommand
import org.apache.spark.sql.execution.datasources.v2.DataSourceV2Relation
import org.apache.spark.sql.graftbridge.Bridge
import org.apache.spark.sql.types.LongType

import graft.ops.{Manifest, Merge}
import graft.sources.GraftCatalog

/** SQL DML over governed [[graft.ops.Manifest]] tables — the write half
  * of the `graft.` catalog surface (reads were done: VERSION/TIMESTAMP
  * AS OF, `.history`/`.files`/`.tags`):
  *
  *   DELETE FROM graft.t WHERE id = 3
  *   UPDATE graft.t SET v = v + 100 WHERE id = 5
  *   MERGE INTO graft.t USING src ON t.id = src.id
  *     WHEN MATCHED THEN UPDATE SET * WHEN NOT MATCHED THEN INSERT *
  *
  * All route through the SAME merge engine as the Scala API
  * ([[Merge.deleteWhereDv]] / [[Merge.updateWhereDv]]): the commit
  * publishes DELETION VECTORS (plus update images for UPDATE) under the
  * full optimistic-concurrency protocol — positions ∝ matched rows,
  * zero data files rewritten, CDC-visible, time-travel exact. This is
  * the Delta pattern: the catalog resolves the relation, an analyzer
  * rule swaps the unsupported-by-DSv2 `DeleteFromTable`/`UpdateTable`
  * node for a runnable command that drives the table-format write path.
  *
  * Scope: conditions and SET values must be plain expressions over the
  * table's columns — a subquery (`WHERE id IN (SELECT …)`) fails loudly
  * naming the Scala API ([[Merge.deleteKeysDv]] is the set-shaped
  * erasure), rather than resolving against a snapshot the commit
  * protocol can't re-check. Everything else the catalog refuses stays
  * refused (CREATE/DROP/ALTER/INSERT) — only these two verbs retire
  * the read-only rule, because only they map onto a governed write. */
case class GraftSqlDml(session: SparkSession) extends Rule[LogicalPlan] {

  private def graftTarget(plan: LogicalPlan): Option[String] = {
    def unwrap(p: LogicalPlan): LogicalPlan = p match {
      case SubqueryAlias(_, child) => unwrap(child)
      case other => other
    }
    unwrap(plan) match {
      case r: DataSourceV2Relation =>
        (r.catalog, r.identifier) match {
          case (Some(c: GraftCatalog), Some(ident: Identifier)) =>
            val path = c.pathOf(ident)
            if (Manifest.version(path) > 0) Some(path) else None
          case _ => None
        }
      case _ => None
    }
  }

  private def noSubquery(verb: String, es: Seq[Expression]): Unit =
    if (es.exists(_.exists(_.isInstanceOf[SubqueryExpression])))
      throw new UnsupportedOperationException(
        s"graft SQL $verb does not support subqueries in the condition " +
          "or SET values — the commit protocol re-validates its " +
          "read-set on rebase, which an embedded query result defeats. " +
          "Use the Scala API instead (Merge.deleteKeysDv for " +
          "set-shaped erasure, Merge.upsert for merges).")

  override def apply(plan: LogicalPlan): LogicalPlan =
    plan.resolveOperators {
      case d @ DeleteFromTable(target, cond) if d.resolved =>
        graftTarget(target) match {
          case Some(path) =>
            noSubquery("DELETE", Seq(cond))
            GraftDeleteCommand(path, cond)
          case None => d
        }
      case u @ UpdateTable(target, assignments, cond) if u.resolved =>
        graftTarget(target) match {
          case Some(path) =>
            noSubquery("UPDATE",
              cond.toSeq ++ assignments.map(_.value))
            GraftUpdateCommand(path, assignments.map { a =>
              a.key match {
                case attr: AttributeReference => attr.name -> a.value
                case other => throw new UnsupportedOperationException(
                  s"graft SQL UPDATE: unsupported SET target '$other' " +
                    "(only plain table columns)")
              }
            }, cond)
          case None => u
        }
      case m: MergeIntoTable if m.resolved =>
        graftTarget(m.targetTable) match {
          case Some(path) =>
            GraftMergeCommand(path, m.sourceTable,
              mergeKeys(m), m.targetTable.output.map(_.name))
          case None => m
        }
    }

  /** The supported MERGE shape is the upsert-by-key Delta idiom:
    *
    *   MERGE INTO graft.t USING src ON t.k = src.k
    *   WHEN MATCHED THEN UPDATE SET *
    *   WHEN NOT MATCHED THEN INSERT *
    *
    * (the star actions arrive here pre-expanded by the analyzer into
    * straight by-name assignments). Anything else — conditional
    * actions, partial SET lists, DELETE clauses, NOT MATCHED BY
    * SOURCE — refuses loudly naming the Scala API, whose explicit
    * forms cover them. Returns the equi-join key column names. */
  private def mergeKeys(m: MergeIntoTable): Seq[String] = {
    def refuse(what: String): Nothing =
      throw new UnsupportedOperationException(
        s"graft SQL MERGE supports exactly 'WHEN MATCHED THEN UPDATE " +
          "SET *' + 'WHEN NOT MATCHED THEN INSERT *' on a conjunction " +
          s"of same-name key equalities; got $what. Use the Scala API " +
          "(Merge.upsert / deleteWhereDv / updateWhereDv) for other " +
          "shapes.")
    val tgtCols = m.targetTable.output.map(_.name)
    def identityAssignments(as: Seq[Assignment]): Boolean =
      as.length == tgtCols.length && as.forall { a =>
        (a.key, a.value) match {
          case (k: AttributeReference, v: AttributeReference) =>
            k.name.equalsIgnoreCase(v.name)
          case _ => false
        }
      }
    m.matchedActions match {
      case Seq(UpdateAction(None, as, _)) if identityAssignments(as) => ()
      case other => refuse(s"matched actions $other")
    }
    m.notMatchedActions match {
      case Seq(InsertAction(None, as)) if identityAssignments(as) => ()
      case other => refuse(s"not-matched actions $other")
    }
    if (m.notMatchedBySourceActions.nonEmpty)
      refuse("NOT MATCHED BY SOURCE actions")
    val tgtSet = m.targetTable.outputSet
    val srcSet = m.sourceTable.outputSet
    def conjuncts(e: Expression): Seq[Expression] = e match {
      case And(l, r) => conjuncts(l) ++ conjuncts(r)
      case other => Seq(other)
    }
    conjuncts(m.mergeCondition).map {
      case EqualTo(a: AttributeReference, b: AttributeReference)
          if a.name.equalsIgnoreCase(b.name) &&
            ((tgtSet.contains(a) && srcSet.contains(b)) ||
              (tgtSet.contains(b) && srcSet.contains(a))) => a.name
      case other => refuse(s"merge condition conjunct '$other'")
    }
  }
}

object GraftSqlDml {
  /** Rebind a condition/value expression parsed against the CATALOG
    * relation's attributes onto the fresh frame the merge engine scans:
    * resolved attribute references become by-name lookups (the
    * expression tree itself — literals, functions, casts — carries
    * over verbatim). */
  def rebind(e: Expression): Column = Bridge.column(e.transform {
    case a: AttributeReference => UnresolvedAttribute.quoted(a.name)
  })

  val output: Seq[Attribute] =
    Seq(AttributeReference("num_affected_rows", LongType,
      nullable = false)())
}

/** `DELETE FROM graft.t WHERE …` → [[Merge.deleteWhereDv]]: publishes
  * deletion vectors (merge-on-read), returns the hidden-position count. */
case class GraftDeleteCommand(tablePath: String, cond: Expression)
    extends LeafRunnableCommand {
  override val output: Seq[Attribute] = GraftSqlDml.output
  override def run(session: SparkSession): Seq[Row] = {
    val stats = Merge.deleteWhereDv(session, tablePath,
      GraftSqlDml.rebind(cond))
    Seq(Row(stats.positionsAdded))
  }
}

/** `MERGE INTO graft.t USING src ON <keys> WHEN MATCHED THEN UPDATE
  * SET * WHEN NOT MATCHED THEN INSERT *` → [[Merge.upsert]]: the
  * copy-on-write keyed merge (only files containing a matched key
  * rewrite; insert-only degenerates to a pure append), duplicate-key
  * sources refused before anything writes, broadcast-vs-shuffle key
  * probing size-gated. The source plan re-executes inside the command
  * (it was analyzed with the statement). Returns
  * (num_affected_rows = source rows merged). */
case class GraftMergeCommand(tablePath: String, source: LogicalPlan,
    keyCols: Seq[String], targetCols: Seq[String])
    extends LeafRunnableCommand {
  override val output: Seq[Attribute] = GraftSqlDml.output
  override def innerChildren: Seq[LogicalPlan] = Seq(source)
  override def run(session: SparkSession): Seq[Row] = {
    val src = Bridge.ofRows(session, source)
      .select(targetCols.map(org.apache.spark.sql.functions.col): _*)
    val n = src.count()
    Merge.upsert(session, tablePath, src, keyCols)
    Seq(Row(n))
  }
}

/** `UPDATE graft.t SET … WHERE …` → [[Merge.updateWhereDv]]: one atomic
  * commit hiding the old positions and adding the updated images. */
case class GraftUpdateCommand(tablePath: String,
    sets: Seq[(String, Expression)], cond: Option[Expression])
    extends LeafRunnableCommand {
  override val output: Seq[Attribute] = GraftSqlDml.output
  override def run(session: SparkSession): Seq[Row] = {
    val schema = Manifest.schemaOf(tablePath).getOrElse(
      Manifest.read(session, tablePath).schema)
    val setCols = sets.map { case (c, e) =>
      // cast SQL-typed values onto the column's recorded type, the way
      // the UPDATE alignment rules would (an int literal must not fail
      // a bigint column's append-compatible schema check)
      c -> GraftSqlDml.rebind(e).cast(schema(c).dataType)
    }
    val pred = cond.map(GraftSqlDml.rebind).getOrElse(
      org.apache.spark.sql.functions.lit(true))
    val stats = Merge.updateWhereDv(session, tablePath, pred, setCols)
    Seq(Row(stats.positionsAdded))
  }
}
