package graft.plans

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.{Column, GraftSqlShim, SparkSession}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.UnresolvedAttribute
import org.apache.spark.sql.catalyst.expressions.{Attribute, AttributeReference, Expression, ExprId}
import org.apache.spark.sql.catalyst.plans.logical._
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.execution.{LeafExecNode, SparkPlan, SparkStrategy}
import org.apache.spark.sql.execution.datasources.v2.DataSourceV2Relation

import graft.operators.Snapshots
import graft.sources.v2.GraftSnapshotTable

/** SQL `UPDATE` / `MERGE INTO` for graft catalog tables — the analyzer
  * rule that routes Spark's parsed-and-resolved DML plans onto the
  * snapshot layer's FILE-EXACT copy-on-write verbs
  * ([[Snapshots.updateWhere]], [[Snapshots.mergeInto]]).
  *
  * Why a rule and not `SupportsRowLevelOperations`: Spark's group-based
  * row-level path plans a `ReplaceData` write, whose physical side
  * requires a connector-authored DSv2 `BatchWrite` (no V1 bridge) —
  * a whole parquet writer stack re-implemented just to reach the same
  * manifest commit the library verbs already own. The rule hands the
  * RESOLVED condition/assignment trees to those verbs instead: the
  * rewrite cost stays bounded by the predicate's (or the ON match's)
  * file blast radius, the cardinality check and DV/constraint/mapping
  * composition ride the verbs' own contracts, and the commit is the
  * same reconciled snapshot generation every other writer mints.
  *
  * Resolved attribute references are rebound by NAME (target → `t.col`,
  * source → `s.col`, matching the verbs' own join aliases) because the
  * verbs re-plan the scan from the manifest — the SQL relation's
  * exprIds don't survive into that fresh plan. */
object GraftDmlRule extends Rule[LogicalPlan] {

  override def apply(plan: LogicalPlan): LogicalPlan =
    plan.resolveOperators {
      case u: UpdateTable if u.resolved =>
        graftTable(u.table) match {
          case None => u
          case Some(table) =>
            val tgtIds = u.table.outputSet.map(_.exprId).toSet
            val cond = u.condition
              .map(rebind(_, tgtIds, Set.empty, bare = true))
              .getOrElse(org.apache.spark.sql.functions.lit(true))
            // Spark's alignment pads SET with identity assignments for
            // every unassigned column — drop them (they'd still be
            // correct, just wasted CASE WHEN work per row)
            val real = u.assignments.filterNot(a => (a.key, a.value) match {
              case (k: AttributeReference, v: AttributeReference) =>
                k.exprId == v.exprId
              case _ => false
            })
            val kept = if (real.nonEmpty) real else u.assignments.take(1)
            val assigns = kept.map { a =>
              (assignKey(a.key, "UPDATE SET"),
                rebind(a.value, tgtIds, Set.empty, bare = true))
            }
            GraftUpdateTableCommand(table.snapshotRoot, cond, assigns)
        }

      case d: DeleteFromTable if d.resolved =>
        graftTable(d.table) match {
          case None => d
          case Some(table) =>
            // Spark's own SupportsDelete path refuses predicates that
            // don't translate to V2 source filters (expressions,
            // functions) — the snapshot delete takes any Column, so
            // EVERY graft DELETE routes here and stays a deletion-
            // vector metadata commit
            val tgtIds = d.table.outputSet.map(_.exprId).toSet
            GraftDeleteFromTableCommand(table.snapshotRoot,
              rebind(d.condition, tgtIds, Set.empty, bare = true))
        }

      case m: MergeIntoTable if m.resolved =>
        graftTable(m.targetTable) match {
          case None => m
          case Some(table) =>
            require(!m.withSchemaEvolution,
              "MERGE INTO a graft table: WITH SCHEMA EVOLUTION is not " +
                "supported — schema evolution is the append commit's job")
            val tgtIds = m.targetTable.outputSet.map(_.exprId).toSet
            val srcIds = m.sourceTable.outputSet.map(_.exprId).toSet
            val tgtCols = m.targetTable.output.map(_.name)
            val srcCols = m.sourceTable.output.map(_.name)
            def reb(e: Expression): Column = rebind(e, tgtIds, srcIds)
            val on = reb(m.mergeCondition)
            val matchedClauses = m.matchedActions.map {
              case UpdateAction(c, assigns, _) =>
                Snapshots.MergeUpdate(c.map(reb),
                  assigns.map(a =>
                    (assignKey(a.key, "MERGE UPDATE SET"), reb(a.value))))
              case UpdateStarAction(c) =>
                Snapshots.MergeUpdate(c.map(reb),
                  starAssigns(tgtCols, srcCols, "UPDATE SET *"))
              case DeleteAction(c) => Snapshots.MergeDelete(c.map(reb))
              case other => throw new IllegalArgumentException(
                s"MERGE INTO a graft table: unsupported WHEN MATCHED " +
                  s"action $other")
            }
            val bySourceClauses = m.notMatchedBySourceActions.map {
              case UpdateAction(c, assigns, _) =>
                Snapshots.MergeUpdateBySource(c.map(reb),
                  assigns.map(a =>
                    (assignKey(a.key, "MERGE UPDATE SET (by source)"),
                      reb(a.value))))
              case DeleteAction(c) =>
                Snapshots.MergeDeleteBySource(c.map(reb))
              case other => throw new IllegalArgumentException(
                s"MERGE INTO a graft table: unsupported WHEN NOT " +
                  s"MATCHED BY SOURCE action $other")
            }
            val insertClauses = m.notMatchedActions.map {
              case InsertAction(c, assigns) =>
                Snapshots.MergeInsert(c.map(reb),
                  assigns.map(a =>
                    (assignKey(a.key, "MERGE INSERT"), reb(a.value))))
              case InsertStarAction(c) =>
                Snapshots.MergeInsert(c.map(reb),
                  starAssigns(tgtCols, srcCols, "INSERT *"))
              case other => throw new IllegalArgumentException(
                s"MERGE INTO a graft table: unsupported WHEN NOT " +
                  s"MATCHED action $other")
            }
            GraftMergeIntoCommand(table.snapshotRoot, m.sourceTable, on,
              matchedClauses ++ bySourceClauses ++ insertClauses)
        }
    }

  /** The graft snapshot table under a (possibly aliased) DML target. */
  private def graftTable(plan: LogicalPlan): Option[GraftSnapshotTable] =
    plan.collectFirst {
      case r: DataSourceV2Relation if r.table.isInstanceOf[GraftSnapshotTable] =>
        r.table.asInstanceOf[GraftSnapshotTable]
    }

  /** A `col = expr` key must be a plain top-level column. */
  private def assignKey(key: Expression, verb: String): String = key match {
    case a: AttributeReference => a.name
    case other => throw new IllegalArgumentException(
      s"$verb on a graft table: assignment key must be a top-level " +
        s"column, got $other")
  }

  /** `SET *` / `INSERT *`: every target column from the same-named
    * source column — the ANSI by-name star contract. */
  private def starAssigns(
      tgtCols: Seq[String],
      srcCols: Seq[String],
      verb: String): Seq[(String, Column)] = {
    val have = srcCols.toSet
    tgtCols.map { c =>
      require(have.contains(c),
        s"$verb on a graft table: the source has no column '$c' " +
          s"(source columns: ${srcCols.mkString(", ")})")
      c -> org.apache.spark.sql.functions.col(s"s.$c")
    }
  }

  /** Rebind a resolved expression's attributes by NAME against the
    * verbs' own join aliases (`t` = target, `s` = source; `bare` for
    * the single-relation UPDATE where no alias exists). An attribute
    * from neither side (a lateral/outer reference) refuses loudly. */
  private def rebind(
      e: Expression,
      tgtIds: Set[ExprId],
      srcIds: Set[ExprId],
      bare: Boolean = false): Column = {
    e.foreach {
      case sub: org.apache.spark.sql.catalyst.expressions.SubqueryExpression =>
        throw new IllegalArgumentException(
          "DML on a graft table: subqueries in conditions/assignments " +
            s"are not supported ($sub) — materialize the subquery as a " +
            "source relation and MERGE on it, or compute the predicate " +
            "into a temp view first")
      case _ => ()
    }
    GraftSqlShim.column(e.transform {
      case a: AttributeReference if tgtIds.contains(a.exprId) =>
        UnresolvedAttribute(if (bare) Seq(a.name) else Seq("t", a.name))
      case a: AttributeReference if srcIds.contains(a.exprId) =>
        UnresolvedAttribute(Seq("s", a.name))
      case a: AttributeReference => throw new IllegalArgumentException(
        s"DML on a graft table: expression references '${a.name}' from " +
          "outside the statement's target/source relations")
    })
  }
}

/** The analyzed face of a graft `UPDATE` — a leaf command holding the
  * rebound condition/assignments; executed eagerly (Command contract)
  * by [[GraftDmlStrategy]]. */
case class GraftUpdateTableCommand(
    root: String,
    condition: Column,
    assignments: Seq[(String, Column)]) extends LeafNode with Command {
  override def output: Seq[Attribute] = Nil
}

/** The analyzed face of a graft `DELETE FROM` — any predicate shape,
  * not just V2-source-filter-translatable ones; executes as the
  * deletion-vector metadata commit ([[Snapshots.deleteWhere]]). */
case class GraftDeleteFromTableCommand(
    root: String,
    condition: Column) extends LeafNode with Command {
  override def output: Seq[Attribute] = Nil
}

/** The analyzed face of a graft `MERGE INTO`: the source plan rides
  * RESOLVED (re-planned by the verb via its own QueryExecution); the
  * clauses carry rebound `t.`/`s.` columns. */
case class GraftMergeIntoCommand(
    root: String,
    source: LogicalPlan,
    on: Column,
    clauses: Seq[Snapshots.MergeClause]) extends LeafNode with Command {
  override def output: Seq[Attribute] = Nil
}

/** Plans the DML commands onto [[GraftDmlExec]]. */
object GraftDmlStrategy extends SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case GraftUpdateTableCommand(root, cond, assigns) =>
      GraftDmlExec("UPDATE", root, () => {
        Snapshots.updateWhere(SparkSession.active, root, cond, assigns)
        ()
      }) :: Nil
    case GraftDeleteFromTableCommand(root, cond) =>
      GraftDmlExec("DELETE FROM", root, () => {
        Snapshots.deleteWhere(SparkSession.active, root, cond)
        ()
      }) :: Nil
    case GraftMergeIntoCommand(root, source, on, clauses) =>
      GraftDmlExec("MERGE INTO", root, () => {
        val s = SparkSession.active
        Snapshots.mergeInto(s, root, GraftSqlShim.ofRows(s, source), on,
          clauses)
        ()
      }) :: Nil
    case _ => Nil
  }
}

/** Runs the verb exactly once (eager command execution calls
  * `executeCollect`; a stray `doExecute` reuses the same run). */
case class GraftDmlExec(
    verb: String,
    root: String,
    run: () => Unit) extends LeafExecNode {
  override def output: Seq[Attribute] = Nil
  @transient private lazy val done: Array[InternalRow] = { run(); Array.empty }
  override def executeCollect(): Array[InternalRow] = done
  override protected def doExecute(): RDD[InternalRow] = {
    done
    sparkContext.emptyRDD
  }
}
