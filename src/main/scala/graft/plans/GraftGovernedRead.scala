package graft.plans

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.expressions.Alias
import org.apache.spark.sql.catalyst.plans.logical._
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.execution.datasources.v2.DataSourceV2Relation

import graft.operators.Snapshots
import graft.sources.v2.GraftSnapshotTable

/** SQL reads over GOVERNED snapshot faces — the analyzer rule that
  * makes `SELECT * FROM graft.t` work right after `DELETE FROM graft.t`
  * (a deletion-vector commit) with no `CALL system.optimize`, the way
  * Delta and Iceberg serve their merge-on-read faces directly.
  *
  * A [[GraftSnapshotTable]] whose face carries live deletion vectors, a
  * column mapping, or a multi-root partition layout cannot be served by
  * the plain file-list parquet scan (it would resurrect deleted rows,
  * surface physical names, or mis-build the partition column), so its
  * `toBatch` refuses. This rule substitutes, in READ position only, the
  * relation with the ANALYZED plan of
  * [[Snapshots.readAsOf]] — whose clean/dirty split plans the files no
  * DV touches through a stock parquet relation (file-exact, filters and
  * pruning push down as ever) and anti-joins the DV frame against only
  * the dirty files. The substitution happens at analysis, so Catalyst
  * optimizes straight through it: predicate pushdown and column pruning
  * reach the underlying parquet scans of both legs.
  *
  * DML targets are exempt (collected by reference before the
  * transform): `DELETE FROM` / `UPDATE` / `MERGE INTO` / `INSERT` plan
  * against the original relation, whose verbs own the DV/mapping
  * composition — only true read occurrences rewrite. Equality-delete
  * (merge-on-read) governance keeps refusing at `toBatch`: its face
  * needs key columns the catalog does not carry
  * ([[Snapshots.readMorAsOf]] / `foldEqDeletes` are the route). The
  * `toBatch` refusal itself also stays, as the backstop for sessions
  * built WITHOUT [[graft.GraftExtensions]]. */
object GraftGovernedReadRule extends Rule[LogicalPlan] {

  override def apply(plan: LogicalPlan): LogicalPlan = {
    val governed = plan.collect {
      case r: DataSourceV2Relation
        if r.table.isInstanceOf[GraftSnapshotTable] &&
          r.table.asInstanceOf[GraftSnapshotTable].needsResolvedRead => r
    }
    if (governed.isEmpty) return plan
    // WRITE/DML-position relations, by reference — a MERGE whose source
    // reads the same governed table still rewrites the source leg while
    // the target leg stays verb-owned
    val dmlTargets: Seq[LogicalPlan] = plan.collect {
      case a: AppendData => a.table
      case o: OverwriteByExpression => o.table
      case o: OverwritePartitionsDynamic => o.table
      case d: DeleteFromTable => d.table
      case u: UpdateTable => u.table
      case m: MergeIntoTable => m.targetTable
      case i: InsertIntoStatement => i.table
    }
    val exempt = dmlTargets.flatMap(_.collect {
      case r: DataSourceV2Relation => r
    })
    val spark = SparkSession.active
    plan.transformUp {
      case r: DataSourceV2Relation
        if r.table.isInstanceOf[GraftSnapshotTable] &&
          r.table.asInstanceOf[GraftSnapshotTable].needsResolvedRead &&
          !exempt.exists(_ eq r) =>
        val t = r.table.asInstanceOf[GraftSnapshotTable]
        val resolved = Snapshots
          .readAsOf(spark, t.snapshotRoot, t.snapshotVersion)
          .queryExecution.analyzed
        val byName = resolved.output.map(a => a.name -> a).toMap
        val aligned = r.output.forall(o =>
          byName.get(o.name).exists(a =>
            org.apache.spark.sql.types.DataType
              .equalsIgnoreNullability(a.dataType, o.dataType)))
        // a face whose resolved read surfaces different columns than
        // the catalog schema (shouldn't happen; belt-and-braces) keeps
        // the loud toBatch refusal instead of a silently-wrong rebind
        if (!aligned) r
        else Project(r.output.map(o =>
          Alias(byName(o.name), o.name)(exprId = o.exprId)), resolved)
    }
  }
}
