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
  * An EQUALITY-DELETE (merge-on-read) face substitutes
  * [[Snapshots.readMorAsOf]] instead — the tombstone key set reads
  * off the newest live sidecar (one key set per lineage is
  * commit-enforced, so any sidecar's columns speak for all), which is
  * how a SQL user reads the table a CDC stream is upserting into with
  * no fold in between. A face the resolved read itself refuses (a
  * fold-expired history window, a mid-lineage foreign commit) keeps
  * the loud `toBatch` refusal.
  *
  * DML targets are exempt (collected by reference before the
  * transform): `DELETE FROM` / `UPDATE` / `MERGE INTO` / `INSERT` plan
  * against the original relation, whose verbs own the DV/mapping/MOR
  * composition — only true read occurrences rewrite. The `toBatch`
  * refusal itself also stays, as the backstop for sessions built
  * WITHOUT [[graft.GraftExtensions]]. */
object GraftGovernedReadRule extends Rule[LogicalPlan] {

  private def servable(t: GraftSnapshotTable): Boolean =
    t.needsResolvedRead || t.isEqGoverned

  override def apply(plan: LogicalPlan): LogicalPlan = {
    val governed = plan.collect {
      case r: DataSourceV2Relation
        if r.table.isInstanceOf[GraftSnapshotTable] &&
          servable(r.table.asInstanceOf[GraftSnapshotTable]) => r
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
          servable(r.table.asInstanceOf[GraftSnapshotTable]) &&
          !exempt.exists(_ eq r) =>
        val t = r.table.asInstanceOf[GraftSnapshotTable]
        // a face the resolved read itself refuses (fold-expired
        // window, foreign mid-lineage commit) keeps the loud toBatch
        // refusal rather than failing analysis with a stack. ONLY the
        // refusal types degrade — a genuine IO/listing failure must
        // propagate, or the toBatch message ('deletion vectors' /
        // 'equality-delete') would misdiagnose the real fault
        val resolved =
          try {
            val df =
              if (t.isEqGoverned)
                Snapshots.readMorAsOf(spark, t.snapshotRoot,
                  t.snapshotVersion,
                  Snapshots.eqLiveKeyCols(spark, t.snapshotRoot)
                    .getOrElse(throw new IllegalStateException(
                      "eq-governed face with no live sidecar")))
              else Snapshots.readAsOf(spark, t.snapshotRoot,
                t.snapshotVersion)
            Some(df.queryExecution.analyzed)
          } catch {
            case _: IllegalArgumentException => None
            case _: IllegalStateException => None
          }
        val substituted = resolved.flatMap { res =>
          val byName = res.output.map(a => a.name -> a).toMap
          val aligned = r.output.forall(o =>
            byName.get(o.name).exists(a =>
              org.apache.spark.sql.types.DataType
                .equalsIgnoreNullability(a.dataType, o.dataType)))
          // a resolved read surfacing different columns than the
          // catalog schema (shouldn't happen; belt-and-braces) keeps
          // the loud refusal instead of a silently-wrong rebind
          if (!aligned) None
          else Some(Project(r.output.map(o =>
            Alias(byName(o.name), o.name)(exprId = o.exprId)), res))
        }
        substituted.getOrElse(r)
    }
  }
}
