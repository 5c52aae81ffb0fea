package graft.plans

import java.util.concurrent.ConcurrentHashMap

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.analysis.MultiInstanceRelation
import org.apache.spark.sql.catalyst.expressions.{Alias, Attribute, AttributeReference, Expression, IntegerLiteral, NamedExpression}
import org.apache.spark.sql.catalyst.expressions.aggregate.{AggregateExpression, AggregateFunction, Complete, Count, Max, Min, Sum}
import org.apache.spark.sql.catalyst.plans.logical.{Aggregate, Filter, LogicalPlan, Project, SubqueryAlias}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.execution.datasources.{HadoopFsRelation, LogicalRelation}
import org.apache.spark.sql.types.{IntegerType, LongType}

/** Materialized-view redirection for aggregate state frames — the read
  * half of the [[graft.operators.IncrementalAgg]] story. The write half
  * keeps a per-key (n_rows, sum_c, min_c, max_c) state table fresh by
  * algebraic merge; this Catalyst rule makes the state table actually
  * ABSORB the queries it answers: a plain `Aggregate` over the base
  * fact table is rewritten at optimization time into a re-aggregation
  * over the (orders-of-magnitude smaller) state frame, so dashboards
  * and rollup queries written against the 100-TB base never scan it.
  *
  * Soundness contract (each condition checked structurally; any miss
  * leaves the plan untouched — the rewrite is an optimization, never a
  * semantic gamble):
  *  - the aggregate's child is the registered base relation (same
  *    filesystem path), possibly under attribute-only projections and
  *    deterministic filters whose every reference is a bare MV KEY
  *    column (such predicates are constant within each state group, so
  *    they replay on the state frame verbatim — the WHERE/HAVING-on-key
  *    dashboard shape); a computed projection, or a filter touching any
  *    non-key column, disables the rewrite;
  *  - grouping keys are bare base columns and a SUBSET of the MV's
  *    keys (a strict subset rolls up: sums re-sum, mins re-min,
  *    maxes re-max, counts sum `n_rows` — the same monoid algebra the
  *    state frame is built on);
  *  - every aggregate is `count(1)`, `sum`, `min` or `max` of a bare
  *    base column tracked by the MV, non-DISTINCT, unfiltered, over an
  *    INTEGRAL column (re-summing doubles reorders IEEE addition; the
  *    state algebra is exact only over longs/ints, so only those
  *    rewrite);
  *  - each rewritten expression's type equals the original's (checked,
  *    not assumed), and output attribute ids are preserved so parent
  *    operators resolve unchanged.
  *
  * Freshness is the caller's contract, exactly as with any MV: register
  * after merging deltas, or deregister (or set
  * `spark.graft.mv.rewrite=false`) while maintenance runs — in
  * particular the MV-BUILD aggregate itself would match its own
  * registration, so build first, register second.
  *
  * Install via `spark.experimental.extraOptimizations` on a live
  * session ([[MvRewrite.install]]) or config-driven through
  * [[graft.GraftExtensions]] (`spark.sql.extensions`).
  */
object MvRewrite {

  /** One registered view: the MV's ANALYZED plan (re-instanced per use
    * so repeated rewrites in one query get fresh attribute ids) plus
    * the aggregation spec it materializes. */
  private[plans] final case class Entry(
      mvPlan: LogicalPlan,
      keys: Set[String],
      sums: Set[String],
      mins: Set[String],
      maxes: Set[String])

  /** Keyed by the base table's scheme-less filesystem path. */
  private val entries = new ConcurrentHashMap[String, Entry]()

  private def normalize(p: String): String = new Path(p).toUri.getPath

  /** Register `mvPath` (an [[graft.operators.IncrementalAgg.aggregate]]
    * state table) as the materialization of `basePath` grouped by
    * `keys`. Validates the MV schema carries every column the spec
    * names — a loud miss here beats a silent non-rewrite later. */
  def register(
      spark: SparkSession,
      basePath: String,
      mvPath: String,
      keys: Seq[String],
      sums: Seq[String] = Nil,
      mins: Seq[String] = Nil,
      maxes: Seq[String] = Nil): Unit = {
    require(keys.nonEmpty, "an MV needs at least one key")
    val mv = spark.read.parquet(mvPath)
    val expect = keys ++ Seq("n_rows") ++ sums.map("sum_" + _) ++
      mins.map("min_" + _) ++ maxes.map("max_" + _)
    val missing = expect.filterNot(mv.columns.contains)
    require(missing.isEmpty,
      s"MV at $mvPath lacks spec columns: ${missing.mkString(", ")}")
    entries.put(normalize(basePath),
      Entry(mv.queryExecution.analyzed, keys.toSet, sums.toSet,
        mins.toSet, maxes.toSet))
  }

  def deregister(basePath: String): Unit =
    entries.remove(normalize(basePath))

  def clear(): Unit = entries.clear()

  /** Idempotently add the rule to a live session's experimental
    * optimizer hooks (the post-optimization "User Provided Optimizers"
    * batch, where aggregates sit directly over pruned scans). */
  def install(spark: SparkSession): Unit = {
    val cur = spark.experimental.extraOptimizations
    if (!cur.contains(MvRewriteRule))
      spark.experimental.extraOptimizations = cur :+ MvRewriteRule
  }

  private[plans] def lookup(path: String): Option[Entry] =
    Option(entries.get(path))

  private[plans] def isEmpty: Boolean = entries.isEmpty
}

/** The rule itself — see [[MvRewrite]] for the contract. */
object MvRewriteRule extends Rule[LogicalPlan] {

  override def apply(plan: LogicalPlan): LogicalPlan =
    if (MvRewrite.isEmpty ||
      conf.getConfString("spark.graft.mv.rewrite", "true") != "true") plan
    else plan.transformUp {
      case agg: Aggregate => rewrite(agg).getOrElse(agg)
    }

  /** Integral-typed columns only: the state algebra is exact over
    * longs; re-summing floats would reorder IEEE addition. */
  private def integral(a: Attribute): Boolean = a.dataType match {
    case LongType | IntegerType => true
    case _ => false
  }

  /** Unwrap attribute-only projections / aliases down to the scanned
    * relation, COLLECTING the filter predicates passed on the way —
    * anything that computes disables the rewrite; whether the
    * collected filters are admissible (MV-key-only) is judged in
    * [[rebuild]], where the MV spec is in hand. By the time this rule
    * runs (post-optimization) a `WHERE k = …` or a pushed-down
    * `HAVING k = …` both sit as a Filter between the Aggregate and
    * the scan, so this is the shape real dashboard queries take. */
  private def baseRelation(
      p: LogicalPlan): Option[(LogicalRelation, Seq[Expression])] =
    p match {
      case r: LogicalRelation => Some((r, Nil))
      case SubqueryAlias(_, child) => baseRelation(child)
      case Project(ps, child) if ps.forall(_.isInstanceOf[AttributeReference]) =>
        baseRelation(child)
      case Filter(cond, child) =>
        baseRelation(child).map { case (r, cs) => (r, cond +: cs) }
      case _ => None
    }

  private def rootPath(r: LogicalRelation): Option[String] = r.relation match {
    case fs: HadoopFsRelation =>
      fs.location.rootPaths.headOption.map(_.toUri.getPath)
    case _ => None
  }

  private def ae(f: AggregateFunction): AggregateExpression =
    AggregateExpression(f, Complete, isDistinct = false)

  private def rewrite(agg: Aggregate): Option[LogicalPlan] = {
    for {
      (rel, filters) <- baseRelation(agg.child)
      path <- rootPath(rel)
      entry <- MvRewrite.lookup(path)
      plan <- rebuild(agg, entry, filters)
    } yield plan
  }

  private def rebuild(
      agg: Aggregate,
      e: MvRewrite.Entry,
      filters: Seq[Expression]): Option[LogicalPlan] = {
    // grouping keys: bare, tracked, a subset of the MV's key set
    val gAttrs = agg.groupingExpressions.map {
      case a: AttributeReference if e.keys.contains(a.name) => a
      case _ => return None
    }
    // filters between the aggregate and the scan rewrite iff every
    // reference is a bare MV KEY column (not merely a query grouping
    // key): a row-level predicate over key columns is constant within
    // each state group — NULL keys included, since grouping collapses
    // them into one group sharing the key value — so filtering state
    // rows keeps exactly the base rows the original filter kept, and
    // the monoid rollup is unchanged. Non-determinism or a subquery in
    // the predicate refuses (rand() must keep its per-row semantics; a
    // subquery's cardinality is not the state frame's).
    filters.foreach { cond =>
      if (!cond.deterministic) return None
      if (cond.exists(_.isInstanceOf[
        org.apache.spark.sql.catalyst.expressions.PlanExpression[_]]))
        return None
      cond.references.foreach { a =>
        if (!e.keys.contains(a.name)) return None
      }
    }
    // fresh MV attribute ids per rewrite site
    val mv = e.mvPlan.transform {
      case m: MultiInstanceRelation with LogicalPlan => m.newInstance()
    }
    val mvAttr = mv.output.map(a => a.name -> a).toMap
    val rewritten = agg.aggregateExpressions.map {
      case a: AttributeReference if e.keys.contains(a.name) =>
        Alias(mvAttr(a.name), a.name)(a.exprId, a.qualifier)
      case al @ Alias(AggregateExpression(f, Complete, false, None, _), name) =>
        val replaced: Expression = f match {
          case Count(Seq(IntegerLiteral(1))) => ae(Sum(mvAttr("n_rows")))
          case s: Sum => s.child match {
            case c: AttributeReference
              if e.sums.contains(c.name) && integral(c) =>
              ae(Sum(mvAttr(s"sum_${c.name}")))
            case _ => return None
          }
          case Min(c: AttributeReference)
            if e.mins.contains(c.name) && integral(c) =>
            ae(Min(mvAttr(s"min_${c.name}")))
          case Max(c: AttributeReference)
            if e.maxes.contains(c.name) && integral(c) =>
            ae(Max(mvAttr(s"max_${c.name}")))
          case _ => return None
        }
        // type parity is part of the soundness contract
        if (replaced.dataType != al.dataType) return None
        Alias(replaced, name)(al.exprId, al.qualifier)
      case _ => return None
    }
    // replay the admitted key-only filters on the state frame, each
    // base key attribute remapped to its MV column — with type parity
    // checked per reference, as for the aggregates
    val mvChild =
      if (filters.isEmpty) mv
      else {
        val remapped = filters.map { cond =>
          cond.transform {
            case a: AttributeReference =>
              val m = mvAttr(a.name)
              if (m.dataType != a.dataType) return None
              m
          }
        }
        Filter(remapped.reduce(org.apache.spark.sql.catalyst.expressions.And),
          mv)
      }
    Some(Aggregate(gAttrs.map(a => mvAttr(a.name)),
      rewritten.asInstanceOf[Seq[NamedExpression]], mvChild))
  }
}
