package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Temporal joins the reference (a pure batch file processor) has no
  * equivalent for, but any event-data pipeline needs: backward as-of join
  * and bounded range join. Both are built from shuffle-once primitives —
  * no per-row subqueries, no unbounded theta joins.
  */
object TemporalJoin {

  /** Backward as-of join: for every left row, attach the value columns of
    * the most recent right row with `right.ts <= left.ts` in the same key
    * group (nulls when no such row). The join every "latest dimension
    * state at event time" lookup wants.
    *
    * Shape chosen for scale — the UNION-WINDOW formulation: tag the two
    * inputs, union them, and run one `last(_, ignoreNulls)` window per
    * value column ordered by (ts, side). Costs exactly ONE shuffle+sort
    * on (keys, ts) of the combined input. The alternatives all collapse
    * at scale: an equi-join on key with a per-pair timestamp filter
    * explodes to the full per-key cross product before filtering, and a
    * "max timestamp per left row" correlated aggregation is two joins
    * plus a shuffle each. Right rows sort BEFORE left rows at equal
    * timestamps (side 0 < 1), giving inclusive `<=` semantics.
    *
    * The right side must be unique per (keys, ts) — with duplicates "the"
    * most recent row is ambiguous and engines would disagree; callers
    * pre-aggregate (the natural place to decide survivorship) rather than
    * have this operator pick silently.
    *
    * Output: all left columns plus each value column as
    * `<prefix><valueCol>` and the matched right timestamp as
    * `<prefix><rightTsCol>`. */
  def asofBackward(
      left: DataFrame,
      right: DataFrame,
      keyCols: Seq[String],
      leftTsCol: String,
      rightTsCol: String,
      valueCols: Seq[String],
      prefix: String = "asof_"): DataFrame = {
    require(keyCols.nonEmpty, "as-of join requires at least one key column")
    val outVals = valueCols.map(prefix + _) :+ (prefix + rightTsCol)
    val l = left
      .withColumn("__ts", col(leftTsCol))
      .withColumn("__side", lit(1))
    val r = right.select(
      keyCols.map(col) ++
        Seq(col(rightTsCol).as("__ts"), lit(0).as("__side"),
          col(rightTsCol).as(prefix + rightTsCol)) ++
        valueCols.map(v => col(v).as(prefix + v)): _*)
    val w = Window.partitionBy(keyCols.map(col): _*)
      .orderBy(col("__ts"), col("__side"))
      .rowsBetween(Window.unboundedPreceding, 0)
    val filled = outVals.foldLeft(l.unionByName(r, allowMissingColumns = true)) {
      case (df, v) => df.withColumn(v, last(col(v), ignoreNulls = true).over(w))
    }
    filled.filter(col("__side") === 1).drop("__ts", "__side")
  }

  /** Forward as-of join: for every left row, attach the value columns of
    * the EARLIEST right row with `right.ts >= left.ts` in the same key
    * group (nulls when no such row) — "the next reading after t". The
    * mirror of [[asofBackward]] and the same union-window shape: ONE
    * shuffle+sort on (keys, ts), a `first(_, ignoreNulls)` window over
    * the frame [current row, unbounded following]. Left rows sort BEFORE
    * right rows at equal timestamps (side 0 < 1), so a right row at
    * exactly `left.ts` is inside the frame — inclusive `>=` semantics.
    * Same right-side uniqueness contract as [[asofBackward]]. */
  def asofForward(
      left: DataFrame,
      right: DataFrame,
      keyCols: Seq[String],
      leftTsCol: String,
      rightTsCol: String,
      valueCols: Seq[String],
      prefix: String = "asof_"): DataFrame = {
    require(keyCols.nonEmpty, "as-of join requires at least one key column")
    val outVals = valueCols.map(prefix + _) :+ (prefix + rightTsCol)
    val l = left
      .withColumn("__ts", col(leftTsCol))
      .withColumn("__side", lit(0))
    val r = right.select(
      keyCols.map(col) ++
        Seq(col(rightTsCol).as("__ts"), lit(1).as("__side"),
          col(rightTsCol).as(prefix + rightTsCol)) ++
        valueCols.map(v => col(v).as(prefix + v)): _*)
    val w = Window.partitionBy(keyCols.map(col): _*)
      .orderBy(col("__ts"), col("__side"))
      .rowsBetween(0, Window.unboundedFollowing)
    val filled = outVals.foldLeft(l.unionByName(r, allowMissingColumns = true)) {
      case (df, v) => df.withColumn(v, first(col(v), ignoreNulls = true).over(w))
    }
    filled.filter(col("__side") === 0).drop("__ts", "__side")
  }

  /** Tolerance-bounded backward as-of join: [[asofBackward]] with a cap —
    * the match must lie within `maxLag` of the left timestamp ("most
    * recent reading within N minutes"). Stale matches beyond the cap are
    * nulled out, left rows always survive.
    *
    * Implemented as a post-pass over the union-window result, NOT a
    * different join shape: the most recent right row is the ONLY
    * backward candidate, so "most recent within tolerance" is exactly
    * "most recent overall, nulled when older than the cap". Costs zero
    * extra shuffles over the unbounded variant.
    *
    * `lagOf` maps (leftTs, matchedRightTs) to a comparable lag so the
    * operator stays agnostic to the timestamp type; `maxLag` is in the
    * same units. E.g. for epoch-micros longs: `(l, r) => l - r` with
    * `maxLag = lit(30*60*1000000L)`. */
  def asofBackwardTolerant(
      left: DataFrame,
      right: DataFrame,
      keyCols: Seq[String],
      leftTsCol: String,
      rightTsCol: String,
      valueCols: Seq[String],
      lagOf: (Column, Column) => Column,
      maxLag: Column,
      prefix: String = "asof_"): DataFrame = {
    val joined = asofBackward(
      left, right, keyCols, leftTsCol, rightTsCol, valueCols, prefix)
    val matchedTs = col(prefix + rightTsCol)
    val inRange = matchedTs.isNotNull &&
      lagOf(col(leftTsCol), matchedTs) <= maxLag
    (valueCols.map(prefix + _) :+ (prefix + rightTsCol)).foldLeft(joined) {
      case (df, v) => df.withColumn(v, when(inRange, col(v)))
    }
  }

  /** Bounded range join: every (left, right) pair in the same key group
    * with `|left.ts − right.ts| <= rangeMicros` (timestamps in epoch
    * micros as longs). Powers proximity features ("events within 30
    * minutes of a signup").
    *
    * Shape chosen for scale — interval bucketing: left rows key on their
    * `ts div range` bucket, right rows replicate to their bucket ±1, and
    * the pair space shrinks from the full per-key cross product to the
    * candidates in adjacent buckets, followed by the exact distance
    * filter. Each qualifying pair matches exactly once (the left bucket
    * picks out exactly one of the right row's three replicas), so no
    * dedup pass is needed. Replication factor is a fixed 3× of the
    * (narrow) right projection — independent of data size; per-bucket
    * skew follows event-time hotspots and shares the salting story of any
    * keyed join (`Skew`). */
  def rangeJoinBucketed(
      left: DataFrame,
      right: DataFrame,
      keyCols: Seq[String],
      leftTsUsCol: String,
      rightTsUsCol: String,
      rangeMicros: Long,
      valueCols: Seq[String],
      prefix: String = "r_"): DataFrame = {
    require(rangeMicros > 0, "rangeMicros must be positive")
    val l = left.withColumn("__b", expr(s"$leftTsUsCol div $rangeMicros"))
    val r = right.select(
      keyCols.map(col) ++ Seq(col(rightTsUsCol).as("__rts")) ++
        valueCols.map(v => col(v).as(prefix + v)): _*)
      .withColumn("__b",
        explode(array(Seq(-1L, 0L, 1L).map(d =>
          expr(s"__rts div $rangeMicros") + lit(d)): _*)))
    l.join(r, keyCols :+ "__b")
      .filter(abs(col(leftTsUsCol) - col("__rts")) <= rangeMicros)
      .withColumnRenamed("__rts", prefix + rightTsUsCol)
      .drop("__b")
  }

  /** Interval × interval OVERLAP join — the genomics/"sessions ×
    * campaign windows" shape [[rangeJoinBucketed]]'s point-to-point
    * form cannot express: emit every (left, right) pair of same-key
    * half-open intervals with `ls < re && rs < le`. The naive plan is a
    * per-key cross join with a range predicate — quadratic in the hot
    * key. Here each interval explodes to the fixed-width buckets it
    * covers (`⌊s/W⌋ .. ⌊(e−1)/W⌋`), the join runs EQUI on (key,
    * bucket), and the exact predicate clears bucket-collision false
    * positives; two overlapping intervals share the bucket of any
    * point in their intersection, so no pair is lost. Pairs spanning
    * several common buckets are emitted EXACTLY ONCE — only the row
    * whose join bucket is the pair's FIRST common bucket
    * `max(⌊ls/W⌋, ⌊rs/W⌋)` survives (the later-starting interval's
    * first bucket: both sides cover it, and no earlier bucket is
    * common) — so no `distinct()` and no extra exchange of the full
    * joined row ever runs; dedup is a filter decided from the two
    * start columns already on the row.
    *
    * `bucketMicros` tunes the explode-vs-bucket-width trade: ~ the
    * typical interval length keeps the per-interval fan-out at one or
    * two rows while buckets stay selective. Column names of the two
    * sides must be disjoint apart from `keyCols` (rename before the
    * call — the output carries both sides' columns verbatim). */
  def intervalOverlapJoin(
      left: DataFrame,
      right: DataFrame,
      keyCols: Seq[String],
      leftStartCol: String,
      leftEndCol: String,
      rightStartCol: String,
      rightEndCol: String,
      bucketMicros: Long): DataFrame = {
    require(bucketMicros > 0, "bucketMicros must be positive")
    def bucketed(df: DataFrame, s: String, e: String) =
      df.withColumn("__b", explode(sequence(
        expr(s"$s div $bucketMicros"),
        expr(s"($e - 1) div $bucketMicros"))))
    bucketed(left, leftStartCol, leftEndCol)
      .join(bucketed(right, rightStartCol, rightEndCol), keyCols :+ "__b")
      .filter(col(leftStartCol) < col(rightEndCol) &&
        col(rightStartCol) < col(leftEndCol))
      .filter(col("__b") === greatest(
        expr(s"$leftStartCol div $bucketMicros"),
        expr(s"$rightStartCol div $bucketMicros")))
      .drop("__b")
  }
}
