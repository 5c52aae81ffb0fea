package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** 2-D skyline (Pareto frontier): the rows not dominated on a
  * (minimize, maximize) criteria pair — dominance meaning another row is
  * no worse on both and strictly better on at least one. The classic
  * multi-criteria "best offers" operator (Börzsönyi et al., ICDE 2001).
  *
  * The textbook formulation is a NOT EXISTS self-join — O(n²) and a
  * shuffle of the whole table against itself. For TWO criteria, sorted
  * by the minimized key, a row is on the frontier iff its maximized
  * value strictly beats the running max over all strictly-cheaper rows
  * (and equals the max within its exact-cost tie group — both-equal ties
  * are all kept, neither dominates). A single global sort would compute
  * that running max but funnels the corpus through one window task, so
  * this uses the repo's two-level prefix pattern (the
  * [[graft.functions.TextAnalysis]] `packByTokenBudget` shape): rows
  * bucket by `minCol div bucketWidth`, the running max decomposes into a
  * per-bucket window (parallel across buckets; RANGE to −1 keeps
  * "strictly cheaper" exact under cost ties) plus a prefix max over the
  * bucket aggregates — a frame with one row per non-empty bucket, the
  * only place a global window runs. Every earlier bucket holds strictly
  * cheaper rows by construction, so prefix max needs no tie handling.
  * Physical plan: one hash exchange per window family + a B-row level-2
  * window + one join back on the bucket id; no self-join at any scale.
  *
  * Criteria are caller-prepared integer columns (cents, sizes, epoch
  * micros), so the comparison arithmetic is exact and engine-portable;
  * to minimize both, pass `-maxCol` (negation preserves dominance —
  * maxed values must stay above Long.MinValue, the frame sentinel).
  * `bucketBits` sizes the level-2 frame: B ≈ (cost domain width) >>
  * bucketBits rows — pick it so B lands in the thousands. The bucket id
  * is an arithmetic shift, i.e. exact floor division by 2^bits even for
  * negative (negated) costs — a float division would silently misbucket
  * beyond 2^53. It affects only parallelism, never the result.
  */
object Skyline {

  /** Rows of `df` on the Pareto frontier of (minimize `minCol`,
    * maximize `maxCol`). The result is a filter of the input — no
    * columns added or dropped. */
  def frontier2(
      df: DataFrame,
      minCol: Column,
      maxCol: Column,
      bucketBits: Int = 20): DataFrame = {
    require(bucketBits >= 0 && bucketBits < 63, "bucketBits must be in [0, 63)")
    val reserved = Seq("__bkt", "__bl", "__bs", "__pm")
    require(!df.columns.exists(reserved.contains),
      s"input must not already carry ${reserved.mkString("/")} columns")
    val bucketed = df.withColumn("__bkt",
      shiftright(minCol.cast("long"), bucketBits))
    // level 1: within-bucket running max over strictly-cheaper rows,
    // and the max within the exact-cost tie group
    val inBucket = Window.partitionBy(col("__bkt")).orderBy(minCol)
      .rangeBetween(Window.unboundedPreceding, -1)
    val tieGroup = Window.partitionBy(minCol)
    // level 2: prefix max over per-bucket maxes (B rows — the only
    // global window, sized by bucketWidth, never by the corpus)
    val perBucket = bucketed.groupBy(col("__bkt"))
      .agg(max(maxCol).as("__bmax"))
    val prior = Window.orderBy(col("__bkt"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val prefix = perBucket
      .select(col("__bkt"), max(col("__bmax")).over(prior).as("__pm"))
    val best = greatest(
      coalesce(max(maxCol).over(inBucket), lit(Long.MinValue)),
      coalesce(col("__pm"), lit(Long.MinValue)))
    bucketed.join(prefix, Seq("__bkt"))
      .withColumn("__bl", best)
      .withColumn("__bs", max(maxCol).over(tieGroup))
      .filter(maxCol > col("__bl") && maxCol === col("__bs"))
      .drop("__bkt", "__bl", "__bs", "__pm")
  }
}
