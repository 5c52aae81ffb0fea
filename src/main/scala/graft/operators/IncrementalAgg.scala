package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Algebraic partial-aggregate maintenance: keep a per-key aggregate
  * STATE (counts, sums, mins, maxes — all commutative monoids, the same
  * algebra Spark's own partial aggregation exploits map-side) and fold
  * new delta batches into it WITHOUT rescanning the base data. This is
  * the daily-rollup pattern at 100 TB: the stored state is keys × a few
  * longs (orders of magnitude smaller than the raw corpus), the delta is
  * one day's slice, and the merge shuffles only the two state frames —
  * the raw history is never re-read. The reference recomputes its counts
  * from scratch each run (`BatchUpdate.py:781-804`); this operator is
  * the incremental form of that aggregate.
  *
  * Contract: `merge(aggregate(a), aggregate(b)) == aggregate(a ∪ b)`
  * exactly — counts/sums are longs (callers pre-convert money to integer
  * cents), so the algebra is associative and order-independent with no
  * float drift; the oracle checks the merged state against a full
  * recompute bit-for-bit. Averages and other ratios are DERIVED views
  * over (sum, count) at read time — never stored, so they stay exact
  * under merging.
  *
  * Both steps are single map-side-combinable hash aggregations on the
  * key; `merge` is a union of two already-small state frames followed by
  * one more. Nothing here is streaming-specific — the same state frame
  * can absorb deltas from a batch backfill and a structured-streaming
  * sink alike.
  */
object IncrementalAgg {

  /** Collapse raw rows to per-key aggregate state: `n_rows` plus
    * `sum_<c>` / `min_<c>` / `max_<c>` for each listed column. */
  def aggregate(
      df: DataFrame,
      keys: Seq[String],
      sums: Seq[String],
      mins: Seq[String] = Nil,
      maxes: Seq[String] = Nil): DataFrame = {
    require(keys.nonEmpty, "aggregate needs at least one key column")
    val aggs =
      sums.map(c => sum(col(c)).as(s"sum_$c")) ++
        mins.map(c => min(col(c)).as(s"min_$c")) ++
        maxes.map(c => max(col(c)).as(s"max_$c"))
    df.groupBy(keys.map(col): _*)
      .agg(count(lit(1)).as("n_rows"), aggs: _*)
  }

  /** Fold two state frames (both [[aggregate]]-shaped over the same
    * spec) into one: counts and sums add, mins/maxes combine — keys
    * present in only one side pass through. */
  def merge(
      base: DataFrame,
      delta: DataFrame,
      keys: Seq[String],
      sums: Seq[String],
      mins: Seq[String] = Nil,
      maxes: Seq[String] = Nil): DataFrame = {
    require(base.columns.sameElements(delta.columns),
      "base and delta state frames must share the same schema")
    // the spec must COVER the state schema — a narrower spec would
    // silently drop state columns from the merged output
    val expected = keys ++ Seq("n_rows") ++ sums.map("sum_" + _) ++
      mins.map("min_" + _) ++ maxes.map("max_" + _)
    require(base.columns.sorted.sameElements(expected.sorted.distinct),
      s"merge spec covers [${expected.mkString(", ")}] but the state " +
        s"frames carry [${base.columns.mkString(", ")}]")
    val aggs =
      sums.map(c => sum(col(s"sum_$c")).as(s"sum_$c")) ++
        mins.map(c => min(col(s"min_$c")).as(s"min_$c")) ++
        maxes.map(c => max(col(s"max_$c")).as(s"max_$c"))
    base.union(delta)
      .groupBy(keys.map(col): _*)
      .agg(sum(col("n_rows")).as("n_rows"), aggs: _*)
  }
}
