package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Algebraic partial-aggregate maintenance: keep a per-key aggregate
  * STATE (counts, sums, sums-of-squares, mins, maxes — all commutative
  * monoids, the same algebra Spark's own partial aggregation exploits
  * map-side) and fold new delta batches into it WITHOUT rescanning the
  * base data. This is the daily-rollup pattern at 100 TB: the stored
  * state is keys × a few numbers (orders of magnitude smaller than the
  * raw corpus), the delta is one day's slice, and the merge shuffles
  * only the two state frames — the raw history is never re-read. The
  * reference recomputes its counts from scratch each run
  * (`BatchUpdate.py:781-804`); this operator is the incremental form of
  * that aggregate.
  *
  * Contract: `merge(aggregate(a), aggregate(b)) == aggregate(a ∪ b)`
  * exactly — counts/sums are longs (callers pre-convert money to integer
  * cents) and sums-of-squares are DECIMAL(38,0) (a long×long product
  * sum overflows int64 at corpus scale; exact decimal keeps the algebra
  * associative with zero float drift), so merged state matches a full
  * recompute bit-for-bit and the oracle checks exactly that. Averages,
  * variances and other ratios are DERIVED views over the state at read
  * time ([[derived]]) — never stored, so they stay exact under merging.
  *
  * **Append-only contract (min/max):** the state supports INSERTS only.
  * Counts and sums could absorb retractions as negative deltas, but
  * `min`/`max` are NOT invertible — deleting the current extremum would
  * need the full history to find the runner-up, which is exactly the
  * rescan this operator exists to avoid. Feed only append deltas; for
  * updates/deletes, route through [[Changes.cdcApply]] first and
  * recompute the affected keys.
  *
  * Both steps are single map-side-combinable hash aggregations on the
  * key; `merge` is a union of two already-small state frames followed by
  * one more. Nothing here is streaming-specific — the same state frame
  * can absorb deltas from a batch backfill and a structured-streaming
  * sink alike.
  */
object IncrementalAgg {

  /** Collapse raw rows to per-key aggregate state: `n_rows` plus
    * `sum_<c>` / `min_<c>` / `max_<c>` / `sumsq_<c>` for each listed
    * column. `sumsqs` columns must be integral (cast to long): the
    * square is taken in DECIMAL(19,0)×DECIMAL(19,0) so the product and
    * its running sum stay exact out to 10³⁸ — ANSI mode makes a true
    * overflow loud, never a silent wrap. */
  def aggregate(
      df: DataFrame,
      keys: Seq[String],
      sums: Seq[String],
      mins: Seq[String] = Nil,
      maxes: Seq[String] = Nil,
      sumsqs: Seq[String] = Nil): DataFrame = {
    require(keys.nonEmpty, "aggregate needs at least one key column")
    val aggs =
      sums.map(c => sum(col(c)).as(s"sum_$c")) ++
        mins.map(c => min(col(c)).as(s"min_$c")) ++
        maxes.map(c => max(col(c)).as(s"max_$c")) ++
        sumsqs.map { c =>
          val d = col(c).cast("long").cast("decimal(19,0)")
          sum(d * d).as(s"sumsq_$c")
        }
    df.groupBy(keys.map(col): _*)
      .agg(count(lit(1)).as("n_rows"), aggs: _*)
  }

  /** Fold two state frames (both [[aggregate]]-shaped over the same
    * spec) into one: counts, sums and sums-of-squares add, mins/maxes
    * combine — keys present in only one side pass through. */
  def merge(
      base: DataFrame,
      delta: DataFrame,
      keys: Seq[String],
      sums: Seq[String],
      mins: Seq[String] = Nil,
      maxes: Seq[String] = Nil,
      sumsqs: Seq[String] = Nil): DataFrame = {
    require(base.columns.sameElements(delta.columns),
      "base and delta state frames must share the same schema")
    // the spec must COVER the state schema — a narrower spec would
    // silently drop state columns from the merged output
    val expected = keys ++ Seq("n_rows") ++ sums.map("sum_" + _) ++
      mins.map("min_" + _) ++ maxes.map("max_" + _) ++
      sumsqs.map("sumsq_" + _)
    require(base.columns.sorted.sameElements(expected.sorted.distinct),
      s"merge spec covers [${expected.mkString(", ")}] but the state " +
        s"frames carry [${base.columns.mkString(", ")}]")
    val aggs =
      sums.map(c => sum(col(s"sum_$c")).as(s"sum_$c")) ++
        mins.map(c => min(col(s"min_$c")).as(s"min_$c")) ++
        maxes.map(c => max(col(s"max_$c")).as(s"max_$c")) ++
        sumsqs.map(c => sum(col(s"sumsq_$c"))
          .cast("decimal(38,0)").as(s"sumsq_$c"))
    base.union(delta)
      .groupBy(keys.map(col): _*)
      .agg(sum(col("n_rows")).as("n_rows"), aggs: _*)
  }

  /** Targeted repair for NON-append changes — the escape hatch the
    * append-only contract (object doc) points at. Given the CURRENT
    * state and the full corrected history OF THE AFFECTED KEYS ONLY,
    * rebuild those keys' rows and splice them in: unaffected keys keep
    * their state untouched (anti-join pass-through), affected keys are
    * re-aggregated from scratch — min/max included, which no algebraic
    * merge could retract.
    *
    * The 100-TB contract: `affectedHistory` covers a tiny key fraction
    * (an upstream correction, a late-data backfill, a GDPR erasure) and
    * is fetched via partition/cluster pruning on the key — the full
    * corpus is never re-read, and the splice shuffles only the state
    * frame plus the affected slice. Keys present in the history but not
    * the state simply appear (same as a merge); keys in neither are
    * untouched. The affected-key set is taken FROM the history frame
    * (a key with zero history rows produces no rebuilt row and is
    * therefore NOT touched); deleting a key outright is the caller's
    * one-liner `state.join(deletions, keys, "left_anti")`. */
  def reaggregateKeys(
      state: DataFrame,
      affectedHistory: DataFrame,
      keys: Seq[String],
      sums: Seq[String],
      mins: Seq[String] = Nil,
      maxes: Seq[String] = Nil,
      sumsqs: Seq[String] = Nil): DataFrame = {
    val rebuilt = aggregate(affectedHistory, keys, sums, mins, maxes, sumsqs)
    require(state.columns.sameElements(rebuilt.columns),
      s"state schema [${state.columns.mkString(", ")}] does not match " +
        s"the rebuild spec's [${rebuilt.columns.mkString(", ")}]")
    state.join(rebuilt.select(keys.map(col): _*), keys, "left_anti")
      .unionByName(rebuilt)
  }

  /** Persist a state frame as a parquet table — the artifact side of the
    * daily-rollup story (the [[graft.functions.Similarity.saveCodebooks]]
    * pattern applied to aggregate state): the trainer/backfill job writes
    * keys × a few numbers once, and every later merge/rekey/read job
    * starts from the RELOADED artifact instead of re-scanning raw
    * history. Longs and DECIMAL(38,0) both round-trip parquet exactly
    * (fixed-point physical encodings, no float re-parse), so a reloaded
    * state merges bit-identically to the in-memory frame it was written
    * from — [[IncrementalAggSpec]] pins that equality. The write keeps
    * the state's natural partitioning; at 100 TB the state frame is
    * orders of magnitude smaller than the corpus, so this is a small,
    * key-hashed table, not a data lake. */
  def saveState(state: DataFrame, path: String): Unit =
    state.write.mode("overwrite").parquet(path)

  /** Load [[saveState]] output, validated against the caller's spec the
    * way [[merge]] validates its frames: a state table whose columns
    * don't cover the spec fails LOUDLY at load (a schema drift between
    * the writer job and a later reader is an operational error, not a
    * silent column drop). Columns are re-selected in canonical spec
    * order so the reload composes with [[merge]]'s positional
    * schema check regardless of on-disk column order. */
  def loadState(
      spark: SparkSession,
      path: String,
      keys: Seq[String],
      sums: Seq[String],
      mins: Seq[String] = Nil,
      maxes: Seq[String] = Nil,
      sumsqs: Seq[String] = Nil): DataFrame = {
    val expected = keys ++ Seq("n_rows") ++ sums.map("sum_" + _) ++
      mins.map("min_" + _) ++ maxes.map("max_" + _) ++
      sumsqs.map("sumsq_" + _)
    val df = spark.read.parquet(path)
    require(df.columns.sorted.sameElements(expected.sorted.distinct),
      s"state at $path carries [${df.columns.mkString(", ")}] but the " +
        s"spec expects [${expected.mkString(", ")}]")
    df.select(expected.map(col): _*)
  }

  /** Read-time DERIVED view over a state frame: `avg_<c>` for each
    * `avgs` column (needs `sum_<c>`), `var_<c>` — POPULATION variance —
    * for each `vars` column (needs `sum_<c>` and `sumsq_<c>`). Never
    * stored: ratios don't merge, their numerators/denominators do.
    *
    * Determinism: the variance numerator `n·Σx² − (Σx)²` is computed in
    * exact decimal (no float cancellation — the textbook two-float
    * version loses catastrophically when mean ≫ stddev), then ONE cast
    * to double and ONE IEEE division by n² — the same recipe the oracle
    * replays, so values are bit-identical cross-engine. */
  def derived(
      state: DataFrame,
      avgs: Seq[String] = Nil,
      vars: Seq[String] = Nil): DataFrame = {
    val withAvg = avgs.foldLeft(state) { (d, c) =>
      d.withColumn(s"avg_$c",
        col(s"sum_$c").cast("double") / col("n_rows").cast("double"))
    }
    vars.foldLeft(withAvg) { (d, c) =>
      val s = col(s"sum_$c").cast("decimal(19,0)")
      val num = col("n_rows").cast("decimal(19,0)") * col(s"sumsq_$c") -
        s * s
      d.withColumn(s"var_$c",
        num.cast("double") /
          (col("n_rows").cast("double") * col("n_rows").cast("double")))
    }
  }
}
