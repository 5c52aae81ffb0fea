package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Robust per-group outlier detection: flag rows whose value deviates
  * from the group MEDIAN by more than `k` times the group MAD (median
  * absolute deviation) — the data-cleaning staple for corrupt sensor
  * readings, fat-finger transactions, and scraper glitches. Median/MAD
  * is the robust twin of mean/σ: a z-score's mean and variance are
  * themselves dragged by the outliers being hunted (one 1000× row
  * inflates σ enough to mask everything else), while the 50th percentile
  * ignores them entirely — and it needs no sqrt/exp, keeping the whole
  * computation inside the engine's exact-arithmetic envelope
  * (percentile interpolation over integer-valued inputs is a dyadic
  * multiply-add; the deviation threshold is one multiply — both
  * bit-identical across engines, unlike a σ's libm sqrt).
  *
  * Shape at scale: two map-side-combinable percentile aggregations on
  * the group key (exact here; at 100 TB per-group sort buffers argue for
  * `approx_percentile`, the same exact-vs-sketch trade documented on
  * `TextAnalysis.lengthQuantiles`) with the raw frame re-joined on that
  * same key — three exchanges on one partitioning, no window over the
  * full event stream. This is NOT the row-scale-window-on-a-bare-group-
  * key shape `ev_median_mad` had to shed: Spark's `Percentile` buffer
  * is itself a counts-by-value map (distinct-value-sized, merged
  * map-side), so a group's reducer state scales with its value DOMAIN,
  * not its row count — the count-by-value trick is already inside the
  * aggregate. The residual risk is the in-memory per-group hashmap on
  * a huge continuous domain, which is exactly when the
  * `approx_percentile` trade above applies. Groups smaller than `minRows` are not scored
  * (their median is noise); constant-history groups (MAD = 0) flag ANY
  * deviation, which is the behavior you want for "this meter always
  * reads 50".
  */
object Anomaly {

  /** @param k       deviation multiplier (3.0 ≈ the classic 3σ posture)
    * @param minRows  smallest group size worth scoring
    * @return the flagged rows with `med`, `mad`, `dev` appended. */
  def madOutliers(
      df: DataFrame,
      valueCol: String,
      groupCols: Seq[String],
      k: Double = 3.0,
      minRows: Long = 5L): DataFrame =
    applyMadThresholds(df,
      madThresholds(df, valueCol, groupCols, minRows, materialize = false),
      valueCol, k)

  /** The TRAINED form of [[madOutliers]]'s per-group statistics — the
    * batch-train half of the batch-train / stream-apply split (the
    * `StreamGate.rankThresholds` shape): medians need the whole history,
    * so a batch pass trains (med, mad) per group and a stream gates new
    * rows against the table statelessly. `materialize = true` (the
    * streaming default) eagerly materializes the table
    * ([[graft.functions.Materialize]]) — a stream-static join re-derives
    * the static side every micro-batch, which would re-run the two-pass
    * percentile training per trigger. Output: (groupCols…, med, mad). */
  def madThresholds(
      df: DataFrame,
      valueCol: String,
      groupCols: Seq[String],
      minRows: Long = 5L,
      materialize: Boolean = true): DataFrame = {
    require(groupCols.nonEmpty, "madThresholds needs at least one group column")
    val reserved = Seq("med", "mad", "dev", "__n")
    require(!df.columns.exists(reserved.contains),
      s"input must not already carry ${reserved.mkString("/")} columns " +
        "(re-scoring scored output: drop them first)")
    val gc = groupCols.map(col)
    val med = df.groupBy(gc: _*)
      .agg(percentile(col(valueCol), lit(0.5)).as("med"),
        count(lit(1)).as("__n"))
      .filter(col("__n") >= minRows)
      .drop("__n")
    val mad = df.join(med, groupCols)
      .groupBy(gc: _*)
      .agg(percentile(abs(col(valueCol) - col("med")), lit(0.5)).as("mad"))
    val thr = med.join(mad, groupCols)
    if (materialize) graft.functions.Materialize(thr) else thr
  }

  /** Flag rows of a (streaming or batch) frame against a trained
    * threshold table: one stateless join + filter, no watermark, no
    * state store. Rows from groups absent at training time pass through
    * unflagged-by-omission (inner join) — retrain to score new groups.
    * Deliberately NO broadcast hint: per-entity threshold tables scale
    * with the entity count (users, devices), the exact frame class the
    * repo's hint policy leaves to AQE's runtime sizing. */
  def applyMadThresholds(
      rows: DataFrame,
      thresholds: DataFrame,
      valueCol: String,
      k: Double = 3.0): DataFrame = {
    require(k > 0, "k must be positive")
    val reserved = Seq("med", "mad", "dev")
    require(!rows.columns.exists(reserved.contains),
      s"rows must not already carry ${reserved.mkString("/")} columns " +
        "(re-scoring scored output? drop them first)")
    val groupCols = thresholds.columns.filterNot(Seq("med", "mad").contains)
    rows.join(thresholds, groupCols.toSeq)
      .withColumn("dev", abs(col(valueCol) - col("med")))
      .filter(col("dev") > col("mad") * lit(k))
  }

  /** Seasonal (day-of-week × hour-of-day) baseline per key — the
    * detrending table behind "is this hour's traffic abnormal FOR a
    * Tuesday 3 pm": one map-side-combinable aggregation whose output
    * cardinality is `keys × 7 × 24` no matter the event volume, so the
    * baseline of a 100-TB stream is a broadcastable few-KB frame. All
    * exact integers: `mean_milli = (1000·sum) div n` — the CCNet-style
    * scaled-integer mean, bit-identical across engines where an IEEE
    * mean is not guaranteed to round-trip a SQL replay. Day-of-week is
    * 0 = Sunday (Spark's `dayofweek` minus one — DuckDB's `dayofweek`
    * convention), hours in the session timezone. */
  def seasonalBaseline(
      df: DataFrame,
      tsCol: String,
      valueCol: String,
      keyCols: Seq[String]): DataFrame =
    df.groupBy((keyCols.map(col) :+
      (dayofweek(col(tsCol)) - 1).cast("long").as("dow") :+
      hour(col(tsCol)).cast("long").as("hr")): _*)
      .agg(count(lit(1)).as("n_cell"),
        sum(col(valueCol)).as("sum_cell"))
      // integral DIV, not IEEE `/`-then-truncate: the scaled mean must
      // be the same exact integer both engines compute
      .withColumn("mean_milli",
        expr("CAST(sum_cell AS BIGINT) * 1000L DIV n_cell"))

  /** Each row's exact-integer deviation from its seasonal cell:
    * `residual_milli = 1000·value − mean_milli`. The baseline frame is
    * an aggregation a planner broadcast-sizes at runtime, so the raw
    * stream never shuffles for the join — detrending rides the scan.
    * Downstream thresholds (MAD over residuals, top-k) compose. */
  def seasonalResiduals(
      df: DataFrame,
      tsCol: String,
      valueCol: String,
      keyCols: Seq[String]): DataFrame = {
    val base = seasonalBaseline(df, tsCol, valueCol, keyCols)
    df.withColumn("dow", (dayofweek(col(tsCol)) - 1).cast("long"))
      .withColumn("hr", hour(col(tsCol)).cast("long"))
      .join(base, keyCols ++ Seq("dow", "hr"))
      .withColumn("residual_milli",
        col(valueCol) * 1000L - col("mean_milli"))
  }
}
