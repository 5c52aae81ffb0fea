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
  * full event stream. Groups smaller than `minRows` are not scored
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
      minRows: Long = 5L): DataFrame = {
    require(groupCols.nonEmpty, "madOutliers needs at least one group column")
    require(k > 0, "k must be positive")
    val reserved = Seq("med", "mad", "dev", "__n")
    require(!df.columns.exists(reserved.contains),
      s"input must not already carry ${reserved.mkString("/")} columns " +
        "(re-scoring scored output: drop them first)")
    val gc = groupCols.map(col)
    val med = df.groupBy(gc: _*)
      .agg(percentile(col(valueCol), lit(0.5)).as("med"),
        count(lit(1)).as("__n"))
      .filter(col("__n") >= minRows)
    val withMed = df.join(med, groupCols)
      .withColumn("dev", abs(col(valueCol) - col("med")))
    val mad = withMed.groupBy(gc: _*)
      .agg(percentile(col("dev"), lit(0.5)).as("mad"))
    withMed.join(mad, groupCols)
      .filter(col("dev") > col("mad") * lit(k))
      .drop("__n")
  }
}
