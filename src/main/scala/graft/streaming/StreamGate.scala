package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.functions.{Materialize, TextAnalysis}

/** Batch-train / stream-apply gating — the two-phase shape streaming
  * corpus filters actually run: rank-based thresholds need the WHOLE
  * corpus (a percentile is not computable row-at-a-time), so a batch
  * pass trains per-group thresholds and the stream applies them as a
  * stateless broadcast join + filter. No watermark, no state store —
  * a doc's verdict depends only on its own row and the (tiny, bounded
  * by group count) threshold table.
  */
object StreamGate extends Serializable {

  /** Per-group thresholds that make the stream gate reproduce the BATCH
    * rank gate (`percentileRank(...).filter(prank >= minRank)`) exactly:
    * the threshold is the smallest metric value the batch gate keeps per
    * group, so `metric >= thr` admits precisely the batch-kept set —
    * ties and all, with no quantile-interpolation arithmetic to drift
    * cross-engine. Output: (groupCol, thr).
    *
    * The threshold table is MATERIALIZED here ([[Materialize]]): Spark
    * re-evaluates the static side of a stream-static join every
    * micro-batch, so an unmaterialized threshold frame would re-run the
    * full-corpus percentile training pass per trigger — the opposite of
    * train-once/apply-forever. The materialized frame is group-count
    * sized, so the cost is one eager training job. */
  def rankThresholds(
      scored: DataFrame,
      metricCol: String,
      minRank: Double = 0.5,
      groupCol: String = "source"): DataFrame =
    Materialize(
      TextAnalysis.percentileRank(scored, metricCol, groupCol)
        .filter(col("prank") >= minRank)
        .groupBy(col(groupCol))
        .agg(min(col(metricCol)).as("thr")))

  /** Apply trained thresholds to a (streaming or batch) frame: broadcast
    * the threshold table (one row per group — code-table sized, the hint
    * policy's provably-bounded case) and keep rows at-or-above their
    * group's threshold. Rows from groups ABSENT from the training corpus
    * drop (the null comparison is never true) — the conservative default
    * for a quality gate; retrain to admit new groups. */
  def applyThresholds(
      docs: DataFrame,
      thresholds: DataFrame,
      metricCol: String,
      groupCol: String = "source"): DataFrame =
    docs.join(broadcast(thresholds), Seq(groupCol), "left")
      .filter(col(metricCol) >= col("thr"))
      .drop("thr")
}
