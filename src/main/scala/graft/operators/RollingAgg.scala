package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Trailing event-time rolling aggregates — the feature-engineering
  * primitive behind "purchases in the last 24 h", velocity checks, and
  * most tabular ML features over event streams.
  */
object RollingAgg {

  /** For every row, `count` and `sum(valueCol)` over the key's trailing
    * `windowSeconds` of EVENT TIME, current row included. A RANGE frame
    * over epoch micros, not a ROWS frame: the window is defined by time,
    * so same-timestamp ties all land in each other's frames and the
    * result is deterministic under any intra-key ordering.
    *
    * Plan shape: one hash exchange on the key, then WindowExec's ordered
    * scan with a sliding range frame — no self-join, no per-row range
    * probe. The usual per-key window skew caveat applies (a single
    * pathological key serializes onto one task; salt or pre-aggregate
    * upstream — `Skew`'s story). Output adds `n_<suffix>` and
    * `sum_<suffix>`. */
  def trailingCountSum(
      df: DataFrame,
      valueCol: Column,
      windowSeconds: Long,
      keyCol: String = "user_id",
      tsCol: String = "ts",
      suffix: String = "trailing"): DataFrame = {
    require(windowSeconds > 0, "window must be positive")
    val withTs = df.withColumn("__ts_us", unix_micros(col(tsCol)))
      .withColumn("__val", valueCol)
    val w = Window.partitionBy(col(keyCol)).orderBy(col("__ts_us"))
      .rangeBetween(-windowSeconds * 1000000L, 0L)
    withTs
      .withColumn(s"n_$suffix", count(lit(1)).over(w))
      .withColumn(s"sum_$suffix", sum(col("__val")).over(w))
      .drop("__ts_us", "__val")
  }
}
