package graft.functions

import org.apache.spark.sql.DataFrame

/** Lineage-truncating materialization for multi-consumer and iterative
  * frames (connected components' per-round labels, LSH signature/class
  * frames, banded candidate inputs).
  *
  * Default = `localCheckpoint()`: blocks land on executor-local storage —
  * cheap, no infrastructure, and right for bounded jobs, but an executor
  * loss severs the lineage and fails the job (which then simply re-runs).
  * A multi-hour 100-TB pipeline doesn't want that coin flip: set
  * `spark.graft.checkpoint.reliable=true` AND a checkpoint directory
  * (`SparkContext.setCheckpointDir`, typically on the cluster's durable
  * FS) and every call site swaps in `checkpoint()` — same plan shape and
  * same eager materialization semantics, blocks on reliable storage,
  * executor loss survivable. Asking for reliable mode without a
  * checkpoint dir fails loudly here rather than as Spark's opaque
  * mid-job error. The conf is read per call, so one session can mix
  * modes across jobs.
  */
object Materialize {
  /** Session conf key: "true" swaps localCheckpoint for reliable
    * checkpoint at every graft materialization site. */
  val ReliableConf = "spark.graft.checkpoint.reliable"

  def apply(df: DataFrame): DataFrame = {
    val reliable =
      df.sparkSession.conf.get(ReliableConf, "false").trim.toBoolean
    if (reliable) {
      require(
        df.sparkSession.sparkContext.getCheckpointDir.isDefined,
        s"$ReliableConf=true requires SparkContext.setCheckpointDir " +
          "(a durable location for the checkpoint blocks)")
      df.checkpoint()
    } else df.localCheckpoint()
  }
}
