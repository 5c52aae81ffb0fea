package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Streaming CDC compaction — the stream twin of
  * [[graft.operators.Changes.applyCdc]]'s MERGE-INTO, split at its
  * natural algebraic seam. Latest-wins is associative: folding a change
  * feed into a snapshot gives the same answer whether the feed arrives
  * whole or pre-compacted to each key's newest change. So the streaming
  * half is ONLY the compaction — a per-key running argmax over
  * (ts, tie...) carrying the full row INCLUDING the op column, one row
  * of state per key regardless of feed length — and the snapshot merge
  * is the unmodified batch `applyCdc` over the drained state frame,
  * which is keys × one row instead of the raw feed. Deletes ride
  * through as data (`op = "d"`): a key whose newest change is a delete
  * must keep exactly that fact in state, because a newer upsert may
  * still arrive and resurrect the key — dropping deletes in-stream
  * would lose the race.
  *
  * Complete/Update output mode is the bounded-replay harness choice;
  * an indefinitely-running compactor runs the same aggregation with a
  * watermark in Update mode, checkpointing the state store, and merges
  * the sink table into the snapshot on whatever cadence the lake
  * compacts. Convergence (drained-state merge == full-feed batch
  * `applyCdc`, late-older changes losing to the snapshot) is pinned by
  * `StreamCdcSpec` and the `ev_stream_cdc_apply` oracle row.
  */
object StreamCdc {

  /** Per-key newest change with all payload columns (op included): the
    * running compaction. Keys stay columns; every non-key column rides
    * in one `max_by` struct ordered by (`tsCol`, `tieCols`...), so the
    * whole winning row is selected atomically — no per-column argmax
    * drift. */
  def latestChangeStream(
      changes: DataFrame,
      keyCols: Seq[String],
      tsCol: String,
      tieCols: Seq[String] = Nil): DataFrame = {
    require(keyCols.nonEmpty, "latestChangeStream needs a key")
    val others = changes.columns.filterNot(keyCols.contains).toSeq
    require(others.contains(tsCol), s"$tsCol must be a non-key column")
    changes
      .groupBy(keyCols.map(col): _*)
      .agg(max_by(struct(others.map(col): _*),
        struct((tsCol +: tieCols).map(col): _*)).as("__last"))
      .select((keyCols.map(col) ++
        others.map(c => col(s"__last.$c").as(c))): _*)
  }
}
