package graft.streaming

import org.apache.spark.sql.Dataset
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Streaming twin of [[graft.operators.Attribution.linear]]: linear
  * multi-touch attribution as a per-key banded stream state machine
  * under the watermark.
  *
  * The batch operator is a banded time join — conversion × touches in
  * `(conv_ts − L, conv_ts]` — plus a per-conversion count. Streamed,
  * a conversion's credit rows are FINAL exactly when the watermark
  * passes its timestamp: every qualifying touch has `ts ≤ conv_ts`, so
  * once the watermark clears `conv_ts` no on-time touch can still
  * arrive. That makes attribution Append-mode emittable without
  * retraction — unlike eager emission, which would have to re-split
  * credit every time a late touch landed.
  *
  * State per user is bounded by the horizon, not history: touches live
  * only while a future conversion could still claim them (`ts + L`
  * ahead of the watermark), conversions only until the watermark
  * finalizes them — so state is O(events in the last `L + delay`),
  * the same bound the stream-stream range join's buffers carry. Both
  * event kinds ride ONE stream (tagged rows), so there is one shuffle
  * on the user key — the two-sided join's pair of exchanges collapses
  * into the state machine's one.
  *
  * Emission replicates the batch row shape exactly: n qualifying
  * touches → n rows with `credit = cents / n` (one IEEE division of
  * exact integers, the batch recipe); zero touches → one unattributed
  * row (null touch columns, `n_touches = 0`, null credit). On a full
  * bounded replay the output therefore equals `Attribution.linear`
  * bit-for-bit, and `ev_stream_attribution` shares `ev_attribution`'s
  * DuckDB oracle verbatim.
  */
object AttributionStream extends Serializable {

  /** One tagged input row: `isConv` distinguishes conversions (carrying
    * `cents`) from touches (cents ignored). */
  final case class AttrEvent(user_id: Long, event_id: Long,
      ts: java.sql.Timestamp, isConv: Boolean, cents: Long)
  // not private: the state encoder's generated code must reach the class
  final case class AttrState(convs: List[(Long, Long, Long)],
      touches: List[(Long, Long)])
  /** The batch operator's output row: null touch columns and n_touches=0
    * mark the unattributed bucket. */
  final case class AttrOut(user_id: Long, p_event_id: Long, p_ts_us: Long,
      p_cents: Long, c_event_id: Option[Long], c_ts_us: Option[Long],
      n_touches: Long, credit: Option[Double])

  /** @param events         tagged rows (the watermark is applied here,
    *                        on `ts`, before grouping)
    * @param lookbackMicros  the attribution window L
    * @param delay           watermark delay, e.g. "6 hours" — how late a
    *                        touch/conversion may arrive and still count */
  def linearStream(
      events: Dataset[AttrEvent],
      lookbackMicros: Long,
      delay: String): Dataset[AttrOut] = {
    require(lookbackMicros > 0, "lookbackMicros must be positive")
    import events.sparkSession.implicits._

    // full microsecond precision, as in sessionizeStream
    def micros(ts: java.sql.Timestamp): Long =
      ts.getTime * 1000L + (ts.getNanos / 1000L) % 1000L

    def update(
        userId: Long,
        rows: Iterator[AttrEvent],
        state: GroupState[AttrState]): Iterator[AttrOut] = {
      val wmMs = state.getCurrentWatermarkMs()
      val prev = state.getOption.getOrElse(AttrState(Nil, Nil))
      // fold the batch's rows in (no emission yet — finality comes from
      // the watermark, not arrival)
      var convs = prev.convs
      var touches = prev.touches
      rows.foreach { e =>
        if (e.isConv) convs ::= ((e.event_id, micros(e.ts), e.cents))
        else touches ::= ((e.event_id, micros(e.ts)))
      }
      // finalize every conversion the watermark has passed: all its
      // on-time touches (ts ≤ conv_ts < watermark) have arrived
      val (ready, pending) = convs.partition(_._2 / 1000L < wmMs)
      val out = ready.sortBy(c => (c._2, c._1)).flatMap {
        case (pid, pts, cents) =>
          val hits = touches
            .filter(t => t._2 <= pts && t._2 > pts - lookbackMicros)
            .sortBy(t => (t._2, t._1))
          if (hits.isEmpty)
            List(AttrOut(userId, pid, pts, cents, None, None, 0L, None))
          else {
            val n = hits.length.toLong
            // the batch recipe: one IEEE division of exact integers
            val credit = cents.toDouble / n.toDouble
            hits.map { case (tid, tts) =>
              AttrOut(userId, pid, pts, cents, Some(tid), Some(tts),
                n, Some(credit))
            }
          }
      }
      // a touch expires once no future on-time conversion can claim it:
      // conversions at or beyond the watermark have ts ≥ wm > t + L
      val wmUs = wmMs * 1000L
      val live = touches.filter(_._2 + lookbackMicros >= wmUs)
      if (pending.isEmpty && live.isEmpty) state.remove()
      else {
        state.update(AttrState(pending, live))
        // wake when the next conversion finalizes, else when the last
        // touch expires; clamped above the watermark (Spark rejects a
        // timeout at or behind it)
        val nextMs =
          if (pending.nonEmpty) pending.map(_._2 / 1000L).min + 1L
          else live.map(t => (t._2 + lookbackMicros) / 1000L).max + 1L
        state.setTimeoutTimestamp(math.max(nextMs, wmMs + 1L))
      }
      out.iterator
    }

    events
      .withWatermark("ts", delay)
      .groupByKey(_.user_id)
      .flatMapGroupsWithState(
        OutputMode.Append, GroupStateTimeout.EventTimeTimeout)(update)
  }
}
