package graft.streaming

import org.apache.spark.sql.Dataset
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Streaming twin of
  * [[graft.operators.TemporalJoin.intervalOverlapJoin]]: per-key
  * interval × interval overlap pairs, watermark-final — the "sessions
  * × live campaign windows" join at ingest time.
  *
  * Why watermark-FINAL rather than eager: an overlap pair involves TWO
  * rows, and either may arrive late — an eager emit on first sight
  * would have to retract nothing (Append mode can't) yet could never
  * emit the pair whose partner arrives after the trigger. So, exactly
  * like [[CoverageStream]]'s island fold and [[FunnelStream]]'s match,
  * both sides' intervals buffer in per-key state until the watermark
  * clears the key's quiet horizon, and the pairing runs once, at
  * flush, when event-time order is settled. On a full bounded replay
  * the emitted pairs therefore equal the batch operator exactly, which
  * is what the shared DuckDB oracle checks (`ev_stream_interval_join`
  * vs `ev_interval_join`'s quadratic ground truth).
  *
  * Scale contract: state per key is one 16-byte (ts_us, event_id)
  * pair per event inside the watermark horizon — the interval is
  * derived (`[ts, ts + windowUs)`), sides are derived (event_id
  * parity, the same split the batch query uses), nothing wider
  * buffers. The flush pairing is the per-key nested loop over the
  * SETTLED buffer — quadratic in one key's horizon-window row count,
  * which is the honest cost of emitting every overlapping pair for
  * that key; keys partition the shuffle, so a hot key bounds one
  * task's flush, not the stage. The batch operator's bucket-join is
  * the shape for unbounded history; this is the shape for a bounded
  * in-flight horizon.
  */
object IntervalJoinStream extends Serializable {

  /** One buffered event: interval = [ts_us, ts_us + windowUs); side =
    * event_id parity (odd = A, even = B). */
  final case class IvEv(ts_us: Long, event_id: Long)
  // not private: the state encoder's generated code must reach the class
  final case class IvBuf(buf: List[IvEv], lastTsUs: Long)
  /** One overlap pair — the batch operator's output row. */
  final case class IvPair(user_id: Long, a_id: Long, b_id: Long,
      overlap_us: Long)

  /** @param windowUs        validity window each event opens (exclusive
    *                        end), in event-time micros
    * @param horizonMinutes  event-time quiet period after a key's last
    *                        event before its pairs are final (also the
    *                        watermark delay) */
  def intervalJoinStream(
      events: Dataset[Sessionize.Event],
      windowUs: Long,
      horizonMinutes: Int = 30): Dataset[IvPair] = {
    require(windowUs > 0, "interval join needs a positive validity window")
    import events.sparkSession.implicits._
    val horizonMs = horizonMinutes * 60L * 1000L

    def micros(ts: java.sql.Timestamp): Long =
      ts.getTime * 1000L + (ts.getNanos / 1000L) % 1000L

    // the batch pairing: every (odd, even) pair of same-key intervals
    // with a_s < b_e && b_s < a_e, overlap = min(ends) − max(starts)
    def fold(userId: Long, buf: List[IvEv]): List[IvPair] = {
      val (a, b) = buf.partition(_.event_id % 2 != 0)
      val out = List.newBuilder[IvPair]
      a.foreach { x =>
        val (as, ae) = (x.ts_us, x.ts_us + windowUs)
        b.foreach { y =>
          val (bs, be) = (y.ts_us, y.ts_us + windowUs)
          if (as < be && bs < ae)
            out += IvPair(userId, x.event_id, y.event_id,
              math.min(ae, be) - math.max(as, bs))
        }
      }
      out.result()
    }

    def update(
        userId: Long,
        rows: Iterator[Sessionize.Event],
        state: GroupState[IvBuf]): Iterator[IvPair] = {
      if (state.hasTimedOut) {
        val s = state.get
        state.remove()
        return fold(userId, s.buf).iterator
      }
      val prev = state.getOption.getOrElse(IvBuf(Nil, Long.MinValue))
      val incoming = rows.map(e => IvEv(micros(e.ts), e.event_id)).toList
      val next = IvBuf(incoming reverse_::: prev.buf,
        incoming.foldLeft(prev.lastTsUs)((m, e) => math.max(m, e.ts_us)))
      state.update(next)
      state.setTimeoutTimestamp(
        math.max(next.lastTsUs / 1000L + horizonMs,
          state.getCurrentWatermarkMs() + 1))
      Iterator.empty
    }

    events
      .withWatermark("ts", s"$horizonMinutes minutes")
      .groupByKey(_.user_id)
      .flatMapGroupsWithState(
        OutputMode.Append, GroupStateTimeout.EventTimeTimeout)(update)
  }
}
