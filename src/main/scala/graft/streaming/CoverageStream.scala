package graft.streaming

import org.apache.spark.sql.Dataset
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Streaming twin of [[graft.operators.Intervals.mergeIslands]]:
  * per-key interval union ("gaps and islands"), watermark-final.
  *
  * The batch operator's island boundary ("a start strictly above the
  * running max of all PRIOR ends opens a new island") is an ordered
  * fold — and a single late interval can do more than shift one
  * boundary: an early long window arriving late can swallow several
  * islands that an eager merge would already have emitted. So, like
  * [[FunnelStream]], the state machine is watermark-FINAL: a user's
  * event times buffer in state until the watermark passes their quiet
  * horizon, and the island fold — sort by (start, event_id), running
  * max of ends, close an island where the next start clears it — runs
  * once per user, at flush, when event-time order is settled. On a
  * full bounded replay the emitted islands therefore equal
  * `Intervals.mergeIslands` exactly, which is what the shared DuckDB
  * oracle checks (`ev_stream_coverage` vs `ev_coverage`).
  *
  * Scale contract: state per user is one (ts_us, event_id) pair per
  * event inside the watermark horizon — the interval itself is derived
  * (`[ts, ts + windowUs)`), so nothing wider than 16 bytes per event
  * buffers; islands emit once (Append — final by construction at
  * flush) and the shuffle key is the user id. The production
  * refinement for very long horizons is eager below-watermark island
  * folding (collapse the settled prefix of the buffer into the open
  * island's (start, max-end, n) triple); as in FunnelStream, that is
  * an allocation optimization, not a semantics change, and is
  * deliberately not done here.
  */
object CoverageStream extends Serializable {

  /** One buffered event: interval = [ts_us, ts_us + windowUs). */
  final case class CovEv(ts_us: Long, event_id: Long)
  // not private: the state encoder's generated code must reach the class
  final case class CovBuf(buf: List[CovEv], lastTsUs: Long)
  /** One maximal merged island — the batch operator's output row. */
  final case class CovIsland(user_id: Long, island: Long,
      island_start: Long, island_end: Long, n_intervals: Long,
      covered: Long)

  /** @param windowUs        validity window each event opens (exclusive
    *                        end), in event-time micros
    * @param horizonMinutes  event-time quiet period after a user's last
    *                        event before their islands are final (also
    *                        the watermark delay) */
  def coverageStream(
      events: Dataset[Sessionize.Event],
      windowUs: Long,
      horizonMinutes: Int = 30): Dataset[CovIsland] = {
    require(windowUs > 0, "coverage needs a positive validity window")
    import events.sparkSession.implicits._
    val horizonMs = horizonMinutes * 60L * 1000L

    def micros(ts: java.sql.Timestamp): Long =
      ts.getTime * 1000L + (ts.getNanos / 1000L) % 1000L

    // the batch island fold: ordered by (start, id), an island closes
    // exactly where a start exceeds the running max of prior ends —
    // island ordinals are 1-based, matching the batch running sum of
    // open flags
    def fold(userId: Long, buf: List[CovEv]): List[CovIsland] = {
      val out = List.newBuilder[CovIsland]
      var island = 0L
      var start = 0L
      var end = Long.MinValue
      var n = 0L
      buf.sortBy(e => (e.ts_us, e.event_id)).foreach { e =>
        val s = e.ts_us
        val t = s + windowUs
        if (n == 0L || s > end) {
          if (n > 0L)
            out += CovIsland(userId, island, start, end, n, end - start)
          island += 1L
          start = s
          end = t
          n = 1L
        } else {
          if (t > end) end = t
          n += 1L
        }
      }
      if (n > 0L)
        out += CovIsland(userId, island, start, end, n, end - start)
      out.result()
    }

    def update(
        userId: Long,
        rows: Iterator[Sessionize.Event],
        state: GroupState[CovBuf]): Iterator[CovIsland] = {
      if (state.hasTimedOut) {
        val s = state.get
        state.remove()
        return fold(userId, s.buf).iterator
      }
      val prev = state.getOption.getOrElse(CovBuf(Nil, Long.MinValue))
      val incoming = rows.map(e => CovEv(micros(e.ts), e.event_id)).toList
      val next = CovBuf(incoming reverse_::: prev.buf,
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
