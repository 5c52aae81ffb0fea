package graft.streaming

import org.apache.spark.sql.Dataset
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Streaming twin of [[graft.operators.Funnel.funnel]]: a per-user
  * step-state machine over `flatMapGroupsWithState`, watermark-final.
  *
  * The batch funnel's semantics ("earliest step-1 time, then the
  * earliest step-2 event STRICTLY AFTER it, …") are a sequential fold
  * over the user's step-typed events in (ts, event_id) order — and that
  * order is exactly what an unbounded stream cannot promise per batch.
  * A greedy fold over arrival order would lock in wrong step times the
  * moment one event arrives out of order (a late early signup must
  * retroactively shift every later step). So the state machine is
  * watermark-FINAL, not eager: a user's step-typed events BUFFER in
  * state until the watermark passes the user's horizon, and the fold —
  * sort by (ts_us, event_id), advance depth on each `steps(depth)`
  * event strictly after the previous step time — runs once, at flush,
  * when event-time order is settled. On a full bounded replay the
  * result therefore equals `Funnel.funnel` exactly, which is what the
  * shared DuckDB oracle checks.
  *
  * Scale contract: state per user is the step-TYPED events inside the
  * watermark horizon (the `stepSet` filter runs stream-side, before
  * grouping — other event types never reach state), emitted rows are
  * one per converting user, and the shuffle key is the user id — the
  * same key every other per-user stateful operator here uses. For a
  * funnel whose horizon must span weeks at 100-TB event rates, the
  * production hardening is per-step eager finalization below the
  * watermark (fold the prefix of the buffer older than the watermark
  * into locked step times and drop it); the flush-time fold is the
  * semantics, that refinement is an allocation optimization and is
  * deliberately not done here.
  */
object FunnelStream extends Serializable {

  /** One buffered step-typed event. */
  final case class FunnelEv(ts_us: Long, event_id: Long, event_type: String)
  // not private: the state encoder's generated code must reach the class
  final case class FunnelBuf(buf: List[FunnelEv], lastTsUs: Long)
  /** A converting user: `times_us(i)` is step i+1's completion time;
    * length == funnel_depth (uncompleted steps are absent, the batch
    * twin's null columns). */
  final case class FunnelHit(user_id: Long, times_us: Seq[Long],
      funnel_depth: Long)

  /** @param steps           ordered event types, as in the batch funnel
    * @param horizonMinutes  event-time quiet period after a user's last
    *                        step-typed event before their funnel row is
    *                        final (also the watermark delay) */
  def funnelStream(
      events: Dataset[Sessionize.Event],
      steps: Seq[String],
      horizonMinutes: Int = 30): Dataset[FunnelHit] = {
    require(steps.nonEmpty, "funnel needs at least one step")
    import events.sparkSession.implicits._
    val stepSet = steps.toSet
    val horizonMs = horizonMinutes * 60L * 1000L

    // full microsecond precision, as in sessionizeStream: getTime is
    // ms-truncated and the batch twin compares unix_micros
    def micros(ts: java.sql.Timestamp): Long =
      ts.getTime * 1000L + (ts.getNanos / 1000L) % 1000L

    // the batch funnel's per-step conditional-min chain as one in-order
    // pass: scanning in (ts, id) order, the first steps(depth) event
    // strictly after times(depth-1) IS that step's earliest qualifier
    def fold(buf: List[FunnelEv]): List[Long] = {
      val times = new Array[Long](steps.length)
      var depth = 0
      buf.sortBy(e => (e.ts_us, e.event_id)).foreach { e =>
        if (depth < steps.length && e.event_type == steps(depth) &&
          (depth == 0 || e.ts_us > times(depth - 1))) {
          times(depth) = e.ts_us
          depth += 1
        }
      }
      times.take(depth).toList
    }

    def update(
        userId: Long,
        rows: Iterator[Sessionize.Event],
        state: GroupState[FunnelBuf]): Iterator[FunnelHit] = {
      if (state.hasTimedOut) {
        val s = state.get
        state.remove()
        val times = fold(s.buf)
        // one row per user that completed step 1 — the batch contract
        return if (times.nonEmpty)
          Iterator.single(FunnelHit(userId, times, times.length.toLong))
        else Iterator.empty
      }
      val prev = state.getOption.getOrElse(FunnelBuf(Nil, Long.MinValue))
      val incoming = rows.map(e =>
        FunnelEv(micros(e.ts), e.event_id, e.event_type)).toList
      val next = FunnelBuf(incoming reverse_::: prev.buf,
        incoming.foldLeft(prev.lastTsUs)((m, e) => math.max(m, e.ts_us)))
      state.update(next)
      // flush when the watermark passes the user's quiet horizon;
      // clamp above the watermark (a batch of wholly-late events could
      // otherwise register a timeout Spark rejects)
      state.setTimeoutTimestamp(
        math.max(next.lastTsUs / 1000L + horizonMs,
          state.getCurrentWatermarkMs() + 1))
      Iterator.empty
    }

    events
      .withWatermark("ts", s"$horizonMinutes minutes")
      // only step-typed events reach state — AFTER the watermark node,
      // so flush sentinels of other types still advance event time
      .filter(e => stepSet.contains(e.event_type))
      .groupByKey(_.user_id)
      .flatMapGroupsWithState(
        OutputMode.Append, GroupStateTimeout.EventTimeTimeout)(update)
  }

  // ------------------------------------------------------------ retention

  // not private: the state encoder's generated code must reach the class
  final case class RetentionState(days: List[Long], anchorTsUs: Long,
      lastTsUs: Long)
  /** One (user, cohort, active-week) membership row — each user emits
    * each (cohort_day, week_offset) AT MOST once, so the retention
    * matrix is a plain count over these rows. */
  final case class RetentionRow(user_id: Long, cohort_day: Long,
      week_offset: Long)

  /** Streaming twin of [[graft.operators.Funnel.retention]]'s per-user
    * half: cohort/active-week membership as a watermark-final per-user
    * state machine. The batch operator anchors each user at their first
    * `anchorType` event and counts distinct active weeks from it —
    * both facts a stream can only finalize once the watermark passes
    * the user's horizon (a late, EARLIER anchor shifts the cohort day
    * and renumbers every week offset, the same retroactivity that makes
    * the funnel watermark-final). State per user is one anchor
    * timestamp plus the DISTINCT ACTIVITY DAYS in the horizon — day
    * granularity is what the matrix needs, so a million-event user
    * costs horizon/86400 longs, not their event list.
    *
    * At flush: `cohort_day = anchor div day`, and the emitted offsets
    * are `(d − cohort_day) div 7` for buffered days strictly after the
    * cohort day, plus week 0 (the anchor event itself always qualifies
    * under the batch's `ts >= t0` filter; same-day non-anchor events
    * can add only week 0 again, and earlier days all precede `t0`) —
    * so the emitted set equals the batch filter's day set exactly.
    * Users with no anchor emit nothing, as in the batch inner join.
    * The retention MATRIX is then one count over these at-most-once
    * membership rows (`n_users = count(*)`), the narrow aggregation a
    * consumer runs over the sink. */
  def retentionStream(
      events: Dataset[Sessionize.Event],
      anchorType: String = "signup",
      horizonMinutes: Int = 30): Dataset[RetentionRow] = {
    import events.sparkSession.implicits._
    val dayUs = 86400000000L
    val horizonMs = horizonMinutes * 60L * 1000L

    def micros(ts: java.sql.Timestamp): Long =
      ts.getTime * 1000L + (ts.getNanos / 1000L) % 1000L

    def update(
        userId: Long,
        rows: Iterator[Sessionize.Event],
        state: GroupState[RetentionState]): Iterator[RetentionRow] = {
      if (state.hasTimedOut) {
        val s = state.get
        state.remove()
        if (s.anchorTsUs == Long.MaxValue) return Iterator.empty
        val cohortDay = s.anchorTsUs / dayUs
        val offsets = s.days.filter(_ > cohortDay)
          .map(d => (d - cohortDay) / 7L).toSet + 0L
        return offsets.toList.sorted.iterator
          .map(w => RetentionRow(userId, cohortDay, w))
      }
      val prev = state.getOption
        .getOrElse(RetentionState(Nil, Long.MaxValue, Long.MinValue))
      var days = prev.days
      var anchor = prev.anchorTsUs
      var last = prev.lastTsUs
      rows.foreach { e =>
        val us = micros(e.ts)
        val d = us / dayUs
        if (!days.contains(d)) days ::= d
        if (e.event_type == anchorType) anchor = math.min(anchor, us)
        last = math.max(last, us)
      }
      state.update(RetentionState(days, anchor, last))
      state.setTimeoutTimestamp(
        math.max(last / 1000L + horizonMs,
          state.getCurrentWatermarkMs() + 1))
      Iterator.empty
    }

    events
      .withWatermark("ts", s"$horizonMinutes minutes")
      .groupByKey(_.user_id)
      .flatMapGroupsWithState(
        OutputMode.Append, GroupStateTimeout.EventTimeTimeout)(update)
  }

  // ---------------------------------------------------------- transitions

  /** One adjacent-pair edge of a user's settled timeline — the matrix
    * is a plain (prev, next) count over these rows. */
  final case class TransitionRow(user_id: Long, prev: String, next: String)

  /** Streaming twin of [[graft.operators.Funnel.transitions]]' per-user
    * half: adjacent-pair edges of each user's event-time-ordered
    * timeline, watermark-final. The batch operator's lag window is a
    * total (ts, event_id) order per user — an arrival-order fold would
    * weld wrong adjacencies the moment one event arrives late (a late
    * middle event must split an already-emitted pair into two). So, as
    * with the funnel, events BUFFER per user until the watermark passes
    * the quiet horizon, and the sort + lag fold runs once at flush,
    * emitting each adjacency exactly once (start sentinel included).
    * On a full bounded replay the (prev, next) counts over these rows
    * equal the batch matrix — the shared oracle.
    *
    * State per user is their events inside the horizon — (ts_us, id,
    * type) triples, the same bound the funnel documents; the matrix
    * aggregation over the emitted edges is |types|² rows, tiny at any
    * scale. */
  def transitionsStream(
      events: Dataset[Sessionize.Event],
      horizonMinutes: Int = 30,
      startSentinel: String = "∅"): Dataset[TransitionRow] = {
    import events.sparkSession.implicits._
    val horizonMs = horizonMinutes * 60L * 1000L

    def micros(ts: java.sql.Timestamp): Long =
      ts.getTime * 1000L + (ts.getNanos / 1000L) % 1000L

    def update(
        userId: Long,
        rows: Iterator[Sessionize.Event],
        state: GroupState[FunnelBuf]): Iterator[TransitionRow] = {
      if (state.hasTimedOut) {
        val s = state.get
        state.remove()
        val ordered = s.buf.sortBy(e => (e.ts_us, e.event_id))
        val prevs = startSentinel :: ordered.map(_.event_type)
        return prevs.iterator.zip(ordered.iterator)
          .map { case (p, e) => TransitionRow(userId, p, e.event_type) }
      }
      val prev = state.getOption.getOrElse(FunnelBuf(Nil, Long.MinValue))
      val incoming = rows.map(e =>
        FunnelEv(micros(e.ts), e.event_id, e.event_type)).toList
      val next = FunnelBuf(incoming reverse_::: prev.buf,
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

  // ------------------------------------------------------------ paths

  /** One length-`len` path window of a user's settled timeline. */
  final case class PathRow(user_id: Long, path: String)

  /** Streaming twin of [[graft.operators.Funnel.topPaths]]' window
    * construction: each user's length-`len` event-type windows emit
    * watermark-FINAL (the [[transitionsStream]] buffer-and-fold
    * contract — an adjacency, a fortiori a k-window, must never weld
    * across a late arrival, so windows form only once the user's
    * timeline is settled in (ts, event_id) order). The top-k rank is
    * then a batch count over the drained path rows — exactly as the
    * transition matrix is a batch count over drained edges — so a full
    * bounded replay equals the batch operator under the shared
    * oracle. State per user is the timeline inside the watermark
    * horizon; emitted rows are (user, path) pairs, n − len + 1 per
    * settled n-event timeline. */
  def pathsStream(
      events: Dataset[Sessionize.Event],
      len: Int = 3,
      horizonMinutes: Int = 30): Dataset[PathRow] = {
    require(len >= 2, s"a path needs at least 2 steps, got $len")
    import events.sparkSession.implicits._
    val horizonMs = horizonMinutes * 60L * 1000L

    def micros(ts: java.sql.Timestamp): Long =
      ts.getTime * 1000L + (ts.getNanos / 1000L) % 1000L

    def update(
        userId: Long,
        rows: Iterator[Sessionize.Event],
        state: GroupState[FunnelBuf]): Iterator[PathRow] = {
      if (state.hasTimedOut) {
        val s = state.get
        state.remove()
        val ordered = s.buf.sortBy(e => (e.ts_us, e.event_id))
          .map(_.event_type)
        return ordered.sliding(len).filter(_.lengthCompare(len) == 0)
          .map(w => PathRow(userId, w.mkString(">")))
      }
      val prev = state.getOption.getOrElse(FunnelBuf(Nil, Long.MinValue))
      val incoming = rows.map(e =>
        FunnelEv(micros(e.ts), e.event_id, e.event_type)).toList
      val next = FunnelBuf(incoming reverse_::: prev.buf,
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
