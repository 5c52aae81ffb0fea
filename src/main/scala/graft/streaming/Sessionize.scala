package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Event-stream operators over the `events` table shape
  * (event_id, ts, user_id, event_type, value, props).
  *
  * The reference is purely batch (SURVEY.md §2.6) — these are the
  * Structured-Streaming extensions a training-data pipeline needs, written
  * so the SAME logic runs in batch (window functions) and streaming
  * (flatMapGroupsWithState / watermarked windows).
  */
// Serializable because the as-of update closures call the object's
// mergeSortedRights helper, which makes Spark's closure cleaner ship the
// (stateless) module reference with the task
object Sessionize extends Serializable {

  final case class Event(event_id: Long, ts: Timestamp, user_id: Long,
      event_type: String, value: Double)

  final case class SessionState(
      sessionStart: Long, lastTs: Long, nEvents: Long, totalValue: Double,
      valueCents: Long)

  final case class Session(user_id: Long, session_start: Timestamp,
      session_end: Timestamp, n_events: Long, total_value: Double,
      value_cents: Long)

  /** Per-event exact cents, matching `round(value * 100).cast("long")`
    * (Spark's Round is HALF_UP over BigDecimal.valueOf): summing these
    * per session is order-independent, so the streaming summary equals
    * the batch one bit-for-bit — a double `total_value` accumulator
    * alone could drift by accumulation order. */
  private def centsOf(v: Double): Long =
    java.math.BigDecimal.valueOf(v * 100)
      .setScale(0, java.math.RoundingMode.HALF_UP).longValue

  /** Batch sessionization: a session breaks after `gapMinutes` of
    * inactivity. One shuffle (user_id); boundary flags + running sum give
    * the session index — the standard gaps-and-islands shape. */
  def sessionizeBatch(events: DataFrame, gapMinutes: Int = 30): DataFrame = {
    val byUser = Window.partitionBy(col("user_id"))
      .orderBy(col("ts"), col("event_id"))
    val gap = unix_micros(col("ts")) -
      lag(unix_micros(col("ts")), 1).over(byUser)
    val isNew = when(gap.isNull || gap > gapMinutes * 60L * 1000000L, 1L)
      .otherwise(0L)
    events
      .withColumn("__new", isNew)
      .withColumn("session_idx",
        sum(col("__new")).over(byUser.rowsBetween(Window.unboundedPreceding, 0)))
      .drop("__new")
  }

  /** Batch session summary (count/min/max/total per session). */
  def sessionSummaryBatch(events: DataFrame, gapMinutes: Int = 30): DataFrame =
    sessionizeBatch(events, gapMinutes)
      .groupBy(col("user_id"), col("session_idx"))
      .agg(
        count(lit(1)).as("n_events"),
        min(col("ts")).as("session_start"),
        max(col("ts")).as("session_end"),
        sum(round(col("value") * 100).cast("long")).as("value_cents"))

  /** Streaming sessionization with explicit state: one state object per
    * user, closed and emitted on timeout (event-time gap). The streaming
    * twin of [[sessionSummaryBatch]]. */
  def sessionizeStream(
      events: Dataset[Event],
      gapMinutes: Int = 30): Dataset[Session] = {
    import events.sparkSession.implicits._
    val gapMicros = gapMinutes * 60L * 1000000L

    def toTs(micros: Long): Timestamp = {
      val t = new Timestamp(micros / 1000L)
      t.setNanos(((micros % 1000000L) * 1000L).toInt)
      t
    }
    // full microsecond precision: Timestamp.getTime is ms-truncated, and
    // the batch twin compares gaps in unix_micros
    def micros(ts: Timestamp): Long =
      ts.getTime * 1000L + (ts.getNanos / 1000L) % 1000L

    def close(userId: Long, s: SessionState): Session =
      Session(userId, toTs(s.sessionStart), toTs(s.lastTs),
        s.nEvents, s.totalValue, s.valueCents)

    def update(
        userId: Long,
        rows: Iterator[Event],
        state: GroupState[SessionState]): Iterator[Session] = {
      // Timeout invocation: the watermark passed this session's gap —
      // close and clear. (Must NOT fall through to the row path: with the
      // state kept, re-registering the stale timeout would sit behind the
      // watermark, which Spark rejects.)
      if (state.hasTimedOut) {
        val s = state.get
        state.remove()
        return Iterator.single(close(userId, s))
      }
      val sorted = rows.toSeq.sortBy(e => (micros(e.ts), e.event_id))
      var closed = List.empty[Session]
      var cur = state.getOption
      sorted.foreach { e =>
        val tsMicros = micros(e.ts)
        cur match {
          case Some(s) if tsMicros - s.lastTs <= gapMicros =>
            // monotone bounds: a late (cross-batch) event inside the gap
            // must not regress lastTs or miss extending sessionStart
            cur = Some(s.copy(
              sessionStart = math.min(s.sessionStart, tsMicros),
              lastTs = math.max(s.lastTs, tsMicros),
              nEvents = s.nEvents + 1,
              totalValue = s.totalValue + e.value,
              valueCents = s.valueCents + centsOf(e.value)))
          case Some(s) =>
            closed ::= close(userId, s)
            cur = Some(SessionState(tsMicros, tsMicros, 1L, e.value,
              centsOf(e.value)))
          case None =>
            cur = Some(SessionState(tsMicros, tsMicros, 1L, e.value,
              centsOf(e.value)))
        }
      }
      cur.foreach { s =>
        state.update(s)
        // Clamp to the watermark: a batch made entirely of late events can
        // put lastTs + gap behind it, and setTimeoutTimestamp rejects that.
        val timeoutMs = (s.lastTs / 1000L) + gapMinutes * 60L * 1000L
        state.setTimeoutTimestamp(
          math.max(timeoutMs, state.getCurrentWatermarkMs() + 1))
      }
      closed.reverseIterator
    }

    events
      .withWatermark("ts", s"$gapMinutes minutes")
      .groupByKey(_.user_id)
      .flatMapGroupsWithState(
        OutputMode.Append, GroupStateTimeout.EventTimeTimeout)(update)
  }

  /** Watermarked tumbling-window aggregation — the streaming groupBy. */
  def windowedCounts(
      events: DataFrame,
      windowMinutes: Int = 5,
      watermarkMinutes: Int = 10): DataFrame =
    events
      .withWatermark("ts", s"$watermarkMinutes minutes")
      .groupBy(window(col("ts"), s"$windowMinutes minutes"), col("event_type"))
      .agg(count(lit(1)).as("n"),
        sum(round(col("value") * 100).cast("long")).as("value_cents"))

  /** Streaming exact dedup: drop rows whose key was already seen within
    * the watermark horizon. A stateful FILTER, not an aggregation — the
    * first occurrence is emitted immediately (no flush sentinel needed in
    * Append mode) and later duplicates are swallowed; the watermark
    * bounds state by expiring keys older than `delay`, which is what
    * makes exact streaming dedup viable indefinitely (unbounded key
    * retention is the naive version's OOM). Batch twin: `dropDuplicates`
    * over the same keys. */
  def dedupStream(
      events: DataFrame,
      keys: Seq[String],
      eventTimeCol: String = "ts",
      delay: String = "1 hour"): DataFrame =
    events
      .withWatermark(eventTimeCol, delay)
      .dropDuplicatesWithinWatermark(keys)

  final case class TopKIn(user_id: Long, event_id: Long, cents: Long)
  // not private: the state encoder's generated code must reach the class
  final case class TopKState(version: Long, top: List[(Long, Long)])
  final case class TopKOut(user_id: Long, version: Long, rank: Long,
      event_id: Long, cents: Long)

  /** Streaming per-key top-k leaderboard: each key continuously
    * maintains its k best (cents desc, id asc) rows — the live-ranking
    * primitive (biggest purchases per user, hottest items per region).
    *
    * State is PROVABLY bounded at k (cents, id) pairs per key — and so
    * is the merge's WORKING SET: each batch folds its rows one at a
    * time into the k-slot board (O(k) memory, O(n·k) time for tiny k),
    * never materializing or sorting the group, so a hot key receiving
    * millions of rows in one micro-batch costs k slots, not an
    * executor's heap. A row identical to one already on the board is a
    * DUPLICATE DELIVERY (at-least-once upstream) and is skipped — a
    * naive merge would let the duplicate occupy a second slot and
    * permanently evict a legitimate entry. Each batch that touches a
    * key re-emits the key's current top-k tagged with a monotone
    * per-key `version`, so a consumer (or the bounded replay harness)
    * takes each key's max-version rows as the current board —
    * Update-mode emission without needing a watermark to close
    * anything, because a leaderboard never closes. Keys live forever by
    * contract (NoTimeout); compose a timeout the way the as-of joins do
    * if the keyspace churns. */
  def topKStream(rows: Dataset[TopKIn], k: Int): Dataset[TopKOut] = {
    require(k >= 1, "k must be at least 1")
    import rows.sparkSession.implicits._
    // board order: cents desc, id asc; board is always sorted + distinct
    def beats(a: (Long, Long), b: (Long, Long)): Boolean =
      a._1 > b._1 || (a._1 == b._1 && a._2 < b._2)
    def insert(board: List[(Long, Long)], e: (Long, Long)): List[(Long, Long)] =
      if (board.contains(e)) board // duplicate delivery: no second slot
      else {
        val (above, below) = board.span(beats(_, e))
        val merged = above ::: e :: below
        if (merged.lengthCompare(k) > 0) merged.take(k) else merged
      }
    rows.groupByKey(_.user_id)
      .flatMapGroupsWithState[TopKState, TopKOut](
        OutputMode.Update, GroupStateTimeout.NoTimeout) {
        case (key, it, state) =>
          val st = state.getOption.getOrElse(TopKState(0L, Nil))
          val merged = it.foldLeft(st.top)((b, r) =>
            insert(b, (r.cents, r.event_id)))
          val v = st.version + 1
          state.update(TopKState(v, merged))
          merged.zipWithIndex.iterator.map { case ((c, id), i) =>
            TopKOut(key, v, i + 1L, id, c)
          }
      }
  }

  /** Stream-stream bounded range join: every (left, right) pair agreeing
    * on the join keys with `|left.ts − right.ts| <= rangeSeconds` —
    * the streaming twin of `TemporalJoin.rangeJoinBucketed`, validated
    * against the same theta-join oracle.
    *
    * An INNER stream-stream join emits a pair as soon as both sides have
    * arrived — no flush sentinel needed (unlike Append-mode aggregation,
    * which waits for the watermark). The watermark plus the TWO-SIDED
    * time-bound condition is what bounds state: each side buffers only
    * rows within (watermark − range) of the stream head and expires the
    * rest, which is what makes an indefinitely-running join viable — an
    * unconstrained stream-stream join must buffer both streams forever.
    *
    * `joinType = "left_outer"` additionally emits each UNMATCHED left
    * row (right columns null) — but only once the watermark passes the
    * row's match window, since until then a matching right row could
    * still arrive; matched pairs keep the inner join's emit-on-arrival
    * timing. The tail consequence: left rows inside the final
    * (delay + range) of a stream that simply stops never see the
    * watermark close their window, so their null results stay buffered
    * — a bounded replay must append a max-timestamp flush row to
    * advance the watermark (the same discipline Append-mode
    * flatMapGroupsWithState needs).
    *
    * `keyPairs` maps left key column → right key column (callers rename
    * the right side's columns to keep the joined schema unambiguous). */
  def rangeJoinStream(
      left: DataFrame,
      right: DataFrame,
      keyPairs: Seq[(String, String)],
      leftTsCol: String,
      rightTsCol: String,
      rangeSeconds: Long,
      delay: String = "1 hour",
      joinType: String = "inner"): DataFrame = {
    require(keyPairs.nonEmpty, "range join requires at least one key pair")
    require(rangeSeconds > 0, "rangeSeconds must be positive")
    require(Set("inner", "left_outer").contains(joinType),
      s"unsupported joinType '$joinType' (inner | left_outer)")
    val l = left.withWatermark(leftTsCol, delay)
    val r = right.withWatermark(rightTsCol, delay)
    val range = expr(s"INTERVAL '$rangeSeconds' SECOND")
    val cond = keyPairs.map { case (a, b) => l.col(a) === r.col(b) }
      .reduce(_ && _) &&
      r.col(rightTsCol) >= l.col(leftTsCol) - range &&
      r.col(rightTsCol) <= l.col(leftTsCol) + range
    l.join(r, cond, joinType)
  }

  /** Input row for [[asofJoinStream]]: both sides union into ONE stream
    * (single event-time column → single watermark), tagged by side.
    * Right rows must be unique per (key, ts) — pre-aggregate ties
    * upstream, exactly the batch [[TemporalJoin]] contract. */
  final case class AsofIn(key: Long, ts: Timestamp, is_left: Boolean,
      id: Long, cents: Long)

  /** One resolved left row: right side None when no right row at-or-
    * before the left timestamp exists (left-outer semantics). */
  final case class AsofOut(key: Long, l_id: Long, l_ts_us: Long,
      r_id: Option[Long], r_ts_us: Option[Long], r_cents: Option[Long])

  /** Merge the as-of state's (ts, id)-sorted rights buffer with a sorted
    * batch delta — O(n + m) per invocation, and the common no-new-rights
    * wake (watermark timeouts fire every micro-batch) returns the state
    * buffer untouched. A full re-sort per invocation would be
    * O(n log n) per key per batch even with an empty delta — at odds
    * with the indefinitely-running contract. */
  private def mergeSortedRights(
      a: List[(Long, Long, Long)],
      b: List[(Long, Long, Long)]): List[(Long, Long, Long)] =
    if (b.isEmpty) a
    else if (a.isEmpty) b
    else {
      val buf = List.newBuilder[(Long, Long, Long)]
      var x = a
      var y = b
      while (x.nonEmpty && y.nonEmpty) {
        val takeX = x.head._1 < y.head._1 ||
          (x.head._1 == y.head._1 && x.head._2 <= y.head._2)
        if (takeX) { buf += x.head; x = x.tail }
        else { buf += y.head; y = y.tail }
      }
      buf ++= x
      buf ++= y
      buf.result()
    }

  // not private: the state encoder's generated code must reach the class
  final case class AsofState(
      pending: List[(Long, Long)], // unresolved lefts: (tsUs, id)
      rights: List[(Long, Long, Long)]) // (tsUs, id, cents), ts-ascending

  /** Stream-stream BACKWARD AS-OF join — each left row picks up the most
    * recent right row at or before its timestamp — which Spark's native
    * stream-stream joins cannot express (an as-of needs "latest ≤ ts",
    * not a symmetric time band). Custom state via
    * flatMapGroupsWithState, the (c)-tier escalation SURVEY.md §7
    * reserves for semantics the built-ins can't compose.
    *
    * Correctness contract: a left row finalizes only once the watermark
    * passes its timestamp STRICTLY — until then a right row at-or-before
    * it could still arrive; after, Spark's late-row filter guarantees
    * the right history below the watermark is complete, so the match
    * (or its absence, emitted as nulls) is final. Emission is therefore
    * watermark-driven, like Append-mode aggregation: a bounded replay
    * appends one far-future flush row (single stream → one sentinel
    * flushes BOTH sides).
    *
    * State is bounded by construction: unresolved lefts drain at the
    * watermark, and of the right history at-or-below the watermark only
    * the LATEST row can ever be "most recent ≤ ts" for a future left
    * (future lefts sit above the watermark), so the rest prunes — per
    * key the steady state is one right row plus in-flight traffic. The
    * one unbounded-lookback consequence: that single latest right row
    * per key lives as long as the key (the operator's default contract
    * is unbounded lookback, the reason Spark's range-bounded native
    * joins can't express it).
    *
    * `maxLookbackSeconds` (opt-in) bounds the lookback instead: a left
    * at ts matches the latest right in `[ts − lookback, ts]` — the
    * streaming twin of the batch `asofBackwardTolerant` — and the
    * retained right now FULLY expires. A right at ts r can only serve
    * lefts with ts in `[r, r + lookback]`; lefts below the watermark are
    * late-dropped and the oldest pending left bounds what current lefts
    * still need, so once `min(watermark, oldest pending) − lookback`
    * passes r the row prunes, and an event-time timeout at the last
    * right's expiry wakes the key to clean itself even if no further
    * traffic arrives. Keys that churn (appear, trade for a while, go
    * quiet) release their state within one lookback of going quiet —
    * the posture an indefinitely-running join over a churning keyspace
    * needs. */
  def asofJoinStream(
      rows: Dataset[AsofIn],
      delay: String = "1 hour",
      maxLookbackSeconds: Option[Long] = None): Dataset[AsofOut] = {
    import rows.sparkSession.implicits._
    require(maxLookbackSeconds.forall(_ > 0),
      "maxLookbackSeconds must be positive when set")
    val lookbackUs = maxLookbackSeconds.map(_ * 1000000L)

    def micros(ts: Timestamp): Long =
      ts.getTime * 1000L + (ts.getNanos / 1000L) % 1000L

    def update(
        key: Long,
        it: Iterator[AsofIn],
        state: GroupState[AsofState]): Iterator[AsofOut] = {
      var st = state.getOption.getOrElse(AsofState(Nil, Nil))
      if (!state.hasTimedOut) {
        val batch = it.toSeq
        val newLefts = batch.filter(_.is_left)
          .map(r => (micros(r.ts), r.id))
        val newRights = batch.filter(!_.is_left)
          .map(r => (micros(r.ts), r.id, r.cents))
        st = AsofState(st.pending ++ newLefts,
          mergeSortedRights(st.rights,
            newRights.sortBy(r => (r._1, r._2)).toList))
      }
      val wmUs = state.getCurrentWatermarkMs() * 1000L
      // finalize lefts strictly below the watermark (a right row AT the
      // watermark could still arrive; one at or below a finalized left's
      // ts could not — it would be late-dropped)
      val (ready, still) = st.pending.partition(_._1 < wmUs)
      val out = ready.sorted.map { case (lts, lid) =>
        val m = st.rights.filter(r => r._1 <= lts &&
          lookbackUs.forall(lb => r._1 >= lts - lb)).lastOption
        AsofOut(key, lid, lts, m.map(_._2), m.map(_._1), m.map(_._3))
      }
      // prune rights: everything above the watermark survives, plus only
      // the latest at-or-below it (the sole candidate for future lefts);
      // under bounded lookback a right additionally expires once no
      // reachable left — pending or future — can look back that far
      val (above, below) = st.rights.partition(_._1 > wmUs)
      // the lookback floor is just the watermark: `still` only holds
      // lefts AT-or-above it (ready finalized everything below), so
      // min(wm, oldest pending) would always collapse to wm — unlike the
      // forward variant, where lefts legitimately pend below the
      // watermark until ts + tol
      val floorUs = wmUs
      val kept = (below.lastOption.toList ++ above)
        .filter(r => lookbackUs.forall(lb => r._1 >= floorUs - lb))
      st = AsofState(still, kept)
      if (still.isEmpty && st.rights.isEmpty) {
        // a key that drained its lefts and holds no live right must not
        // leak an empty state entry forever
        state.remove()
      } else {
        state.update(st)
        if (still.nonEmpty) {
          val minPendingMs = still.map(_._1).min / 1000L
          state.setTimeoutTimestamp(
            math.max(minPendingMs + 1, state.getCurrentWatermarkMs() + 1))
        } else lookbackUs.foreach { lb =>
          // rights only: wake at the last right's expiry so the state
          // self-cleans instead of lingering until the next event
          val lastExpiryMs = (st.rights.map(_._1).max + lb) / 1000L
          state.setTimeoutTimestamp(
            math.max(lastExpiryMs + 1, state.getCurrentWatermarkMs() + 1))
        }
      }
      out.iterator
    }

    rows
      .withWatermark("ts", delay)
      .groupByKey(_.key)
      .flatMapGroupsWithState(
        OutputMode.Append, GroupStateTimeout.EventTimeTimeout)(update)
  }

  /** Stream-stream FORWARD tolerance-bounded as-of join — each left row
    * picks up the EARLIEST right row in `[ts, ts + tolSeconds]` (ties →
    * min id; uniqueness per (key, ts) is the caller's contract, as in
    * [[asofJoinStream]]). Forward as-of is only implementable streaming
    * WITH a tolerance: an unbounded forward match could always be one
    * more batch away, so no left could ever finalize — the bound is
    * what turns "wait forever" into "finalize once the watermark
    * strictly passes ts + tol" (at which point the candidate window is
    * complete by the late-row filter).
    *
    * Unlike the backward join's one-retained-row-per-key-forever, this
    * state FULLY expires: a right row is matchable only by lefts with
    * ts in `[r.ts − tol, r.ts]`, and once the watermark passes a
    * boundary neither side below it can matter — rights prune at
    * `min(watermark, oldest pending left)`, pending lefts drain at
    * `ts + tol`, and a key whose buffers empty removes its state
    * entirely. Retention horizon ≈ tolerance + in-flight traffic. */
  def asofFwdJoinStream(
      rows: Dataset[AsofIn],
      tolSeconds: Long,
      delay: String = "1 hour"): Dataset[AsofOut] = {
    import rows.sparkSession.implicits._
    require(tolSeconds > 0, "tolSeconds must be positive")
    val tolUs = tolSeconds * 1000000L

    def micros(ts: Timestamp): Long =
      ts.getTime * 1000L + (ts.getNanos / 1000L) % 1000L

    def update(
        key: Long,
        it: Iterator[AsofIn],
        state: GroupState[AsofState]): Iterator[AsofOut] = {
      var st = state.getOption.getOrElse(AsofState(Nil, Nil))
      if (!state.hasTimedOut) {
        val batch = it.toSeq
        st = AsofState(
          st.pending ++ batch.filter(_.is_left).map(r => (micros(r.ts), r.id)),
          mergeSortedRights(st.rights,
            batch.filter(!_.is_left)
              .map(r => (micros(r.ts), r.id, r.cents))
              .sortBy(r => (r._1, r._2)).toList))
      }
      val wmUs = state.getCurrentWatermarkMs() * 1000L
      // finalize once the watermark strictly passes ts + tol: the
      // candidate window [ts, ts + tol] can no longer gain rows
      val (ready, still) = st.pending.partition(_._1 + tolUs < wmUs)
      val out = ready.sorted.map { case (lts, lid) =>
        val m = st.rights
          .find(r => r._1 >= lts && r._1 <= lts + tolUs)
        AsofOut(key, lid, lts, m.map(_._2), m.map(_._1), m.map(_._3))
      }
      // a right at ts r serves lefts with ts in [r - tol, r]; lefts
      // below the watermark are late-dropped and the oldest pending one
      // bounds what current lefts still need
      val floorUs =
        if (still.isEmpty) wmUs else math.min(wmUs, still.map(_._1).min)
      st = AsofState(still, st.rights.filter(_._1 >= floorUs))
      if (still.isEmpty && st.rights.isEmpty) {
        state.remove()
      } else {
        state.update(st)
        // wake when the next pending left's window closes, or — with
        // only rights buffered — when the last right expires, so the
        // state self-cleans instead of lingering until the next event
        val nextUs =
          if (still.nonEmpty) still.map(_._1).min + tolUs
          else st.rights.map(_._1).max
        state.setTimeoutTimestamp(
          math.max(nextUs / 1000L + 1, state.getCurrentWatermarkMs() + 1))
      }
      out.iterator
    }

    rows
      .withWatermark("ts", delay)
      .groupByKey(_.key)
      .flatMapGroupsWithState(
        OutputMode.Append, GroupStateTimeout.EventTimeTimeout)(update)
  }

  /** Stream-static enrichment: join the event stream against a bounded
    * dimension table. Stateless — no watermark, no state store: each
    * micro-batch joins against the static side and emits immediately,
    * so Append mode works with zero flush machinery.
    *
    * The dimension is explicitly `broadcast()`: a dimension small enough
    * to enrich a stream with should never force the stream through a
    * per-micro-batch shuffle (a sort-merge plan would re-exchange every
    * batch). For dimensions past broadcast size, pre-bucket both sides
    * on the key instead. `keyPairs` maps stream column → dimension
    * column; dimension columns are rolled in via the join, so callers
    * select/rename what they need on the dim side beforehand. */
  def enrichStream(
      events: DataFrame,
      dim: DataFrame,
      keyPairs: Seq[(String, String)]): DataFrame = {
    require(keyPairs.nonEmpty, "enrichment requires at least one key pair")
    val b = org.apache.spark.sql.functions.broadcast(dim)
    val cond = keyPairs.map { case (a, k) => events.col(a) === b.col(k) }
      .reduce(_ && _)
    events.join(b, cond, "left")
  }

  /** Convenience: run a streaming query over a bounded source and collect
    * results synchronously (for tests / local smoke).
    *
    * `statePartitions`: a stateful query's state-store count is frozen to
    * `spark.sql.shuffle.partitions` at first start. For a bounded local
    * run, the session default (cores) builds and checkpoints that many
    * near-empty state stores per micro-batch — pure overhead. Positive
    * values pin the count for THIS query (conf set around `start()`,
    * restored after — the value is captured at query start so the restore
    * can't race the running query). On a real cluster size it to the
    * keyspace instead. */
  def runToMemory(
      spark: SparkSession,
      out: DataFrame,
      name: String,
      mode: OutputMode = OutputMode.Append,
      statePartitions: Int = 0): DataFrame = {
    val key = "spark.sql.shuffle.partitions"
    val prev = spark.conf.get(key)
    if (statePartitions > 0) spark.conf.set(key, statePartitions)
    try {
      val q = out.writeStream.format("memory").queryName(name)
        .outputMode(mode).start()
      q.processAllAvailable()
      q.stop()
    } finally if (statePartitions > 0) spark.conf.set(key, prev)
    spark.table(name)
  }
}
