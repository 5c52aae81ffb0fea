package graft

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.OutputMode

import graft.streaming.Sessionize
import graft.streaming.Sessionize.Event

/** Sessionization: batch gaps-and-islands semantics, the streaming
  * flatMapGroupsWithState twin (sessions closed by gap or watermark
  * timeout), and the watermarked windowed aggregation. */
class SessionizeSpec extends SparkSuite {
  import spark.implicits._

  // Base offset keeps event times off epoch 0: the first batch's initial
  // watermark is 0 and a row AT the watermark sits on the late-data edge.
  private def ts(minutes: Long): Timestamp =
    new Timestamp((100000L + minutes) * 60000L)

  private val events = Seq(
    // user 1: two sessions (gap 40min > 30min threshold)
    Event(1L, ts(0), 1L, "view", 1.0),
    Event(2L, ts(10), 1L, "click", 2.0),
    Event(3L, ts(50), 1L, "view", 3.0),
    Event(4L, ts(55), 1L, "purchase", 4.0),
    // user 2: one session
    Event(5L, ts(5), 2L, "view", 5.0),
    Event(6L, ts(20), 2L, "view", 6.0))

  test("batch sessionization: session indices break on the gap") {
    val out = Sessionize.sessionizeBatch(events.toDF(), gapMinutes = 30)
      .select($"event_id", $"session_idx").as[(Long, Long)].collect().toMap
    assert(out(1L) == 1L && out(2L) == 1L)
    assert(out(3L) == 2L && out(4L) == 2L)
    assert(out(5L) == 1L && out(6L) == 1L)
  }

  test("batch session summary: bounds, counts, exact cents") {
    val out = Sessionize.sessionSummaryBatch(events.toDF(), gapMinutes = 30)
      .orderBy($"user_id", $"session_idx").collect()
    assert(out.length == 3)
    val s1 = out(0) // user 1, session 1
    assert(s1.getAs[Long]("n_events") == 2L)
    assert(s1.getAs[Timestamp]("session_start") == ts(0))
    assert(s1.getAs[Timestamp]("session_end") == ts(10))
    assert(s1.getAs[Long]("value_cents") == 300L)
  }

  test("streaming sessionization closes sessions on gap and agrees with batch") {
    implicit val sqlCtx = spark.sqlContext
    val stream = MemoryStream[Event]
    val sessions = Sessionize.sessionizeStream(stream.toDS(), gapMinutes = 30)

    val query = sessions.writeStream.format("memory")
      .queryName("sessions_test").outputMode(OutputMode.Append).start()
    try {
      // batch 1: user 1's first session + the opening of user 2's
      stream.addData(events.filter(_.event_id <= 2): _*)
      query.processAllAvailable()
      // batch 2: user 1's second session starts -> first session closes on gap
      stream.addData(events.filter(_.event_id > 2): _*)
      query.processAllAvailable()
      // batch 3: a far-future event advances the watermark past every
      // open session's timeout, flushing them
      stream.addData(Event(99L, ts(1000), 9L, "view", 0.0))
      query.processAllAvailable()
      stream.addData(Event(100L, ts(2000), 9L, "view", 0.0))
      query.processAllAvailable()

      val streamed = spark.table("sessions_test")
        .filter($"user_id" <= 2)
        .select($"user_id", $"session_start", $"session_end", $"n_events")
        .as[(Long, Timestamp, Timestamp, Long)].collect().toSet
      val batch = Sessionize.sessionSummaryBatch(events.toDF(), gapMinutes = 30)
        .select($"user_id", $"session_start", $"session_end", $"n_events")
        .as[(Long, Timestamp, Timestamp, Long)].collect().toSet
      assert(streamed == batch,
        s"streaming $streamed differs from batch $batch")
    } finally {
      query.stop()
      spark.sql("DROP VIEW IF EXISTS sessions_test")
    }
  }

  test("streaming dedup: cross-batch duplicates swallowed, first " +
    "occurrence emitted immediately") {
    implicit val sqlCtx = spark.sqlContext
    val stream = MemoryStream[Event]
    val deduped = Sessionize.dedupStream(stream.toDS().toDF(),
      keys = Seq("event_id"), delay = "30 minutes")
    val query = deduped.writeStream.format("memory")
      .queryName("dedup_test").outputMode(OutputMode.Append).start()
    try {
      // batch 1 carries an in-batch duplicate; batch 2 re-sends event 1
      // (cross-batch dup, still inside the watermark horizon) plus a new
      // event
      stream.addData(events(0), events(0), events(1))
      query.processAllAvailable()
      stream.addData(events(0), events(2))
      query.processAllAvailable()
      val got = spark.table("dedup_test")
        .select($"event_id").as[Long].collect().toSeq.sorted
      assert(got == Seq(events(0), events(1), events(2)).map(_.event_id).sorted)
    } finally {
      query.stop()
      spark.sql("DROP VIEW IF EXISTS dedup_test")
    }
  }

  test("stream-stream range join emits exactly the theta join's pairs, " +
    "inclusive bounds, key isolation") {
    implicit val sqlCtx = spark.sqlContext
    val ls = MemoryStream[Event]
    val rs = MemoryStream[Event]
    val left = ls.toDF().select($"event_id".as("l_id"), $"user_id",
      $"ts".as("l_ts"))
    val right = rs.toDF().select($"event_id".as("r_id"),
      $"user_id".as("r_user"), $"ts".as("r_ts"))
    val out = Sessionize.rangeJoinStream(left, right,
      keyPairs = Seq("user_id" -> "r_user"),
      leftTsCol = "l_ts", rightTsCol = "r_ts",
      rangeSeconds = 30 * 60, delay = "1 hour")
    val query = out.select($"l_id", $"r_id")
      .writeStream.format("memory")
      .queryName("rj_test").outputMode(OutputMode.Append).start()
    try {
      // user 1: r at +30min exactly (inclusive edge), r at +31min (out);
      // user 2: r in range but different key than user 1's l
      ls.addData(Event(1L, ts(0), 1L, "signup", 0.0),
        Event(2L, ts(100), 2L, "signup", 0.0))
      rs.addData(Event(10L, ts(30), 1L, "view", 0.0),
        Event(11L, ts(31), 1L, "view", 0.0),
        Event(12L, ts(90), 2L, "view", 0.0),
        Event(13L, ts(105), 1L, "view", 0.0)) // user 1, near user 2's l
      query.processAllAvailable()
      val got = spark.table("rj_test")
        .as[(Long, Long)].collect().toSet
      assert(got == Set((1L, 10L), (2L, 12L)))
    } finally {
      query.stop()
      spark.sql("DROP VIEW IF EXISTS rj_test")
    }
  }

  test("stream as-of join: finalizes only at the watermark (cross-batch " +
    "rights land), emits nulls left-outer, pruning keeps the live right") {
    implicit val sqlCtx = spark.sqlContext
    import graft.streaming.Sessionize.AsofIn
    val stream = MemoryStream[AsofIn]
    val out = Sessionize.asofJoinStream(stream.toDS())
    val query = out.toDF().writeStream.format("memory")
      .queryName("asof_test").outputMode(OutputMode.Append).start()
    try {
      // batch 1: a right at t10, lefts at t20/t5 (t5 precedes every
      // right), and a key-2 left (isolation)
      stream.addData(
        AsofIn(1L, ts(10), is_left = false, 100L, 5L),
        AsofIn(1L, ts(20), is_left = true, 1L, 0L),
        AsofIn(1L, ts(5), is_left = true, 2L, 0L),
        AsofIn(2L, ts(30), is_left = true, 3L, 0L))
      query.processAllAvailable()
      // batch 2: a LATER-ARRIVING right at t15 — the t20 left must pick
      // it up, proving lefts aren't finalized before the watermark
      stream.addData(AsofIn(1L, ts(15), is_left = false, 101L, 7L))
      query.processAllAvailable()
      // nothing can have finalized yet: watermark ~ t30 - 1h
      assert(spark.table("asof_test").count() == 0L)
      // batch 3: flush row -> watermark ~ t940, lefts t5/t20/t30 resolve
      stream.addData(AsofIn(9L, ts(1000), is_left = true, -9L, 0L))
      query.processAllAvailable()
      // batch 4: a fresh left above the watermark must still match the
      // PRUNED right history's survivor (latest right ≤ watermark)
      stream.addData(AsofIn(1L, ts(950), is_left = true, 4L, 0L))
      query.processAllAvailable()
      stream.addData(AsofIn(9L, ts(3000), is_left = true, -10L, 0L))
      query.processAllAvailable()

      val got = spark.table("asof_test")
        .filter($"key" <= 2)
        .select($"l_id", $"r_id", $"r_cents")
        .as[(Long, Option[Long], Option[Long])].collect().toSet
      assert(got == Set(
        (1L, Some(101L), Some(7L)), // t20 -> cross-batch right at t15
        (2L, None, None), // no right at-or-before t5
        (3L, None, None), // key isolation: key 2 saw no rights
        (4L, Some(101L), Some(7L)))) // post-prune match survives

      // state hygiene: key 2 drained its lefts with no buffered rights
      // and must have REMOVED its state; key 1 retains its one live
      // right, key 9 its still-pending flush left — 2 state rows, not 3
      val stateRows = Option(query.lastProgress)
        .map(_.stateOperators.map(_.numRowsTotal).sum)
      assert(stateRows.contains(2L),
        s"expected 2 retained state rows (leak-free), got $stateRows")
    } finally {
      query.stop()
      spark.sql("DROP VIEW IF EXISTS asof_test")
    }
  }

  test("stream as-of with bounded lookback: stale rights null out and " +
    "the retained right fully expires from the state store") {
    implicit val sqlCtx = spark.sqlContext
    import graft.streaming.Sessionize.AsofIn
    val stream = MemoryStream[AsofIn]
    val out = Sessionize.asofJoinStream(stream.toDS(),
      maxLookbackSeconds = Some(30 * 60)) // 30-minute lookback
    val query = out.toDF().writeStream.format("memory")
      .queryName("asof_tol_test").outputMode(OutputMode.Append).start()
    try {
      // key 1: right at t10; lefts at t20 (lag 10min, in window), t40
      // (lag 30min, inclusive edge), t50 (lag 40min — stale, nulls)
      stream.addData(
        AsofIn(1L, ts(10), is_left = false, 100L, 5L),
        AsofIn(1L, ts(20), is_left = true, 1L, 0L),
        AsofIn(1L, ts(40), is_left = true, 2L, 0L),
        AsofIn(1L, ts(50), is_left = true, 3L, 0L))
      query.processAllAvailable()
      // flush: watermark passes every left AND t10 + lookback
      stream.addData(AsofIn(9L, ts(3000), is_left = true, -9L, 0L))
      query.processAllAvailable()

      val got = spark.table("asof_tol_test")
        .filter($"key" === 1)
        .select($"l_id", $"r_id", $"r_cents")
        .as[(Long, Option[Long], Option[Long])].collect().toSet
      assert(got == Set(
        (1L, Some(100L), Some(5L)), // within lookback
        (2L, Some(100L), Some(5L)), // inclusive boundary: lag == lookback
        (3L, None, None))) // latest right exists but is stale -> nulled

      // state hygiene: the UNBOUNDED variant would retain key 1's right
      // forever; under bounded lookback the right expired once the
      // watermark passed t10 + 30min, and with no pending lefts key 1's
      // state was REMOVED — only key 9's still-pending flush left
      // remains
      val stateRows = Option(query.lastProgress)
        .map(_.stateOperators.map(_.numRowsTotal).sum)
      assert(stateRows.contains(1L),
        s"expected 1 retained state row (full expiry), got $stateRows")
    } finally {
      query.stop()
      spark.sql("DROP VIEW IF EXISTS asof_tol_test")
    }
  }

  test("stream forward as-of: earliest right within tolerance, " +
    "cross-batch rights honored, out-of-tolerance and backward rights " +
    "yield nulls") {
    implicit val sqlCtx = spark.sqlContext
    import graft.streaming.Sessionize.AsofIn
    val stream = MemoryStream[AsofIn]
    val out = Sessionize.asofFwdJoinStream(stream.toDS(),
      tolSeconds = 30 * 60)
    val query = out.toDF().writeStream.format("memory")
      .queryName("asof_fwd_test").outputMode(OutputMode.Append).start()
    try {
      stream.addData(
        AsofIn(1L, ts(0), is_left = true, 1L, 0L), // -> earliest of two
        AsofIn(1L, ts(10), is_left = false, 100L, 5L),
        AsofIn(1L, ts(20), is_left = false, 101L, 7L),
        AsofIn(1L, ts(100), is_left = true, 2L, 0L), // nearest right +31min
        AsofIn(1L, ts(200), is_left = true, 3L, 0L), // right lands in b2
        AsofIn(1L, ts(50), is_left = true, 4L, 0L)) // all rights behind it
      query.processAllAvailable()
      // batch 1's max event time (t200) advances the watermark to t140,
      // so lefts 1/2/4 finalize in the trailing timeout batch — their
      // 30-min windows closed inside batch 1's own data. Only l3
      // (window open until t230) is still pending here; its right
      // arrives in batch 2. (Strictly-at-the-watermark finalization
      // timing is pinned by the backward as-of test.)
      stream.addData(
        AsofIn(1L, ts(131), is_left = false, 103L, 9L),
        AsofIn(1L, ts(210), is_left = false, 102L, 8L))
      query.processAllAvailable()
      stream.addData(AsofIn(9L, ts(3000), is_left = true, -9L, 0L))
      query.processAllAvailable()
      stream.addData(AsofIn(9L, ts(6000), is_left = true, -10L, 0L))
      query.processAllAvailable()

      val got = spark.table("asof_fwd_test")
        .filter($"key" <= 2)
        .select($"l_id", $"r_id", $"r_cents")
        .as[(Long, Option[Long], Option[Long])].collect().toSet
      assert(got == Set(
        (1L, Some(100L), Some(5L)), // earliest in-window, not latest
        (2L, None, None), // ts(131) is 31 min out -> beyond tolerance
        (3L, Some(102L), Some(8L)), // cross-batch right at +10min
        (4L, None, None))) // rights exist only BEHIND the left
    } finally {
      query.stop()
      spark.sql("DROP VIEW IF EXISTS asof_fwd_test")
    }
  }

  test("watermarked windowed counts over a bounded stream match the batch twin") {
    implicit val sqlCtx = spark.sqlContext
    val stream = MemoryStream[Event]
    val out = Sessionize.windowedCounts(stream.toDF(),
      windowMinutes = 15, watermarkMinutes = 10)

    val query = out.writeStream.format("memory")
      .queryName("wincounts_test").outputMode(OutputMode.Append).start()
    try {
      stream.addData(events: _*)
      query.processAllAvailable()
      // advance watermark far enough to close every window
      stream.addData(Event(100L, ts(500), 9L, "view", 0.0))
      query.processAllAvailable()
      stream.addData(Event(101L, ts(1000), 9L, "view", 0.0))
      query.processAllAvailable()

      val streamed = spark.table("wincounts_test")
        .filter($"window.start" < ts(400))
        .select(col("window.start"), $"event_type", $"n", $"value_cents")
        .as[(Timestamp, String, Long, Long)].collect().toSet
      val batch = events.toDF()
        .groupBy(window($"ts", "15 minutes"), $"event_type")
        .agg(count(lit(1)).as("n"),
          sum(round($"value" * 100).cast("long")).as("value_cents"))
        .select(col("window.start"), $"event_type", $"n", $"value_cents")
        .as[(Timestamp, String, Long, Long)].collect().toSet
      assert(streamed == batch)
    } finally {
      query.stop()
      spark.sql("DROP VIEW IF EXISTS wincounts_test")
    }
  }

  test("append-mode windowed aggregation holds BOUNDED state — " +
    "emitted windows expire with the watermark, retained rows never " +
    "exceed keys × open windows — while Complete mode retains the " +
    "whole domain") {
    implicit val sqlCtx = spark.sqlContext
    def agg(stream: MemoryStream[Event]) = stream.toDS().toDF()
      .withWatermark("ts", "10 minutes")
      .groupBy(window($"ts", "1 hour"), $"event_type")
      .agg(count(lit(1)).as("n"))
    // 10 hours × 2 event types = 20 windows of history
    def feed(stream: MemoryStream[Event]): Unit =
      (0 until 10).foreach { h =>
        stream.addData(
          Event(h * 2L, ts(h * 60L), 1L, "view", 1.0),
          Event(h * 2L + 1, ts(h * 60L + 30), 1L, "click", 1.0))
      }

    // the batch twin decides which (window, type) groups the final
    // watermark (max event ts − 10 min) FINALIZED — the same contract
    // the driver oracle for ev_stream_windowed_agg_append pins
    val all = (0 until 10).flatMap(h => Seq(
      Event(h * 2L, ts(h * 60L), 1L, "view", 1.0),
      Event(h * 2L + 1, ts(h * 60L + 30), 1L, "click", 1.0)))
    val groups = all.toDF()
      .groupBy(window($"ts", "1 hour"), $"event_type")
      .agg(count(lit(1)).as("n"))
      .select(col("window.end").as("win_end"))
      .as[Timestamp].collect()
    val wm = new Timestamp(all.map(_.ts.getTime).max - 10 * 60000L)
    val finalized = groups.count(_.getTime <= wm.getTime).toLong
    val open = groups.length - finalized
    assert(finalized > 0 && open > 0, "fixture must leave windows open")

    val s1 = MemoryStream[Event]
    val q1 = agg(s1).writeStream.format("memory")
      .queryName("win_append_state").outputMode(OutputMode.Append).start()
    try {
      feed(s1)
      q1.processAllAvailable()
      assert(spark.table("win_append_state").count() == finalized,
        "append mode emits exactly the finalized windows")
      val appendState = Option(q1.lastProgress)
        .map(_.stateOperators.map(_.numRowsTotal).sum)
      assert(appendState.contains(open.toLong),
        s"append-mode state must hold ONLY the $open open window " +
          s"group(s) inside the horizon, got $appendState — emitted " +
          "windows must expire")
    } finally {
      q1.stop(); spark.sql("DROP VIEW IF EXISTS win_append_state")
    }

    val s2 = MemoryStream[Event]
    val q2 = agg(s2).writeStream.format("memory")
      .queryName("win_complete_state").outputMode(OutputMode.Complete)
      .start()
    try {
      feed(s2)
      q2.processAllAvailable()
      // Complete mode re-emits and RETAINS every window ever seen —
      // state grows with the domain, the shape that cannot run
      // indefinitely at feed scale
      assert(spark.table("win_complete_state").count() == groups.length)
      val completeState = Option(q2.lastProgress)
        .map(_.stateOperators.map(_.numRowsTotal).sum)
      assert(completeState.contains(groups.length.toLong),
        s"Complete-mode state retains the whole domain " +
          s"(${groups.length} windows), got $completeState")
    } finally {
      q2.stop(); spark.sql("DROP VIEW IF EXISTS win_complete_state")
    }
  }

  test("Complete-mode stream twins hold DOMAIN-bounded state: ks " +
    "counts, kmv sketches, fixed-width histograms and group profiles " +
    "retain one state row per group/bin — never per input row") {
    implicit val sqlCtx = spark.sqlContext
    // 2000 input rows over a TINY domain: 2 groups × 10 distinct
    // values — the Complete-mode families' structural claim is that
    // state scales with THIS, not with the 2000
    val n = 2000
    def completeState(name: String,
        out: org.apache.spark.sql.DataFrame): (Long, Long) = {
      val q = out.writeStream.format("memory").queryName(name)
        .outputMode(OutputMode.Complete).start()
      try {
        q.processAllAvailable()
        (spark.table(name).count(),
          Option(q.lastProgress)
            .map(_.stateOperators.map(_.numRowsTotal).sum)
            .getOrElse(-1L))
      } finally { q.stop(); spark.sql(s"DROP VIEW IF EXISTS $name") }
    }

    // ks family (ev_stream_ks): groupBy(type, value) side counts —
    // state = |types × distinct values| = 20
    val ks = MemoryStream[(String, Long, Long)]
    ks.addData((0 until n).map(i =>
      (s"t${i % 2}", ((i / 2) % 10).toLong, (i % 2).toLong)): _*)
    val ksAgg = ks.toDF().toDF("event_type", "cents", "side")
      .groupBy($"event_type", $"cents")
      .agg(sum(when($"side" === 0, 1L).otherwise(0L)).as("ca"),
        sum(when($"side" === 1, 1L).otherwise(0L)).as("cb"))
    val (ksRows, ksState) = completeState("ks_state_pin", ksAgg)
    assert(ksRows == 20L && ksState == 20L,
      s"ks state must be the 20-pair domain, got rows=$ksRows " +
        s"state=$ksState for $n inputs")

    // kmv family (text_stream_kmv): one sketch row per source — state
    // = |sources| = 2, each holding ≤ k mins whatever the word count
    val kmv = MemoryStream[(String, String)]
    kmv.addData((0 until n).map(i => (s"s${i % 2}", s"w${i % 500}")): _*)
    val kmvAgg = graft.functions.Kmv.kmvDistinct(
      kmv.toDF().toDF("source", "word"), "source", "word", k = 64)
    val (kmvRows, kmvState) = completeState("kmv_state_pin", kmvAgg)
    assert(kmvRows == 2L && kmvState == 2L,
      s"kmv state must be one sketch row per source, got " +
        s"rows=$kmvRows state=$kmvState for $n inputs")

    // histogram family (ev_stream_histogram): width-5 bins over the
    // 0..9 domain — state = |types × bins| = 4
    val hist = MemoryStream[(String, Long)]
    hist.addData((0 until n).map(i =>
      (s"t${i % 2}", (i % 10).toLong)): _*)
    val histAgg = graft.operators.Stats.histogram(
      hist.toDF().toDF("event_type", "cents"), "cents",
      Seq("event_type"), width = 5L)
    val (hRows, hState) = completeState("hist_state_pin", histAgg)
    assert(hRows == 4L && hState == 4L,
      s"histogram state must be the bin domain (4), got rows=$hRows " +
        s"state=$hState for $n inputs")

    // profile family (ev_stream_profile): one profile row per group —
    // state = |types| = 2
    val prof = MemoryStream[(String, Long)]
    prof.addData((0 until n).map(i =>
      (s"t${i % 2}", (i % 10).toLong)): _*)
    val profAgg = graft.operators.Stats.profileByGroup(
      prof.toDF().toDF("event_type", "v"), "event_type", "v", k = 64)
    val (pRows, pState) = completeState("prof_state_pin", profAgg)
    assert(pRows == 2L && pState == 2L,
      s"profile state must be one row per group, got rows=$pRows " +
        s"state=$pState for $n inputs")
  }
}
