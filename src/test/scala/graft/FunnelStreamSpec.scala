package graft

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.OutputMode

import graft.streaming.{FunnelStream, Sessionize}
import graft.streaming.Sessionize.Event

/** The streaming funnel's watermark-final contract: step-typed events
  * buffer until the user's horizon passes, the fold runs in event-time
  * order regardless of ARRIVAL order, and the result equals the batch
  * funnel. */
class FunnelStreamSpec extends SparkSuite {
  import spark.implicits._

  private def ts(minutes: Long): Timestamp =
    new Timestamp((100000L + minutes) * 60000L)

  // user 1 converts fully; user 2 stalls after signup (their only click
  // is BEFORE the signup, so strictly-after rejects it); user 3 never
  // signs up (clicks/purchases only — no funnel row at all)
  private val events = Seq(
    Event(1L, ts(0), 1L, "signup", 0.0),
    Event(2L, ts(5), 1L, "click", 0.0),
    Event(3L, ts(9), 1L, "purchase", 1.0),
    Event(4L, ts(3), 2L, "click", 0.0),
    Event(5L, ts(4), 2L, "signup", 0.0),
    Event(6L, ts(2), 3L, "click", 0.0),
    Event(7L, ts(6), 3L, "purchase", 1.0))

  private val steps = Seq("signup", "click", "purchase")

  private var runIdx = 0
  private def runStream(batches: Seq[Seq[Event]]): Map[Long, (Seq[Long], Long)] = {
    implicit val sqlCtx = spark.sqlContext
    runIdx += 1
    val sink = s"funnel_stream_test_$runIdx"
    val stream = MemoryStream[Event]
    val hits = FunnelStream.funnelStream(stream.toDS(), steps,
      horizonMinutes = 30)
    val query = hits.writeStream.format("memory")
      .queryName(sink).outputMode(OutputMode.Append).start()
    try {
      batches.foreach { b => stream.addData(b: _*); query.processAllAvailable() }
      // two far-future flush rows: the first advances the watermark, the
      // following no-data handling fires the registered timeouts
      stream.addData(Event(98L, ts(5000), 9L, "view", 0.0))
      query.processAllAvailable()
      stream.addData(Event(99L, ts(9000), 9L, "view", 0.0))
      query.processAllAvailable()
      spark.table(sink).filter($"user_id" < 9L)
        .as[FunnelStream.FunnelHit].collect()
        .map(h => h.user_id -> ((h.times_us, h.funnel_depth))).toMap
    } finally query.stop()
  }

  private def micros(t: Timestamp): Long = t.getTime * 1000L

  test("converges to the batch funnel on in-order delivery") {
    val out = runStream(Seq(events))
    assert(out.keySet == Set(1L, 2L))
    assert(out(1L) == ((Seq(micros(ts(0)), micros(ts(5)), micros(ts(9))), 3L)))
    assert(out(2L) == ((Seq(micros(ts(4))), 1L)))

    // and bit-equal to the batch operator over the same rows
    val batch = graft.operators.Funnel.funnel(events.toDF(), steps)
      .select($"user_id", $"t1", $"t2", $"t3", $"funnel_depth").collect()
      .map(r => r.getLong(0) -> ((
        Seq(Option(r.getTimestamp(1)), Option(r.getTimestamp(2)),
          Option(r.getTimestamp(3))).flatten.map(micros), r.getLong(4)))).toMap
    assert(out == batch)
  }

  test("out-of-order arrival within the horizon does not lock in wrong " +
    "step times — the fold is watermark-final") {
    // user 1's purchase and click arrive BEFORE the signup; an eager
    // fold would leave the user at depth 0 forever
    val shuffled = Seq(
      Seq(events(2), events(1)), // purchase, click first
      Seq(events(0)),            // signup arrives late (within horizon)
      events.drop(3).map(identity))
    val out = runStream(shuffled)
    assert(out(1L) == ((Seq(micros(ts(0)), micros(ts(5)), micros(ts(9))), 3L)))
    assert(out(2L) == ((Seq(micros(ts(4))), 1L)))
  }

  test("equal timestamps: strictly-after rejects a same-instant next step") {
    val sameTs = Seq(
      Event(1L, ts(0), 7L, "signup", 0.0),
      Event(2L, ts(0), 7L, "click", 0.0), // same instant: not strictly after
      Event(3L, ts(1), 7L, "click", 0.0))
    val out = runStream(Seq(sameTs))
    assert(out(7L) == ((Seq(micros(ts(0)), micros(ts(1))), 2L)))
  }

  // ------------------------------------------------------------ retention

  private def runRetention(batches: Seq[Seq[Event]]): Set[(Long, Long, Long)] = {
    implicit val sqlCtx = spark.sqlContext
    runIdx += 1
    val sink = s"retention_stream_test_$runIdx"
    val stream = MemoryStream[Event]
    val rows = FunnelStream.retentionStream(stream.toDS(),
      anchorType = "signup", horizonMinutes = 30)
    val query = rows.writeStream.format("memory")
      .queryName(sink).outputMode(OutputMode.Append).start()
    try {
      batches.foreach { b => stream.addData(b: _*); query.processAllAvailable() }
      stream.addData(Event(98L, ts(60000), 9L, "view", 0.0))
      query.processAllAvailable()
      stream.addData(Event(99L, ts(90000), 9L, "view", 0.0))
      query.processAllAvailable()
      spark.table(sink).filter($"user_id" < 9L)
        .as[FunnelStream.RetentionRow].collect()
        .map(r => (r.user_id, r.cohort_day, r.week_offset)).toSet
    } finally query.stop()
  }

  private val day = 1440L // minutes
  // user 1 signs up day 0, active days 0/1/9 (weeks 0, 0, 1); user 2's
  // only signup comes AFTER an earlier activity day (that day precedes
  // t0 and must not count); user 3 never signs up
  private val retEvents = Seq(
    Event(11L, ts(10), 1L, "signup", 0.0),
    Event(12L, ts(20), 1L, "view", 0.0),
    Event(13L, ts(day + 5), 1L, "click", 0.0),
    Event(14L, ts(9 * day + 1), 1L, "view", 0.0),
    Event(21L, ts(0), 2L, "view", 0.0),
    Event(22L, ts(2 * day + 10), 2L, "signup", 0.0),
    Event(23L, ts(3 * day + 10), 2L, "view", 0.0),
    Event(31L, ts(5), 3L, "view", 0.0))

  test("retention: membership rows equal the batch matrix's per-user " +
    "facts; pre-anchor activity days are excluded; no anchor, no rows") {
    val out = runRetention(Seq(retEvents))
    val cohort1 = micros(ts(10)) / 86400000000L
    val cohort2 = micros(ts(2 * day + 10)) / 86400000000L
    // user 1: weeks {0 (days 0,+1), 1 (day +9)}; user 2: week 0 only
    // (the +1-day activity folds into week 0, the pre-anchor day drops);
    // user 3: no anchor, no rows
    assert(out == Set(
      (1L, cohort1, 0L), (1L, cohort1, 1L),
      (2L, cohort2, 0L)))

    // and the aggregated matrix equals the batch operator's
    val streamMatrix = out.groupBy(t => (t._2, t._3))
      .map { case (k, v) => (k._1, k._2, v.size.toLong) }.toSet
    val batch = graft.operators.Funnel.retention(retEvents.toDF())
      .as[(Long, Long, Long)].collect().toSet
    assert(streamMatrix == batch)
  }

  test("retention: an anchor arriving AFTER its user's activity (within " +
    "the watermark delay) still cohorts them — finalization is " +
    "watermark-bound, not arrival-bound") {
    // activity arrives first; the signup (earlier event time, inside the
    // 30-min delay) arrives in a later micro-batch. An eager design
    // would cohort on the activity or drop the user; the watermark-final
    // fold re-anchors correctly. (Disorder BEYOND the delay is out of
    // contract — Spark filters those rows before they reach state.)
    val shuffled = Seq(
      Seq(Event(12L, ts(20), 1L, "view", 0.0),
        Event(13L, ts(35), 1L, "view", 0.0)),
      Seq(Event(11L, ts(10), 1L, "signup", 0.0)), // later batch, earlier ts
      Seq(Event(14L, ts(9 * day + 1), 1L, "view", 0.0)))
    val out = runRetention(shuffled)
    val cohort1 = micros(ts(10)) / 86400000000L
    assert(out == Set((1L, cohort1, 0L), (1L, cohort1, 1L)))
  }

  // ---------------------------------------------------------- transitions

  private def runTransitions(batches: Seq[Seq[Event]]): Seq[(Long, String, String)] = {
    implicit val sqlCtx = spark.sqlContext
    runIdx += 1
    val sink = s"transitions_stream_test_$runIdx"
    val stream = MemoryStream[Event]
    val rows = FunnelStream.transitionsStream(stream.toDS(),
      horizonMinutes = 30)
    val query = rows.writeStream.format("memory")
      .queryName(sink).outputMode(OutputMode.Append).start()
    try {
      batches.foreach { b => stream.addData(b: _*); query.processAllAvailable() }
      stream.addData(Event(98L, ts(60000), 9L, "view", 0.0))
      query.processAllAvailable()
      stream.addData(Event(99L, ts(90000), 9L, "view", 0.0))
      query.processAllAvailable()
      spark.table(sink).filter($"user_id" < 9L)
        .as[FunnelStream.TransitionRow].collect()
        .map(r => (r.user_id, r.prev, r.next)).sorted.toSeq
    } finally query.stop()
  }

  test("transitions: per-user adjacency edges equal the batch lag " +
    "window, start sentinel included, and the aggregated matrix " +
    "matches Funnel.transitions") {
    val out = runTransitions(Seq(events))
    // user 1: ∅→signup→click→purchase; user 2: ∅→click→signup (event
    // TIME order, click at t3 precedes signup at t4); user 3: ∅→click→purchase
    assert(out == Seq(
      (1L, "click", "purchase"), (1L, "signup", "click"), (1L, "∅", "signup"),
      (2L, "click", "signup"), (2L, "∅", "click"),
      (3L, "click", "purchase"), (3L, "∅", "click")).sorted)

    val streamMatrix = out.groupBy(t => (t._2, t._3))
      .map { case (k, v) => (k._1, k._2, v.size.toLong) }.toSet
    val batch = graft.operators.Funnel.transitions(events.toDF())
      .as[(String, String, Long)].collect().toSet
    assert(streamMatrix == batch)
  }

  test("transitions: late arrival within the horizon splices into the " +
    "timeline — adjacencies are event-time, not arrival-order") {
    // user 1's click (middle of the timeline) arrives LAST; a greedy
    // fold would have emitted signup→purchase, an edge that must not
    // exist in the settled timeline
    val shuffled = Seq(
      Seq(events(0), events(2)), // signup, purchase
      Seq(events(1)))            // click arrives late
    val out = runTransitions(shuffled)
    assert(out.filter(_._1 == 1L) == Seq(
      (1L, "click", "purchase"), (1L, "signup", "click"),
      (1L, "∅", "signup")).sorted)
    assert(!out.contains((1L, "signup", "purchase")))
  }

  test("transitions: equal timestamps tie-break on event_id, matching " +
    "the batch window order") {
    val sameTs = Seq(
      Event(5L, ts(0), 7L, "view", 0.0),
      Event(2L, ts(1), 7L, "click", 0.0),   // same instant, id 2 first
      Event(3L, ts(1), 7L, "purchase", 0.0))
    val out = runTransitions(Seq(sameTs))
    assert(out == Seq(
      (7L, "click", "purchase"), (7L, "view", "click"),
      (7L, "∅", "view")).sorted)
  }
  // ---------------------------------------------------------- paths

  private def runPaths(batches: Seq[Seq[Event]]): Seq[(Long, String)] = {
    implicit val sqlCtx = spark.sqlContext
    runIdx += 1
    val sink = s"paths_stream_test_$runIdx"
    val stream = MemoryStream[Event]
    val rows = FunnelStream.pathsStream(stream.toDS(), len = 3,
      horizonMinutes = 30)
    val query = rows.writeStream.format("memory")
      .queryName(sink).outputMode(OutputMode.Append).start()
    try {
      batches.foreach { b => stream.addData(b: _*); query.processAllAvailable() }
      stream.addData(Event(98L, ts(60000), 9L, "view", 0.0))
      query.processAllAvailable()
      stream.addData(Event(99L, ts(90000), 9L, "view", 0.0))
      query.processAllAvailable()
      spark.table(sink).filter($"user_id" < 9L)
        .as[FunnelStream.PathRow].collect()
        .map(r => (r.user_id, r.path)).sorted.toSeq
    } finally query.stop()
  }

  test("paths: settled timelines emit each 3-window once and equal the " +
    "batch topPaths counts; short timelines emit nothing") {
    val out = runPaths(Seq(events))
    // user 1: signup>click>purchase; user 2 (2 events) and user 3
    // (2 events) are too short for a 3-window
    assert(out == Seq((1L, "signup>click>purchase")))
    val streamCounts = out.groupBy(_._2)
      .map { case (k, v) => (k, v.size.toLong) }.toSet
    val batch = graft.operators.Funnel
      .topPaths(events.toDF(), len = 3, k = 100)
      .select($"path", $"n").as[(String, Long)].collect().toSet
    assert(streamCounts == batch)
  }

  test("paths: a late middle event splices into its window — windows " +
    "never weld across a late arrival") {
    // user 1's click (the middle of the only 3-window) arrives last; a
    // greedy fold would emit signup>purchase>click or no window at all
    val shuffled = Seq(
      Seq(events(0), events(2)), // signup, purchase
      Seq(events(1)))            // click arrives late
    val out = runPaths(shuffled)
    assert(out == Seq((1L, "signup>click>purchase")))
  }
}
