package graft

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.OutputMode

import graft.streaming.{CoverageStream, Sessionize}
import graft.streaming.Sessionize.Event

/** The streaming interval union's watermark-final contract: event
  * times buffer until the user's horizon passes, the island fold runs
  * in event-time order regardless of ARRIVAL order, and the emitted
  * islands equal the batch [[graft.operators.Intervals.mergeIslands]]. */
class CoverageStreamSpec extends SparkSuite {
  import spark.implicits._

  private def ts(minutes: Long): Timestamp =
    new Timestamp((100000L + minutes) * 60000L)
  private def us(minutes: Long): Long = ts(minutes).getTime * 1000L

  private val windowUs = 300000000L // 5 minutes

  // user 1: [0,5) and [4,9) merge; [20,25) stands alone. user 2: one
  // event. the bridging event (id 12, minute 4) is the one delivered
  // LATE in the out-of-order run below.
  private val events = Seq(
    Event(11L, ts(0), 1L, "view", 0.0),
    Event(12L, ts(4), 1L, "view", 0.0),
    Event(13L, ts(6), 1L, "view", 0.0),
    Event(14L, ts(20), 1L, "view", 0.0),
    Event(21L, ts(2), 2L, "view", 0.0))

  private var runIdx = 0
  private def runStream(
      batches: Seq[Seq[Event]]): Seq[(Long, Long, Long, Long, Long, Long)] = {
    implicit val sqlCtx = spark.sqlContext
    runIdx += 1
    val sink = s"coverage_stream_test_$runIdx"
    val stream = MemoryStream[Event]
    val islands = CoverageStream.coverageStream(stream.toDS(), windowUs,
      horizonMinutes = 30)
    val query = islands.writeStream.format("memory")
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
        .as[CoverageStream.CovIsland].collect()
        .map(i => (i.user_id, i.island, i.island_start, i.island_end,
          i.n_intervals, i.covered))
        .sortBy(r => (r._1, r._2)).toSeq
    } finally query.stop()
  }

  private val expected = Seq(
    // [0,5) ∪ [4,9) ∪ [6,11) — the running max matters: 13's start (6)
    // clears 11's end (5) but not 12's end (9)
    (1L, 1L, us(0), us(11), 3L, us(11) - us(0)),
    (1L, 2L, us(20), us(25), 1L, us(25) - us(20)),
    (2L, 1L, us(2), us(7), 1L, us(7) - us(2)))

  test("in-order delivery emits the batch islands, 1-based ordinals") {
    assert(runStream(Seq(events)) == expected)
    // and bit-equal to the batch operator over the same rows
    val batch = graft.operators.Intervals.mergeIslands(
      events.toDF()
        .select($"user_id", $"event_id", unix_micros($"ts").as("s"))
        .withColumn("e", $"s" + lit(windowUs)),
      Seq("user_id"), "s", "e", "event_id")
      .select($"user_id", $"island", $"island_start", $"island_end",
        $"n_intervals", $"covered")
      .as[(Long, Long, Long, Long, Long, Long)].collect()
      .sortBy(r => (r._1, r._2)).toSeq
    assert(batch == expected)
  }

  test("a late bridging interval swallows islands an eager merge would " +
    "already have emitted — the fold is watermark-final") {
    // without event 12, user 1 splits at minute 6 ([0,5) | [6,11)); its
    // late arrival inside the horizon must still produce ONE island
    val without12 = events.filter(_.event_id != 12L)
    val late = Seq(without12, Seq(Event(12L, ts(4), 1L, "view", 0.0)))
    assert(runStream(late) == expected)
  }
}
