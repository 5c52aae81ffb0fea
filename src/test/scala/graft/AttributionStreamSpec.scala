package graft

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.OutputMode

import graft.streaming.AttributionStream
import graft.streaming.AttributionStream.{AttrEvent, AttrOut}

/** The streaming attribution contract: watermark-final credit splits,
  * the unattributed bucket, and equality with the batch operator. */
class AttributionStreamSpec extends SparkSuite {
  import spark.implicits._

  private def ts(minutes: Long): Timestamp =
    new Timestamp((100000L + minutes) * 60000L)
  private def us(minutes: Long): Long = ts(minutes).getTime * 1000L

  // lookback 30 min. user 1: two clicks inside the window, one outside;
  // user 2: a purchase with no clicks at all (unattributed);
  // user 3: a click AT the purchase instant (inclusive upper bound)
  private val events = Seq(
    AttrEvent(1L, 10L, ts(0), isConv = false, 0L),   // outside (== p_ts - L)
    AttrEvent(1L, 11L, ts(10), isConv = false, 0L),  // inside
    AttrEvent(1L, 12L, ts(25), isConv = false, 0L),  // inside
    AttrEvent(1L, 13L, ts(30), isConv = true, 900L),
    AttrEvent(2L, 20L, ts(5), isConv = true, 500L),
    AttrEvent(3L, 30L, ts(7), isConv = false, 0L),
    AttrEvent(3L, 31L, ts(7), isConv = true, 300L))

  private var runIdx = 0
  private def runStream(batches: Seq[Seq[AttrEvent]]): Seq[AttrOut] = {
    implicit val sqlCtx = spark.sqlContext
    runIdx += 1
    val sink = s"attr_stream_test_$runIdx"
    val stream = MemoryStream[AttrEvent]
    val out = AttributionStream.linearStream(stream.toDS(),
      lookbackMicros = 30L * 60L * 1000000L, delay = "30 minutes")
    val query = out.writeStream.format("memory")
      .queryName(sink).outputMode(OutputMode.Append).start()
    try {
      batches.foreach { b => stream.addData(b: _*); query.processAllAvailable() }
      stream.addData(AttrEvent(9L, 98L, ts(5000), isConv = false, 0L))
      query.processAllAvailable()
      stream.addData(AttrEvent(9L, 99L, ts(9000), isConv = false, 0L))
      query.processAllAvailable()
      spark.table(sink).filter($"user_id" < 9L).as[AttrOut].collect().toSeq
    } finally query.stop()
  }

  test("credit splits over in-window touches; window bounds are " +
    "(p_ts - L, p_ts]; no-touch purchases land in the unattributed bucket") {
    val rows = runStream(Seq(events))
    val byConv = rows.groupBy(_.p_event_id)
    // user 1: clicks 11 and 12 split 900 cents; click 10 sits exactly at
    // p_ts - L and is excluded (strict lower bound)
    assert(byConv(13L).map(_.c_event_id).flatten.toSet == Set(11L, 12L))
    assert(byConv(13L).forall(r => r.n_touches == 2L &&
      r.credit.contains(450.0)))
    // user 2: one unattributed row
    assert(byConv(20L) == Seq(
      AttrOut(2L, 20L, us(5), 500L, None, None, 0L, None)))
    // user 3: the same-instant click qualifies (inclusive upper bound)
    assert(byConv(31L) == Seq(
      AttrOut(3L, 31L, us(7), 300L, Some(30L), Some(us(7)), 1L, Some(300.0))))
  }

  test("a late touch arriving before the watermark clears the purchase " +
    "still gets credit — emission is watermark-final, not eager") {
    // purchase arrives FIRST, its click afterwards (same event times as
    // user 1's window, delivered out of order)
    val shuffled = Seq(
      Seq(events(3)),              // purchase @30
      Seq(events(2), events(1)),   // clicks @25, @10 arrive later
      Seq(events(0)))
    val rows = runStream(shuffled).filter(_.p_event_id == 13L)
    assert(rows.map(_.c_event_id).flatten.toSet == Set(11L, 12L))
    assert(rows.forall(_.credit.contains(450.0)))
  }

  test("converges to the batch operator over the same rows") {
    val streamed = runStream(Seq(events)).toSet
    val conv = events.filter(_.isConv)
      .map(e => (e.user_id, e.event_id, e.ts.getTime * 1000L, e.cents))
      .toDF("user_id", "p_event_id", "p_ts_us", "p_cents")
    val tch = events.filter(!_.isConv)
      .map(e => (e.user_id, e.event_id, e.ts.getTime * 1000L))
      .toDF("user_id", "c_event_id", "c_ts_us")
    val batch = graft.operators.Attribution.linear(conv, tch, Seq("user_id"),
      convIdCol = "p_event_id", convTsUsCol = "p_ts_us",
      valueCol = "p_cents", touchIdCol = "c_event_id",
      touchTsUsCol = "c_ts_us", lookbackMicros = 30L * 60L * 1000000L)
      .as[AttrOut].collect().toSet
    assert(streamed == batch)
  }
}
