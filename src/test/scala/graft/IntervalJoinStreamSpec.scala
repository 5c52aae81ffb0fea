package graft

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.OutputMode

import graft.streaming.IntervalJoinStream
import graft.streaming.Sessionize.Event

/** The streaming interval-overlap join's watermark-final contract:
  * both sides' intervals buffer until the key's horizon passes, the
  * pairing runs in settled event-time state regardless of ARRIVAL
  * order, and the emitted pairs equal the batch
  * [[graft.operators.TemporalJoin.intervalOverlapJoin]]. */
class IntervalJoinStreamSpec extends SparkSuite {
  import spark.implicits._

  private def ts(minutes: Long): Timestamp =
    new Timestamp((100000L + minutes) * 60000L)
  private def us(minutes: Long): Long = ts(minutes).getTime * 1000L

  private val windowUs = 300000000L // 5 minutes

  // user 1: A-side (odd ids) 11@0, 13@6; B-side (even ids) 12@4,
  // 14@20 — pairs (11,12) overlap [4,5), (13,12) overlap [6,9);
  // 14 overlaps nothing. user 2: a lone A interval, no B → no pairs.
  private val events = Seq(
    Event(11L, ts(0), 1L, "view", 0.0),
    Event(12L, ts(4), 1L, "view", 0.0),
    Event(13L, ts(6), 1L, "view", 0.0),
    Event(14L, ts(20), 1L, "view", 0.0),
    Event(21L, ts(2), 2L, "view", 0.0))

  private var runIdx = 0
  private def runStream(
      batches: Seq[Seq[Event]]): Seq[(Long, Long, Long, Long)] = {
    implicit val sqlCtx = spark.sqlContext
    runIdx += 1
    val sink = s"interval_join_stream_test_$runIdx"
    val stream = MemoryStream[Event]
    val pairs = IntervalJoinStream.intervalJoinStream(stream.toDS(),
      windowUs, horizonMinutes = 30)
    val query = pairs.writeStream.format("memory")
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
        .as[IntervalJoinStream.IvPair].collect()
        .map(p => (p.user_id, p.a_id, p.b_id, p.overlap_us))
        .sortBy(r => (r._1, r._2, r._3)).toSeq
    } finally query.stop()
  }

  private val expected = Seq(
    (1L, 11L, 12L, us(5) - us(4)),
    (1L, 13L, 12L, us(9) - us(6)))

  test("in-order delivery emits the batch pairs exactly") {
    assert(runStream(Seq(events)) == expected)
    // and bit-equal to the batch operator over the same rows
    val e = events.toDF()
      .select($"user_id", $"event_id", unix_micros($"ts").as("s"))
      .withColumn("e", $"s" + lit(windowUs))
    val a = e.filter($"event_id" % 2 === 1)
      .select($"user_id", $"event_id".as("a_id"),
        $"s".as("a_s"), $"e".as("a_e"))
    val b = e.filter($"event_id" % 2 === 0)
      .select($"user_id", $"event_id".as("b_id"),
        $"s".as("b_s"), $"e".as("b_e"))
    val batch = graft.operators.TemporalJoin.intervalOverlapJoin(
      a, b, Seq("user_id"), "a_s", "a_e", "b_s", "b_e", windowUs)
      .select($"user_id", $"a_id", $"b_id",
        (least($"a_e", $"b_e") - greatest($"a_s", $"b_s")).as("overlap_us"))
      .as[(Long, Long, Long, Long)].collect()
      .sortBy(r => (r._1, r._2, r._3)).toSeq
    assert(batch == expected)
  }

  test("a late partner inside the horizon still pairs — the join is " +
    "watermark-final, not eager") {
    // B-side event 12 arrives in a LATER micro-batch than both A
    // intervals it pairs with; an eager per-trigger emit would have
    // missed both pairs with nothing to retract
    val without12 = events.filter(_.event_id != 12L)
    val late = Seq(without12, Seq(Event(12L, ts(4), 1L, "view", 0.0)))
    assert(runStream(late) == expected)
  }
}
