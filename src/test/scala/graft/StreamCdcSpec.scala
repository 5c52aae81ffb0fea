package graft

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.OutputMode

import graft.operators.Changes
import graft.streaming.{Sessionize, StreamCdc}

/** Streaming CDC compaction ([[StreamCdc]]): the drained one-row-per-key
  * state merged by batch applyCdc equals batch applyCdc over the raw
  * feed — latest-wins associativity — including the delete-then-
  * resurrect race and late-older changes losing to the snapshot. */
class StreamCdcSpec extends SparkSuite {
  import spark.implicits._

  private def ts(m: Int) = new Timestamp(1700000000000L + m * 60000L)

  // (user_id, event_id, ts, payload, op)
  private val feedRows = Seq(
    // key 1: upsert then DELETE last — must drop from the snapshot
    (1L, 11L, ts(1), "a", "u"),
    (1L, 13L, ts(3), "b", "d"),
    // key 2: delete then a NEWER upsert resurrects it
    (2L, 21L, ts(2), "c", "d"),
    (2L, 23L, ts(4), "d", "u"),
    // key 3: late change OLDER than the snapshot row — snapshot wins
    (3L, 31L, ts(1), "e", "u"),
    // key 4: new key, insert via change feed only
    (4L, 41L, ts(5), "f", "u"))

  private val baseRows = Seq(
    (3L, 39L, ts(9), "base3"), // newer than key 3's change
    (5L, 59L, ts(2), "base5")) // untouched by the feed

  test("drained latest-change state + batch applyCdc == applyCdc over " +
    "the raw feed (deletes, resurrection, late-older, inserts)") {
    val base = baseRows.toDF("user_id", "event_id", "ts", "payload")
    val feed = feedRows.toDF("user_id", "event_id", "ts", "payload", "op")

    val stream = MemoryStream[(Long, Long, Timestamp, String, String)](
      spark)
    stream.addData(feedRows.map(r => (r._1, r._2, r._3, r._4, r._5)))
    val streamed = StreamCdc.latestChangeStream(
      stream.toDF.toDF("user_id", "event_id", "ts", "payload", "op"),
      keyCols = Seq("user_id"), tsCol = "ts", tieCols = Seq("event_id"))
    val drained = Sessionize.runToMemory(spark, streamed, "cdc_spec",
      OutputMode.Complete, statePartitions = 4)

    // one row of state per key
    assert(drained.count() == 4L)

    def snap(changes: org.apache.spark.sql.DataFrame) =
      Changes.applyCdc(base, changes, keyCols = Seq("user_id"),
        tsCol = "ts", tieCols = Seq("event_id"))
        .select($"user_id", $"event_id", $"payload")
        .as[(Long, Long, String)].collect().toSet

    val got = snap(drained)
    assert(got == snap(feed), "compacted-state merge diverged from raw feed")
    assert(got == Set(
      (2L, 23L, "d"),      // resurrected
      (3L, 39L, "base3"),  // snapshot beat the late-older change
      (4L, 41L, "f"),      // fresh insert
      (5L, 59L, "base5"))) // untouched
  }
}
