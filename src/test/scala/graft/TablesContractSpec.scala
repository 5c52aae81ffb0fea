package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.TimestampType

/** Pins the `events` reader contract so a testdata regeneration (the r12
  * incident: parquet annotation flipped TIMESTAMP(NANOS) →
  * TIMESTAMP(MICROS, isAdjustedToUTC=false), i.e. long → NTZ) can never
  * again break a SUBSET of readers: batch `Tables.apply` and streaming
  * `Tables.streamEvents` must both yield an instant-typed `ts` AND assign
  * the same instants to the same file. If either reader's normalization
  * drifts, one of these assertions fails before any oracle run does. */
class TablesContractSpec extends SparkSuite {
  private val dir = "/root/testdata/sf0.001"

  test("batch events reader yields TimestampType ts") {
    val ev = Tables(spark, dir, "events")
    assert(ev.schema("ts").dataType == TimestampType,
      s"batch ts read as ${ev.schema("ts").dataType}")
  }

  test("streaming events reader yields TimestampType ts") {
    val ev = Tables.streamEvents(spark, dir)
    assert(ev.isStreaming, "streamEvents must return a streaming frame")
    assert(ev.schema("ts").dataType == TimestampType,
      s"stream ts read as ${ev.schema("ts").dataType}")
  }

  test("batch and stream assign the same instants to the same file") {
    val batch = Tables(spark, dir, "events")
      .agg(min(unix_micros(col("ts"))).as("mn"),
        max(unix_micros(col("ts"))).as("mx"),
        count(lit(1)).as("n"))
      .collect()(0)
    // drain the stream's single micro-batch through the same aggregate
    val s = spark.newSession()
    val q = Tables.streamEvents(s, dir)
      .agg(min(unix_micros(col("ts"))).as("mn"),
        max(unix_micros(col("ts"))).as("mx"),
        count(lit(1)).as("n"))
      .writeStream.format("memory").queryName("tables_contract")
      .outputMode("complete")
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    val stream = s.table("tables_contract").collect()(0)
    assert(batch.getLong(2) == stream.getLong(2),
      s"row counts diverge: batch ${batch.getLong(2)} vs stream ${stream.getLong(2)}")
    assert(batch.getLong(0) == stream.getLong(0) &&
      batch.getLong(1) == stream.getLong(1),
      s"ts instants diverge: batch [${batch.getLong(0)}, ${batch.getLong(1)}] " +
        s"vs stream [${stream.getLong(0)}, ${stream.getLong(1)}]")
  }
}
