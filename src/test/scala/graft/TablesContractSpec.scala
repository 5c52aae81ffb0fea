package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Pins the `events` reader contract so a testdata regeneration (the r12
  * incident: parquet annotation flipped TIMESTAMP(NANOS) →
  * TIMESTAMP(MICROS, isAdjustedToUTC=false), i.e. long → NTZ) can never
  * again break a SUBSET of readers: batch `Tables.apply` and streaming
  * `Tables.streamEvents` must both yield an instant-typed `ts` AND assign
  * the same instants to the same file. If either reader's normalization
  * drifts, one of these assertions fails before any oracle run does. */
class TablesContractSpec extends SparkSuite {
  private val dir = "/root/testdata/sf0.001"

  // The LOADED contract for every table the queries read — names AND
  // Spark-side types as seen through Tables.apply (post-normalization).
  // events regenerations already flipped annotation twice (r12); this
  // pins the other tables too, so a regeneration drifting `documents`
  // or `embeddings` fails HERE, not as 50 opaque oracle mismatches.
  private val expected: Map[String, Seq[(String, DataType)]] = Map(
    "region" -> Seq("r_regionkey" -> IntegerType, "r_name" -> StringType),
    "nation" -> Seq("n_nationkey" -> IntegerType, "n_name" -> StringType,
      "n_regionkey" -> IntegerType),
    "customer" -> Seq("c_custkey" -> LongType, "c_name" -> StringType,
      "c_nationkey" -> IntegerType, "c_acctbal" -> DoubleType,
      "c_mktsegment" -> StringType),
    "supplier" -> Seq("s_suppkey" -> LongType, "s_name" -> StringType,
      "s_nationkey" -> IntegerType, "s_acctbal" -> DoubleType),
    "part" -> Seq("p_partkey" -> LongType, "p_name" -> StringType,
      "p_brand" -> StringType, "p_type" -> StringType,
      "p_size" -> IntegerType, "p_retailprice" -> DoubleType),
    "orders" -> Seq("o_orderkey" -> LongType, "o_custkey" -> LongType,
      "o_orderstatus" -> StringType, "o_totalprice" -> DoubleType,
      "o_orderdate" -> TimestampType, "o_orderpriority" -> StringType),
    "lineitem" -> Seq("l_orderkey" -> LongType, "l_partkey" -> LongType,
      "l_suppkey" -> LongType, "l_linenumber" -> IntegerType,
      "l_quantity" -> DoubleType, "l_extendedprice" -> DoubleType,
      "l_discount" -> DoubleType, "l_tax" -> DoubleType,
      "l_returnflag" -> StringType, "l_linestatus" -> StringType,
      "l_shipdate" -> TimestampType),
    "events" -> Seq("event_id" -> LongType, "ts" -> TimestampType,
      "user_id" -> LongType, "event_type" -> StringType,
      "value" -> DoubleType, "props" -> StringType),
    "documents" -> Seq("doc_id" -> LongType, "text" -> StringType,
      "lang" -> StringType, "source" -> StringType,
      "n_chars" -> LongType),
    "embeddings" -> Seq("vec_id" -> LongType,
      "embedding" -> ArrayType(FloatType), "label" -> IntegerType))

  expected.foreach { case (name, cols) =>
    test(s"loaded contract: $name has the pinned columns, types, rows") {
      val df = Tables(spark, dir, name)
      val got = df.schema.fields.map(f =>
        // containsNull/nullability is writer-dependent and semantically
        // inert for these reads — compare erased element types
        f.name -> (f.dataType match {
          case ArrayType(et, _) => ArrayType(et)
          case t => t
        })).toSeq
      assert(got == cols,
        s"$name drifted:\n  got      $got\n  expected $cols")
      assert(df.limit(1).count() == 1L, s"$name is empty")
    }
  }

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
