package graft

import graft.operators.Attribution

/** Linear attribution semantics: inclusive/exclusive window boundaries,
  * equal credit split, the unattributed bucket, and the U-shaped
  * re-weighting helper. */
class AttributionSpec extends SparkSuite {
  import spark.implicits._

  test("linear: window boundaries, equal split, unattributed bucket") {
    // lookback 100 µs: touch AT the conversion time counts, touch
    // exactly 100 µs before does NOT (strict >), touches after never do
    val conv = Seq((1L, 10L, 1000L, 900L), (1L, 11L, 5000L, 300L),
      (2L, 12L, 1000L, 700L))
      .toDF("user_id", "p_id", "p_ts_us", "p_cents")
    val touch = Seq(
      (1L, 100L, 1000L), // at conv 10's ts — included
      (1L, 101L, 950L), // inside — included
      (1L, 102L, 900L), // exactly lookback before — EXCLUDED
      (1L, 103L, 1001L), // after conv 10 — excluded (and before 11's window)
      (2L, 104L, 999L)) // other user, inside their conv window
      .toDF("user_id", "c_id", "c_ts_us")
    val got = Attribution.linear(conv, touch, Seq("user_id"),
      convIdCol = "p_id", convTsUsCol = "p_ts_us", valueCol = "p_cents",
      touchIdCol = "c_id", touchTsUsCol = "c_ts_us", lookbackMicros = 100L)
      .select($"p_id", $"c_id", $"n_touches", $"credit")
      .as[(Long, Option[Long], Long, Option[Double])].collect().toSet
    assert(got == Set(
      (10L, Some(100L), 2L, Some(450.0)),
      (10L, Some(101L), 2L, Some(450.0)),
      (11L, None, 0L, None), // conv 11 has no touch in (4900, 5000]
      (12L, Some(104L), 1L, Some(700.0))))
  }

  test("linear: same-source self-join (conversions and touches filtered " +
    "from one events frame) resolves without ambiguity") {
    val ev = Seq((1L, 1L, 100L, "buy", 500L), (1L, 2L, 90L, "click", 0L))
      .toDF("user_id", "event_id", "ts_us", "kind", "cents")
    val conv = ev.filter($"kind" === "buy")
      .select($"user_id", $"event_id".as("p_id"), $"ts_us".as("p_ts_us"),
        $"cents".as("p_cents"))
    val touch = ev.filter($"kind" === "click")
      .select($"user_id", $"event_id".as("c_id"), $"ts_us".as("c_ts_us"))
    val got = Attribution.linear(conv, touch, Seq("user_id"),
      "p_id", "p_ts_us", "p_cents", "c_id", "c_ts_us", 50L)
      .select($"p_id", $"c_id", $"credit")
      .as[(Long, Option[Long], Option[Double])].collect().toSet
    assert(got == Set((1L, Some(2L), Some(500.0))))
  }

  test("uShapedWeight: 40/40/20 with interior split, degenerate 1/2-touch") {
    import org.apache.spark.sql.functions.{col, lit}
    val df = Seq((1, 1), (1, 2), (2, 2), (1, 4), (2, 4), (3, 4), (4, 4))
      .toDF("rank", "n")
    val got = df.select(col("rank"), col("n"),
      Attribution.uShapedWeight(col("rank"), col("n")).as("w"))
      .as[(Int, Int, Double)].collect()
      .map { case (r, n, w) => (r, n) -> w }.toMap
    assert(got((1, 1)) == 1.0)
    assert(got((1, 2)) == 0.5 && got((2, 2)) == 0.5)
    assert(got((1, 4)) == 0.4 && got((4, 4)) == 0.4)
    assert(got((2, 4)) == 0.1 && got((3, 4)) == 0.1)
    // weights of any profile sum to 1
    assert(math.abs(0.4 + 0.1 + 0.1 + 0.4 - 1.0) < 1e-12)
  }

  test("linear rejects colliding touch column names") {
    val conv = Seq((1L, 1L, 1L, 1L)).toDF("k", "id", "ts", "v")
    val touch = Seq((1L, 2L, 1L)).toDF("k", "id", "ts")
    intercept[IllegalArgumentException] {
      Attribution.linear(conv, touch, Seq("k"), "id", "ts", "v", "id", "ts", 10L)
    }
  }
}
