package graft

import graft.operators.Intervals

/** Interval union: the swallowing case the running max exists for,
  * half-open touch semantics, and per-key isolation. */
class IntervalsSpec extends SparkSuite {
  import spark.implicits._

  private def islands(rows: Seq[(Long, Long, Long, Long)]) =
    Intervals.mergeIslands(rows.toDF("k", "id", "s", "e"),
      Seq("k"), "s", "e", "id")
      .select($"k", $"island", $"island_start", $"island_end",
        $"n_intervals", $"covered")
      .as[(Long, Long, Long, Long, Long, Long)].collect().toSeq.sorted

  test("a long interval swallows later short ones (lag(end) would split)") {
    // [0,100) swallows [10,20) and [30,40); [50,60) is INSIDE it too —
    // start 50 < running max 100 keeps one island where prev-row end
    // (40) would have opened a new one
    val got = islands(Seq((1L, 1L, 0L, 100L), (1L, 2L, 10L, 20L),
      (1L, 3L, 30L, 40L), (1L, 4L, 50L, 60L)))
    assert(got == Seq((1L, 1L, 0L, 100L, 4L, 100L)))
  }

  test("touching closes the gap (half-open); a 1-unit gap opens an island") {
    val got = islands(Seq((1L, 1L, 0L, 10L), (1L, 2L, 10L, 20L), // touch
      (1L, 3L, 21L, 30L))) // gap of 1
    assert(got == Seq((1L, 1L, 0L, 20L, 2L, 20L), (1L, 2L, 21L, 30L, 1L, 9L)))
  }

  test("keys are independent; coverage sums per key") {
    val got = islands(Seq((1L, 1L, 0L, 10L), (2L, 2L, 5L, 15L)))
    assert(got == Seq((1L, 1L, 0L, 10L, 1L, 10L), (2L, 1L, 5L, 15L, 1L, 10L)))
  }
}
