package graft

import java.sql.Timestamp

import graft.operators.Funnel

/** N-step funnel semantics: strict ordering between steps, stalls carry
  * nulls, pre-step events don't count, depth arithmetic. */
class FunnelSpec extends SparkSuite {
  import spark.implicits._

  private def ts(m: Long): Timestamp = new Timestamp(m * 60000L)

  test("funnel: strictly-after step ordering, stalls null out, depth counts") {
    val ev = Seq(
      // user 1: full conversion — signup t0, clicks t5/t9 (min after), buy t20
      (1L, "signup", ts(0)), (1L, "click", ts(5)), (1L, "click", ts(9)),
      (1L, "purchase", ts(20)),
      // user 2: click BEFORE signup doesn't count; no click after -> depth 1
      (2L, "click", ts(1)), (2L, "signup", ts(2)), (2L, "purchase", ts(3)),
      // user 3: signup + click, purchase BEFORE the click -> depth 2
      (3L, "signup", ts(0)), (3L, "purchase", ts(1)), (3L, "click", ts(2)),
      // user 4: never signed up -> absent from the funnel entirely
      (4L, "click", ts(0)), (4L, "purchase", ts(1)),
      // user 5: click AT the signup timestamp is not strictly after
      (5L, "signup", ts(7)), (5L, "click", ts(7)))
      .toDF("user_id", "event_type", "ts")
    val got = Funnel.funnel(ev, Seq("signup", "click", "purchase"))
      .select($"user_id", $"t1", $"t2", $"t3", $"funnel_depth")
      .as[(Long, Option[Timestamp], Option[Timestamp], Option[Timestamp], Long)]
      .collect().map(r => r._1 -> ((r._2, r._3, r._4, r._5))).toMap
    assert(got.keySet == Set(1L, 2L, 3L, 5L))
    assert(got(1L) == ((Some(ts(0)), Some(ts(5)), Some(ts(20)), 3L)))
    assert(got(2L) == ((Some(ts(2)), None, None, 1L)))
    assert(got(3L) == ((Some(ts(0)), Some(ts(2)), None, 2L)))
    assert(got(5L) == ((Some(ts(7)), None, None, 1L)))
  }

  test("transitions: start sentinel, per-user timelines, id tie-break") {
    val ev = Seq(
      // user 1: A → B → A; user 2: lone B (start-sentinel only)
      (1L, 1L, "A", ts(0)), (1L, 2L, "B", ts(1)), (1L, 3L, "A", ts(2)),
      (2L, 4L, "B", ts(0)),
      // user 3: two events at the SAME ts — event_id breaks the tie, so
      // the pair is deterministically C → D, never D → C
      (3L, 5L, "C", ts(9)), (3L, 6L, "D", ts(9)))
      .toDF("user_id", "event_id", "event_type", "ts")
    val got = Funnel.transitions(ev)
      .select($"prev", $"next", $"n")
      .as[(String, String, Long)].collect().toSet
    assert(got == Set(
      ("∅", "A", 1L), ("A", "B", 1L), ("B", "A", 1L),
      ("∅", "B", 1L),
      ("∅", "C", 1L), ("C", "D", 1L)))
  }

  test("retention: first-anchor-day cohorts, integer week offsets, " +
    "pre-anchor activity excluded, distinct users per cell") {
    def at(day: Long, min: Long = 0): Timestamp =
      new Timestamp(day * 86400000L + min * 60000L)
    val ev = Seq(
      // user 1: signs up day 0, active day 3 (week 0) and day 8 (week 1)
      (1L, "signup", at(0)), (1L, "click", at(3)), (1L, "view", at(8)),
      // user 2: same cohort day 0, active twice in week 0 (counted once)
      (2L, "signup", at(0, 60)), (2L, "click", at(1)), (2L, "view", at(2)),
      // user 3: cohort day 10; pre-signup activity at day 9 excluded
      (3L, "click", at(9)), (3L, "signup", at(10)), (3L, "view", at(20)),
      // user 4: no signup -> absent
      (4L, "click", at(5)))
      .toDF("user_id", "event_type", "ts")
    val got = Funnel.retention(ev)
      .select($"cohort_day", $"week_offset", $"n_users")
      .as[(Long, Long, Long)].collect().toSet
    // baseline epoch day of at(0) is day 0
    assert(got == Set(
      (0L, 0L, 2L), // users 1+2 active in their signup week
      (0L, 1L, 1L), // user 1 returns in week 1
      (10L, 0L, 1L), // user 3's signup-week activity (the signup itself)
      (10L, 1L, 1L))) // user 3 returns at day 20 (offset (20-10)/7 = 1)
  }

  test("trailingCountSum: event-time RANGE frame — boundary inclusive, " +
    "ties mutual, per-key isolation") {
    import graft.operators.RollingAgg
    import org.apache.spark.sql.functions.col
    val ev = Seq(
      (1L, 1L, ts(0), 10L),
      (2L, 1L, ts(30), 20L), // 30 min later: within 1h of e1
      (3L, 1L, ts(60), 30L), // exactly 1h after e1 -> inclusive boundary
      (4L, 1L, ts(200), 5L), // far later: window holds only itself
      (5L, 2L, ts(30), 99L), // other key: never mixes
      (6L, 1L, ts(30), 7L)) // TIE with e2: each sees the other
      .toDF("event_id", "user_id", "ts", "cents")
    val got = RollingAgg.trailingCountSum(ev, col("cents"),
      windowSeconds = 3600)
      .select($"event_id", $"n_trailing", $"sum_trailing")
      .as[(Long, Long, Long)].collect()
      .map(r => r._1 -> ((r._2, r._3))).toMap
    assert(got(1L) == ((1L, 10L)))
    assert(got(2L) == ((3L, 37L))) // e1 + itself + tie e6
    assert(got(6L) == ((3L, 37L))) // tie is mutual (RANGE, not ROWS)
    assert(got(3L) == ((4L, 67L))) // 1h-ago row still inside (inclusive)
    assert(got(4L) == ((1L, 5L)))
    assert(got(5L) == ((1L, 99L)))
  }

  test("funnel: single-step degenerates to earliest occurrence per user") {
    val ev = Seq((1L, "signup", ts(3)), (1L, "signup", ts(1)))
      .toDF("user_id", "event_type", "ts")
    val got = Funnel.funnel(ev, Seq("signup"))
      .select($"user_id", $"t1", $"funnel_depth")
      .as[(Long, Timestamp, Long)].collect().toSeq
    assert(got == Seq((1L, ts(1), 1L)))
  }
  test("topPaths: full windows only, deterministic tie-break, top-k " +
    "cut, and guards") {
    // user 1 timeline: a b a b  -> paths a>b>a, b>a>b
    // user 2 timeline: a b a    -> path  a>b>a
    // user 3 timeline: c a      -> too short for len 3, contributes none
    val ev = Seq(
      (1L, 1L, "a", ts(0)), (1L, 2L, "b", ts(1)), (1L, 3L, "a", ts(2)),
      (1L, 4L, "b", ts(3)),
      (2L, 5L, "a", ts(0)), (2L, 6L, "b", ts(1)), (2L, 7L, "a", ts(2)),
      (3L, 8L, "c", ts(0)), (3L, 9L, "a", ts(1)))
      .toDF("user_id", "event_id", "event_type", "ts")
    val got = Funnel.topPaths(ev, len = 3, k = 10)
      .select($"path", $"n", $"rank")
      .as[(String, Long, Long)].collect().sortBy(_._3).toSeq
    assert(got == Seq(("a>b>a", 2L, 1L), ("b>a>b", 1L, 2L)))
    // k cuts: k = 1 keeps only the winner
    assert(Funnel.topPaths(ev, len = 3, k = 1)
      .select($"path").as[String].collect().toSeq == Seq("a>b>a"))
    // equal counts rank by path text — deterministic under reruns
    val tie = Seq(
      (1L, 1L, "b", ts(0)), (1L, 2L, "a", ts(1)),
      (2L, 3L, "a", ts(0)), (2L, 4L, "b", ts(1)))
      .toDF("user_id", "event_id", "event_type", "ts")
    assert(Funnel.topPaths(tie, len = 2, k = 10)
      .select($"path", $"rank").as[(String, Long)].collect().sorted.toSeq ==
      Seq(("a>b", 1L), ("b>a", 2L)))
    // same-timestamp events order by event_id inside the window
    val sameTs = Seq(
      (1L, 1L, "x", ts(0)), (1L, 2L, "y", ts(0)), (1L, 3L, "z", ts(0)))
      .toDF("user_id", "event_id", "event_type", "ts")
    assert(Funnel.topPaths(sameTs, len = 3, k = 10)
      .select($"path").as[String].collect().toSeq == Seq("x>y>z"))
    intercept[IllegalArgumentException](Funnel.topPaths(ev, len = 1))
    intercept[IllegalArgumentException](Funnel.topPaths(ev, k = 0))
  }
}
