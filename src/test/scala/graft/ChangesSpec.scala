package graft

import java.sql.Timestamp

import graft.operators.Changes

/** CDC compaction semantics: latest-per-key total order, SCD-2 interval
  * construction, and the MERGE-INTO apply (upsert wins, delete drops the
  * key, late changes lose to the snapshot). */
class ChangesSpec extends SparkSuite {
  import spark.implicits._

  private def ts(m: Long): Timestamp = new Timestamp(m * 60000L)

  test("latestByKey: greatest (ts, tie) tuple wins, ties resolved totally") {
    val df = Seq(
      (1L, ts(10), 100L, "a"),
      (1L, ts(10), 101L, "b"), // same ts: tie falls to event id
      (1L, ts(5), 102L, "c"),
      (2L, ts(1), 103L, "d"))
      .toDF("k", "ts", "id", "v")
    val got = Changes.latestByKey(df, Seq("k"), "ts", Seq("id"))
      .select($"k", $"id", $"v").as[(Long, Long, String)].collect().toSet
    assert(got == Set((1L, 101L, "b"), (2L, 103L, "d")))
  }

  test("scd2: half-open intervals chain per key; last version is current") {
    val df = Seq(
      (1L, ts(0), 1L), (1L, ts(10), 2L), (2L, ts(5), 3L))
      .toDF("k", "ts", "id")
    val got = Changes.scd2(df, Seq("k"), "ts", Seq("id"))
      .select($"id", $"valid_from", $"valid_to", $"is_current")
      .as[(Long, Timestamp, Option[Timestamp], Boolean)]
      .collect().map(r => r._1 -> ((r._2, r._3, r._4))).toMap
    assert(got(1L) == ((ts(0), Some(ts(10)), false)))
    assert(got(2L) == ((ts(10), None, true)))
    assert(got(3L) == ((ts(5), None, true)))
  }

  test("scd2Lookup: facts pick the version valid at their timestamp; " +
    "facts before the first version survive with nulls") {
    // versions for key 1 at t0 (v=10) and t10 (v=20); key 2 never versioned
    val dims = Changes.scd2(
      Seq((1L, ts(0), 10L), (1L, ts(10), 20L)).toDF("k", "ts", "v"),
      Seq("k"), "ts")
      .select($"k", $"valid_from", $"v")
    val facts = Seq(
      (100L, 1L, ts(0)), // exactly AT a version start -> that version
      (101L, 1L, ts(5)), // inside [t0, t10) -> v=10
      (102L, 1L, ts(10)), // boundary: [t10, inf) -> v=20
      (103L, 1L, ts(99)), // current version -> v=20
      (104L, 2L, ts(5)), // key never versioned -> nulls
      (105L, 1L, ts(-1))) // before the first version -> nulls
      .toDF("fact_id", "k", "fts")
    val got = Changes.scd2Lookup(facts, dims, Seq("k"), "fts", Seq("v"))
      .select($"fact_id", $"v_v")
      .as[(Long, Option[Long])].collect().toMap
    assert(got == Map(100L -> Some(10L), 101L -> Some(10L),
      102L -> Some(20L), 103L -> Some(20L), 104L -> None, 105L -> None))
  }

  test("scd2JoinIntervals: interval form equals the as-of lookup on " +
    "every boundary case (streamable formulation, same answers)") {
    val dims = Changes.scd2(
      Seq((1L, ts(0), 10L), (1L, ts(10), 20L)).toDF("k", "ts", "v"),
      Seq("k"), "ts")
      .select($"k", $"valid_from", $"valid_to", $"v")
    val facts = Seq(
      (100L, 1L, ts(0)),  // at a version start -> that version
      (101L, 1L, ts(5)),  // inside [t0, t10)
      (102L, 1L, ts(10)), // boundary -> successor version
      (103L, 1L, ts(99)), // open current version
      (104L, 2L, ts(5)),  // key never versioned -> nulls
      (105L, 1L, ts(-1))) // before the first version -> nulls
      .toDF("fact_id", "k", "fts")
    val interval = Changes.scd2JoinIntervals(facts, dims, Seq("k"),
      "fts", Seq("v"))
      .select($"fact_id", $"v_v")
      .as[(Long, Option[Long])].collect().toMap
    val asof = Changes.scd2Lookup(facts,
      dims.select($"k", $"valid_from", $"v"), Seq("k"), "fts", Seq("v"))
      .select($"fact_id", $"v_v")
      .as[(Long, Option[Long])].collect().toMap
    assert(interval == asof)
    assert(interval == Map(100L -> Some(10L), 101L -> Some(10L),
      102L -> Some(20L), 103L -> Some(20L), 104L -> None, 105L -> None))
    // intervals partition the timeline: exactly one output row per fact
    assert(Changes.scd2JoinIntervals(facts, dims, Seq("k"), "fts",
      Seq("v")).count() == facts.count())
  }

  test("scd2Lookup: a version's legitimately-NULL attribute stays NULL — " +
    "no value bleed from the previous version") {
    // v1 at t0 has attr "x"; v2 at t10 has attr NULL (a real SCD2 shape:
    // the attribute was cleared). A fact inside v2's window must see
    // (valid_from = t10, attr = NULL), not v1's "x" grafted onto v2.
    val dims = Changes.scd2(
      Seq((1L, ts(0), Some("x")), (1L, ts(10), None: Option[String]))
        .toDF("k", "ts", "attr"),
      Seq("k"), "ts")
      .select($"k", $"valid_from", $"attr")
    val facts = Seq((100L, 1L, ts(5)), (101L, 1L, ts(15)))
      .toDF("fact_id", "k", "fts")
    val got = Changes.scd2Lookup(facts, dims, Seq("k"), "fts", Seq("attr"))
      .select($"fact_id", $"v_attr", $"v_valid_from")
      .as[(Long, Option[String], Option[Timestamp])].collect()
      .map(r => r._1 -> ((r._2, r._3))).toMap
    assert(got(100L) == ((Some("x"), Some(ts(0)))))
    assert(got(101L) == ((None, Some(ts(10))))) // NULL attr, v2's window
  }

  test("applyCdc: upserts replace, deletes remove, late changes lose, " +
    "untouched base keys survive") {
    val base = Seq(
      (1L, ts(10), 1L, "old"), // will be upserted
      (2L, ts(10), 2L, "keep"), // untouched
      (3L, ts(10), 3L, "gone"), // will be deleted
      (4L, ts(10), 4L, "stays")) // late change must lose
      .toDF("k", "ts", "id", "v")
    val changes = Seq(
      (1L, ts(20), 10L, "new", "u"),
      (3L, ts(20), 11L, "x", "d"),
      (4L, ts(5), 12L, "stale", "u"), // older than the snapshot version
      (5L, ts(20), 13L, "born", "u")) // brand-new key
      .toDF("k", "ts", "id", "v", "op")
    val got = Changes.applyCdc(base, changes, Seq("k"), "ts", Seq("id"))
      .select($"k", $"id", $"v").as[(Long, Long, String)].collect().toSet
    assert(got == Set(
      (1L, 10L, "new"),
      (2L, 2L, "keep"),
      (4L, 4L, "stays"),
      (5L, 13L, "born")))
  }

  test("applyCdc: a delete resurrected by a newer upsert re-appears") {
    val base = Seq((1L, ts(0), 1L, "v0")).toDF("k", "ts", "id", "v")
    val changes = Seq(
      (1L, ts(10), 2L, "x", "d"),
      (1L, ts(20), 3L, "v2", "u"))
      .toDF("k", "ts", "id", "v", "op")
    val got = Changes.applyCdc(base, changes, Seq("k"), "ts", Seq("id"))
      .select($"k", $"id", $"v").as[(Long, Long, String)].collect().toSeq
    assert(got == Seq((1L, 3L, "v2")))
  }
}
