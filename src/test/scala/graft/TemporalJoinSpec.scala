package graft

import org.apache.spark.sql.functions._

import graft.operators.TemporalJoin

class TemporalJoinSpec extends SparkSuite {
  import spark.implicits._

  test("asofBackward: inclusive ties, nulls before first right row, " +
    "key isolation") {
    val left = Seq((1L, "a", 10L), (2L, "a", 15L), (3L, "a", 20L),
      (4L, "b", 100L), (5L, "c", 7L))
      .toDF("id", "k", "ts")
    val right = Seq(("a", 10L, "x"), ("a", 18L, "y"), ("b", 999L, "z"))
      .toDF("k", "ts", "v")
    val out = TemporalJoin.asofBackward(left, right,
      keyCols = Seq("k"), leftTsCol = "ts", rightTsCol = "ts",
      valueCols = Seq("v"))
      .select($"id", $"asof_v", $"asof_ts")
      .orderBy("id")
      .as[(Long, Option[String], Option[Long])].collect().toSeq
    assert(out == Seq(
      (1L, Some("x"), Some(10L)), // tie: rts == lts is included
      (2L, Some("x"), Some(10L)),
      (3L, Some("y"), Some(18L)),
      (4L, None, None), // b's only right row is in the future
      (5L, None, None))) // c has no right rows at all
  }

  test("asofBackward matches the brute-force greatest-rts-per-left join") {
    val left = (1 to 200).map(i =>
      (i.toLong, s"k${i % 7}", (i * 13 % 101).toLong)).toDF("id", "k", "ts")
    val right = (1 to 60).map(i =>
      (s"k${i % 7}", (i * 17 % 97).toLong, i.toLong)).toDF("k", "ts", "v")
      // the operator's contract: unique (key, ts) on the right
      .groupBy("k", "ts").agg(max($"v").as("v"))
    val fast = TemporalJoin.asofBackward(left, right,
      Seq("k"), "ts", "ts", Seq("v"))
      .select($"id", $"asof_v", $"asof_ts").orderBy("id")
      .as[(Long, Option[Long], Option[Long])].collect().toSeq
    val naive = left.as("l").join(right.as("r"),
      $"l.k" === $"r.k" && $"r.ts" <= $"l.ts", "left")
      .groupBy($"l.id".as("id"))
      .agg(max(struct($"r.ts", $"r.v")).as("m"))
      .select($"id", $"m.v".as("v"), $"m.ts".as("ts")).orderBy("id")
      .as[(Long, Option[Long], Option[Long])].collect().toSeq
    assert(fast == naive)
  }

  test("rangeJoinBucketed matches the brute-force theta join, inclusive " +
    "bounds, across bucket boundaries") {
    val w = 10L
    // ts values straddle bucket edges (9|10, 19|20 ...) and include exact
    // distance-w pairs on both sides
    val left = (1 to 80).map(i =>
      (i.toLong, s"k${i % 5}", (i * 7 % 53).toLong)).toDF("id", "k", "ts")
    val right = (1 to 80).map(i =>
      (s"k${i % 5}", (i * 11 % 59).toLong, i.toLong)).toDF("k", "rts", "v")
    val fast = TemporalJoin.rangeJoinBucketed(left, right,
      Seq("k"), "ts", "rts", w, Seq("v"))
      .select($"id", $"r_v").orderBy("id", "r_v")
      .as[(Long, Long)].collect().toSeq
    val naive = left.join(right, Seq("k"))
      .filter(abs($"ts" - $"rts") <= w)
      .select($"id", $"v").orderBy("id", "v")
      .as[(Long, Long)].collect().toSeq
    assert(fast == naive)
    assert(fast.nonEmpty)
  }

  test("asofForward: inclusive ties, nulls after last right row, " +
    "key isolation") {
    val left = Seq((1L, "a", 10L), (2L, "a", 15L), (3L, "a", 20L),
      (4L, "b", 100L), (5L, "c", 7L))
      .toDF("id", "k", "ts")
    val right = Seq(("a", 10L, "x"), ("a", 18L, "y"), ("b", 50L, "z"))
      .toDF("k", "ts", "v")
    val out = TemporalJoin.asofForward(left, right,
      keyCols = Seq("k"), leftTsCol = "ts", rightTsCol = "ts",
      valueCols = Seq("v"))
      .select($"id", $"asof_v", $"asof_ts")
      .orderBy("id")
      .as[(Long, Option[String], Option[Long])].collect().toSeq
    assert(out == Seq(
      (1L, Some("x"), Some(10L)), // tie: rts == lts is included
      (2L, Some("y"), Some(18L)),
      (3L, None, None),           // nothing at-or-after 20 for a
      (4L, None, None),           // b's only right row is in the past
      (5L, None, None)))          // c has no right rows at all
  }

  test("asofForward matches the brute-force least-rts-per-left join") {
    val left = (1 to 200).map(i =>
      (i.toLong, s"k${i % 7}", (i * 13 % 101).toLong)).toDF("id", "k", "ts")
    val right = (1 to 60).map(i =>
      (s"k${i % 7}", (i * 17 % 97).toLong, i.toLong)).toDF("k", "ts", "v")
      .groupBy("k", "ts").agg(max($"v").as("v"))
    val fast = TemporalJoin.asofForward(left, right,
      Seq("k"), "ts", "ts", Seq("v"))
      .select($"id", $"asof_v", $"asof_ts").orderBy("id")
      .as[(Long, Option[Long], Option[Long])].collect().toSeq
    val naive = left.as("l").join(right.as("r"),
      $"l.k" === $"r.k" && $"r.ts" >= $"l.ts", "left")
      .groupBy($"l.id".as("id"))
      .agg(min(struct($"r.ts", $"r.v")).as("m"))
      .select($"id", $"m.v".as("v"), $"m.ts".as("ts")).orderBy("id")
      .as[(Long, Option[Long], Option[Long])].collect().toSeq
    assert(fast == naive)
  }

  test("asofBackwardTolerant: stale matches nulled, in-range kept, " +
    "left rows always survive") {
    val left = Seq((1L, "a", 10L), (2L, "a", 100L), (3L, "b", 5L))
      .toDF("id", "k", "ts")
    val right = Seq(("a", 8L, "x"), ("a", 60L, "y"))
      .toDF("k", "ts", "v")
    val out = TemporalJoin.asofBackwardTolerant(left, right,
      keyCols = Seq("k"), leftTsCol = "ts", rightTsCol = "ts",
      valueCols = Seq("v"),
      lagOf = (l, r) => l - r, maxLag = lit(10L))
      .select($"id", $"asof_v", $"asof_ts")
      .orderBy("id")
      .as[(Long, Option[String], Option[Long])].collect().toSeq
    assert(out == Seq(
      (1L, Some("x"), Some(8L)),  // lag 2 <= 10
      (2L, None, None),           // most recent is y at lag 40 — stale
      (3L, None, None)))          // no match at all, row survives
  }

  test("asofBackward plan: one hash exchange total — no join, no " +
    "per-key cross product") {
    val left = Tables(spark, "/root/testdata/sf0.001", "events")
      .select($"event_id", $"user_id", $"ts")
    val right = Tables(spark, "/root/testdata/sf0.001", "events")
      .filter($"event_type" === "purchase")
      .groupBy($"user_id", $"ts").agg(max($"event_id").as("pid"))
    val out = TemporalJoin.asofBackward(left, right,
      Seq("user_id"), "ts", "ts", Seq("pid"))
    val p = out.queryExecution.executedPlan.toString
    assert(!p.contains("Join"), p)
    assert("Exchange hashpartitioning".r.findAllIn(p).length == 2, p)
  }

  test("asofForward plan: same union-window shape — no join") {
    val left = Tables(spark, "/root/testdata/sf0.001", "events")
      .select($"event_id", $"user_id", $"ts")
    val right = Tables(spark, "/root/testdata/sf0.001", "events")
      .filter($"event_type" === "purchase")
      .groupBy($"user_id", $"ts").agg(max($"event_id").as("pid"))
    val out = TemporalJoin.asofForward(left, right,
      Seq("user_id"), "ts", "ts", Seq("pid"))
    val p = out.queryExecution.executedPlan.toString
    assert(!p.contains("Join"), p)
    assert("Exchange hashpartitioning".r.findAllIn(p).length == 2, p)
  }

  test("intervalOverlapJoin: half-open semantics (touching is NOT " +
    "overlap), multi-bucket pairs dedup, keys separate") {
    val a = Seq(
      (1L, 10L, 0L, 100L),    // long interval spanning many buckets
      (1L, 11L, 100L, 150L),  // touches 10's end — no overlap
      (2L, 12L, 0L, 50L)      // other key
    ).toDF("k", "a_id", "a_s", "a_e")
    val b = Seq(
      (1L, 20L, 5L, 95L),   // inside 10 — shares MANY buckets with it
      (1L, 21L, 99L, 101L), // clips 10's last unit AND 11's first
      (2L, 22L, 49L, 60L)   // overlaps 12 by one unit
    ).toDF("k", "b_id", "b_s", "b_e")
    val got = TemporalJoin.intervalOverlapJoin(a, b, Seq("k"),
      "a_s", "a_e", "b_s", "b_e", bucketMicros = 10L)
      .select($"a_id", $"b_id").as[(Long, Long)].collect().toSet
    assert(got == Set((10L, 20L), (10L, 21L), (11L, 21L), (12L, 22L)))
    // dedup: pair (10, 20) shares ~9 buckets but emits once
    val n = TemporalJoin.intervalOverlapJoin(a, b, Seq("k"),
      "a_s", "a_e", "b_s", "b_e", bucketMicros = 10L).count()
    assert(n == 4L, s"multi-bucket pairs not deduped: $n rows")
  }

  test("intervalOverlapJoin: first-common-bucket emission — pair set " +
    "equals the quadratic oracle, no dedup operator in the plan") {
    // a denser corpus than the hand case: every (i, j) combination of
    // widths/offsets so pairs share 0..8 common buckets
    val a = (0L until 12L).map(i => (1L, i, i * 7L, i * 7L + 5L + 4L * i))
      .toDF("k", "a_id", "a_s", "a_e")
    val b = (0L until 12L).map(j => (1L, j, j * 11L, j * 11L + 3L + 6L * j))
      .toDF("k", "b_id", "b_s", "b_e")
    val out = TemporalJoin.intervalOverlapJoin(a, b, Seq("k"),
      "a_s", "a_e", "b_s", "b_e", bucketMicros = 10L)
    val got = out.select($"a_id", $"b_id").as[(Long, Long)]
      .collect().sorted.toSeq
    val want = a.crossJoin(b.withColumnRenamed("k", "k2"))
      .filter($"k" === $"k2" && $"a_s" < $"b_e" && $"b_s" < $"a_e")
      .select($"a_id", $"b_id").as[(Long, Long)].collect().sorted.toSeq
    assert(got == want,
      "first-common-bucket filter must emit exactly the overlap pairs")
    assert(got.distinct == got, "a pair must emit exactly once")
    // the dedup is a filter, not an operator: no Deduplicate/distinct
    // aggregate and no exchange of the full joined row above the join
    val lp = out.queryExecution.optimizedPlan.toString
    assert(!lp.contains("Deduplicate"), lp)
    val pp = out.queryExecution.executedPlan.toString
    assert(!pp.toLowerCase.contains("distinct"), pp)
  }
}
