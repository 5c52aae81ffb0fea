package graft

import graft.operators.IncrementalAgg

/** The algebraic-maintenance contract:
  * merge(aggregate(a), aggregate(b)) == aggregate(a ∪ b), exactly. */
class IncrementalAggSpec extends SparkSuite {
  import spark.implicits._

  private val sums = Seq("v")
  private val mins = Seq("ts")
  private val maxes = Seq("ts")

  test("merge of two partial states equals the full recompute") {
    val a = Seq((1L, 10L, 100L), (1L, 20L, 50L), (2L, 5L, 7L))
      .toDF("k", "ts", "v")
    val b = Seq((1L, 5L, 25L), (3L, 99L, 1L)) // key 3 is delta-only
      .toDF("k", "ts", "v")
    val merged = IncrementalAgg.merge(
      IncrementalAgg.aggregate(a, Seq("k"), sums, mins, maxes),
      IncrementalAgg.aggregate(b, Seq("k"), sums, mins, maxes),
      Seq("k"), sums, mins, maxes)
    val full = IncrementalAgg.aggregate(a.union(b), Seq("k"), sums, mins, maxes)
    val asMap = (df: org.apache.spark.sql.DataFrame) =>
      df.select($"k", $"n_rows", $"sum_v", $"min_ts", $"max_ts")
        .as[(Long, Long, Long, Long, Long)].collect()
        .map(r => r._1 -> ((r._2, r._3, r._4, r._5))).toMap
    val m = asMap(merged)
    assert(m == asMap(full))
    // and the state is what the raw rows say it should be
    assert(m(1L) == ((3L, 175L, 5L, 20L)))
    assert(m(2L) == ((1L, 7L, 5L, 5L)))
    assert(m(3L) == ((1L, 1L, 99L, 99L)))
  }

  test("merge is associative: folding deltas one at a time matches " +
    "one-shot aggregation") {
    val batches = Seq(
      Seq((1L, 1L, 1L), (2L, 2L, 2L)),
      Seq((1L, 3L, 3L)),
      Seq((2L, 0L, 10L), (3L, 9L, 9L)))
      .map(_.toDF("k", "ts", "v"))
    val folded = batches.map(IncrementalAgg.aggregate(_, Seq("k"), sums, mins, maxes))
      .reduce(IncrementalAgg.merge(_, _, Seq("k"), sums, mins, maxes))
    val full = IncrementalAgg.aggregate(
      batches.reduce(_ union _), Seq("k"), sums, mins, maxes)
    assert(folded.orderBy($"k").collect().toSeq ==
      full.orderBy($"k").collect().toSeq)
  }

  test("merge rejects mismatched state schemas") {
    val st = IncrementalAgg.aggregate(
      Seq((1L, 1L, 1L)).toDF("k", "ts", "v"), Seq("k"), sums, mins, maxes)
    val other = IncrementalAgg.aggregate(
      Seq((1L, 1L)).toDF("k", "v"), Seq("k"), Seq("v"))
    intercept[IllegalArgumentException] {
      IncrementalAgg.merge(st, other, Seq("k"), sums, mins, maxes)
    }
  }

  test("merge rejects a spec narrower than the state it is merging — " +
    "silent state-column loss must not pass") {
    val st = IncrementalAgg.aggregate(
      Seq((1L, 1L, 1L)).toDF("k", "ts", "v"), Seq("k"), sums, mins, maxes)
    val e = intercept[IllegalArgumentException] {
      // both frames carry min_ts/max_ts, but the spec omits them
      IncrementalAgg.merge(st, st, Seq("k"), sums)
    }
    assert(e.getMessage.contains("covers"))
  }
}
