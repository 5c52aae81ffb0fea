package graft

import org.apache.spark.sql.functions.when

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

  test("sum-of-squares state merges exactly; derived avg/variance match " +
    "a two-pass recompute") {
    val a = Seq((1L, 10L), (1L, 20L), (1L, 40L), (2L, 7L)).toDF("k", "v")
    val b = Seq((1L, 30L), (2L, 7L), (3L, 5L)).toDF("k", "v")
    val spec = (d: org.apache.spark.sql.DataFrame) =>
      IncrementalAgg.aggregate(d, Seq("k"), sums, sumsqs = Seq("v"))
    val merged = IncrementalAgg.merge(spec(a), spec(b), Seq("k"),
      sums, sumsqs = Seq("v"))
    val full = spec(a.union(b))
    // state identical bit-for-bit, including the decimal sumsq
    assert(merged.orderBy($"k").collect().toSeq ==
      full.orderBy($"k").collect().toSeq)

    // derived moments: avg and POPULATION variance vs hand arithmetic
    val d = IncrementalAgg.derived(merged, avgs = Seq("v"), vars = Seq("v"))
      .select($"k", $"avg_v", $"var_v")
      .as[(Long, Double, Double)].collect()
      .map(r => r._1 -> ((r._2, r._3))).toMap
    // key 1: values 10,20,40,30 → avg 25, var ((100+400+1600+900)·4−100²)/16
    assert(d(1L) == ((25.0, (3000.0 * 4 - 10000.0) / 16)))
    // key 2: two equal values → variance exactly 0 (decimal numerator
    // cancels exactly; a float two-pass could leave dust here)
    assert(d(2L) == ((7.0, 0.0)))
    // key 3: single row → variance 0
    assert(d(3L) == ((5.0, 0.0)))

    // and against Spark's own var_pop as an independent recompute
    val ref = a.union(b).groupBy($"k")
      .agg(org.apache.spark.sql.functions.var_pop($"v").as("vp"))
      .as[(Long, Double)].collect().toMap
    d.foreach { case (k, (_, vv)) =>
      assert(math.abs(vv - ref(k)) < 1e-9, s"key $k: $vv vs ${ref(k)}")
    }
  }

  test("reaggregateKeys: affected keys rebuilt (min/max retracted), " +
    "unaffected state rows pass through bit-for-bit") {
    val history = Seq((1L, 10L, 100L), (1L, 20L, 50L), (2L, 5L, 7L),
      (3L, 9L, 9L)).toDF("k", "ts", "v")
    val spec = (d: org.apache.spark.sql.DataFrame) =>
      IncrementalAgg.aggregate(d, Seq("k"), sums, mins, maxes)
    // wrong feed: key 1's values and timestamps doubled upstream
    val wrong = history.withColumn("v",
      when($"k" === 1, $"v" * 2).otherwise($"v"))
      .withColumn("ts", when($"k" === 1, $"ts" * 2).otherwise($"ts"))
    val state = spec(wrong)
    val repaired = IncrementalAgg.reaggregateKeys(state,
      history.filter($"k" === 1), Seq("k"), sums, mins, maxes)
    // repaired state == clean full recompute, bit for bit — including
    // max_ts shrinking from 40 back to 20, which merge() cannot do
    assert(repaired.orderBy($"k").collect().toSeq ==
      spec(history).orderBy($"k").collect().toSeq)
    // a key with no history rows in the slice is untouched
    val noop = IncrementalAgg.reaggregateKeys(state,
      history.filter($"k" === 99), Seq("k"), sums, mins, maxes)
    assert(noop.orderBy($"k").collect().toSeq ==
      state.orderBy($"k").collect().toSeq)
    // schema-mismatched rebuild spec fails loudly
    intercept[IllegalArgumentException] {
      IncrementalAgg.reaggregateKeys(state, history.filter($"k" === 1),
        Seq("k"), sums)
    }
  }

  test("saveState/loadState: the reloaded state merges bit-identically " +
    "to the in-memory frame it was written from") {
    val a = Seq((1L, 10L, 100L), (1L, 20L, 50L), (2L, 5L, 7L))
      .toDF("k", "ts", "v")
    val b = Seq((1L, 5L, 25L), (3L, 99L, 1L)).toDF("k", "ts", "v")
    val base = IncrementalAgg.aggregate(a, Seq("k"), sums, mins, maxes,
      sumsqs = Seq("v"))
    val delta = IncrementalAgg.aggregate(b, Seq("k"), sums, mins, maxes,
      sumsqs = Seq("v"))
    val path = java.nio.file.Files.createTempDirectory("graft-incagg")
      .resolve("state").toString
    IncrementalAgg.saveState(base, path)
    val loaded = IncrementalAgg.loadState(spark, path, Seq("k"),
      sums, mins, maxes, sumsqs = Seq("v"))
    // the round-trip itself is exact — longs and decimal(38,0) alike
    assert(loaded.orderBy($"k").collect().toSeq ==
      base.orderBy($"k").collect().toSeq)
    // and the chain downstream of the cold reload equals the in-memory
    // chain bit for bit
    val viaDisk = IncrementalAgg.merge(loaded, delta, Seq("k"),
      sums, mins, maxes, sumsqs = Seq("v"))
    val inMem = IncrementalAgg.merge(base, delta, Seq("k"),
      sums, mins, maxes, sumsqs = Seq("v"))
    assert(viaDisk.orderBy($"k").collect().toSeq ==
      inMem.orderBy($"k").collect().toSeq)
    // a spec that doesn't cover the stored table fails loudly at load
    val e = intercept[IllegalArgumentException] {
      IncrementalAgg.loadState(spark, path, Seq("k"), sums)
    }
    assert(e.getMessage.contains("spec expects"))
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
