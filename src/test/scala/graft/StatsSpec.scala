package graft

import graft.operators.Stats
import org.apache.spark.sql.functions._

/** Histogram floor alignment (negatives included) and trapezoidal TWA
  * hand cases, including the zero-span null. */
class StatsSpec extends SparkSuite {
  import spark.implicits._

  test("histogram: floor-aligned bins, negatives land below zero") {
    val df = Seq(("a", -3L), ("a", -10L), ("a", 0L), ("a", 9L), ("a", 10L),
      ("b", 25L)).toDF("g", "v")
    val got = Stats.histogram(df, "v", Seq("g"), width = 10L)
      .select($"g", $"bin_lo", $"bin_hi", $"n", $"v_min", $"v_max")
      .as[(String, Long, Long, Long, Long, Long)].collect().toSet
    assert(got == Set(
      ("a", -10L, 0L, 2L, -10L, -3L), // -3 floors to -10, NOT 0
      ("a", 0L, 10L, 2L, 0L, 9L),
      ("a", 10L, 20L, 1L, 10L, 10L),
      ("b", 20L, 30L, 1L, 25L, 25L)))
  }

  test("equiDepthHistogram: equal-count tiles, extras to the first tiles, " +
    "extents cover the group") {
    // 7 rows, 3 buckets → sizes 3,2,2; values sorted 1..7
    val df = (1L to 7L).map(i => ("g", i, i * 10L)).toDF("g", "id", "v")
    val got = Stats.equiDepthHistogram(df, "v", Seq("g"), 3, "id")
      .select($"tile", $"n", $"v_min", $"v_max")
      .as[(Long, Long, Long, Long)].collect().toSet
    assert(got == Set((1L, 3L, 10L, 30L), (2L, 2L, 40L, 50L),
      (3L, 2L, 60L, 70L)))
  }

  test("cdfNormalize: ties share ranks; pct spans [0,1]; singleton pct 0") {
    val df = Seq(("a", 1L, 10L), ("a", 2L, 20L), ("a", 3L, 20L),
      ("a", 4L, 40L), ("b", 5L, 7L)).toDF("g", "id", "v")
    val got = Stats.cdfNormalize(df, "v", Seq("g"))
      .select($"id", $"rank", $"pct")
      .as[(Long, Long, Double)].collect()
      .map { case (id, r, p) => id -> ((r, p)) }.toMap
    assert(got(1L) == ((1L, 0.0)))
    assert(got(2L) == ((2L, 1.0 / 3)) && got(3L) == ((2L, 1.0 / 3)))
    assert(got(4L) == ((4L, 1.0)))
    assert(got(5L) == ((1L, 0.0))) // singleton group
  }

  test("expectations: one-pass rule counts; uniqueness counts ALL rows " +
    "of an over-populated key") {
    val df = Seq((1L, 10L), (2L, -5L), (2L, 60L), (3L, 20L))
      .toDF("k", "v")
    val rows = Stats.expectRows(df, Seq(
        "v_positive" -> ($"v" <= 0),
        "v_in_range" -> !$"v".between(0, 50)))
      .unionByName(Stats.expectUniqueKey(df, Seq("k")))
      .as[(String, Long, Long)].collect().toSet
    assert(rows == Set(
      ("v_positive", 4L, 1L),
      ("v_in_range", 4L, 2L), // -5 and 60
      ("unique_key", 4L, 2L))) // both k=2 rows violate
  }

  test("chiSquareCells: hand 2x2 table; contributions symmetric") {
    // rows: x:(a=30,b=10), y:(a=10,b=30); n=80; every marginal 40
    // expected = 40*40/80 = 20; contribution = (30-20)^2/20 = 5 each
    val df = (Seq.fill(30)(("x", "a")) ++ Seq.fill(10)(("x", "b")) ++
      Seq.fill(10)(("y", "a")) ++ Seq.fill(30)(("y", "b")))
      .toDF("r", "c")
    val got = Stats.chiSquareCells(df, "r", "c")
      .select($"r", $"c", $"observed", $"row_total", $"col_total", $"n",
        $"expected", $"contribution")
      .as[(String, String, Long, Long, Long, Long, Double, Double)]
      .collect().toSet
    assert(got == Set(
      ("x", "a", 30L, 40L, 40L, 80L, 20.0, 5.0),
      ("x", "b", 10L, 40L, 40L, 80L, 20.0, 5.0),
      ("y", "a", 10L, 40L, 40L, 80L, 20.0, 5.0),
      ("y", "b", 30L, 40L, 40L, 80L, 20.0, 5.0)))
  }

  test("tukeyClip: fences from hand quartiles; outliers clip, bulk passes") {
    // group g: values 0,4,8,12,16,1000 → rank positions (n−1)·q:
    // q1 at 1.25 → 4 + 0.25·4 = 5; q3 at 3.75 → 12 + 0.75·4 = 15
    // (dyadic interpolation); IQR 10, fences [−10, 30]
    val df = Seq(0L, 4L, 8L, 12L, 16L, 1000L).map(("g", _)).toDF("g", "v")
    val got = Stats.tukeyClip(df, "v", Seq("g"))
      .select($"v", $"q1", $"q3", $"lo", $"hi", $"clipped")
      .as[(Long, Double, Double, Double, Double, Double)].collect().toSet
    assert(got.forall { case (_, q1, q3, lo, hi, _) =>
      q1 == 5.0 && q3 == 15.0 && lo == -10.0 && hi == 30.0 })
    assert(got.map(t => t._1 -> t._6).toMap ==
      Map(0L -> 0.0, 4L -> 4.0, 8L -> 8.0, 12L -> 12.0, 16L -> 16.0,
        1000L -> 30.0))
    intercept[IllegalArgumentException] {
      Stats.tukeyClip(df.withColumnRenamed("v", "clipped"), "clipped", Seq("g"))
    }
  }

  test("timeWeightedAvg: hand trapezoid; constant series averages to itself") {
    // key 1: (t=0,v=0), (t=10,v=10), (t=30,v=0)
    // num = (0+10)*10 + (10+0)*20 = 300; den = 2*30 = 60; twa = 5.0
    val df = Seq((1L, 1L, 0L, 0L), (1L, 2L, 10L, 10L), (1L, 3L, 30L, 0L),
      (2L, 4L, 0L, 7L), (2L, 5L, 5L, 7L)) // constant 7
      .toDF("k", "id", "t", "v")
    val got = Stats.timeWeightedAvg(df, Seq("k"), "t", "v", "id")
      .select($"k", $"n_segments", $"num", $"den", $"twa")
      .as[(Long, Long, Long, Long, Option[Double])].collect().toSet
    assert(got == Set(
      (1L, 2L, 300L, 60L, Some(5.0)),
      (2L, 1L, 70L, 10L, Some(7.0))))
  }

  test("zero time span (single point or all-tied timestamps) → null twa") {
    val df = Seq((1L, 1L, 5L, 100L), // single point
      (2L, 2L, 5L, 10L), (2L, 3L, 5L, 90L)) // two points, same ts
      .toDF("k", "id", "t", "v")
    val got = Stats.timeWeightedAvg(df, Seq("k"), "t", "v", "id")
      .select($"k", $"twa").as[(Long, Option[Double])].collect().toSet
    assert(got == Set((1L, None), (2L, None)))
  }

  test("cdfNormalize / equiDepthHistogram: count-by-value plans equal " +
    "the per-row window formulations on the real events table") {
    val dir = "/root/testdata/sf0.001"
    val e = Tables(spark, dir, "events")
      .select($"event_type".cast("string").as("g"), $"event_id".as("id"),
        round($"value" * 100).cast("long").as("v"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy($"g").orderBy($"v")
    val wantCdf = e
      .withColumn("rank", rank().over(w).cast("long"))
      .withColumn("pct", percent_rank().over(w))
      .select($"id", $"rank", $"pct")
      .as[(Long, Long, Double)].collect().sortBy(_._1).toSeq
    val gotCdf = Stats.cdfNormalize(e, "v", Seq("g"))
      .select($"id", $"rank", $"pct")
      .as[(Long, Long, Double)].collect().sortBy(_._1).toSeq
    assert(gotCdf == wantCdf) // exact, doubles included
    val w2 = org.apache.spark.sql.expressions.Window
      .partitionBy($"g").orderBy($"v", $"id")
    val wantEd = e.withColumn("tile", ntile(8).over(w2).cast("long"))
      .groupBy($"g", $"tile")
      .agg(count(lit(1)).as("n"), min($"v").as("v_min"), max($"v").as("v_max"))
      .as[(String, Long, Long, Long, Long)].collect().sorted.toSeq
    val gotEd = Stats.equiDepthHistogram(e, "v", Seq("g"), 8, "id")
      .as[(String, Long, Long, Long, Long)].collect().sorted.toSeq
    assert(gotEd == wantEd)
  }

  test("expectForeignKey: unmatched keys violate, null child keys " +
    "assert nothing, clean FK reports zero") {
    val child = Seq((1L, Some(10L)), (2L, Some(20L)), (3L, Some(99L)),
      (4L, None)).toDF("id", "fk")
    val parent = Seq(10L, 20L, 30L).toDF("pk")
    val got = Stats.expectForeignKey(child, parent, Seq("fk"), Seq("pk"))
      .as[(String, Long, Long)].head()
    assert(got == (("foreign_key", 4L, 1L)),
      "99 violates; the null key passes (SQL FK semantics)")
    val clean = Stats.expectForeignKey(
      child.filter($"fk" =!= 99L), parent, Seq("fk"), Seq("pk"), "ok")
      .as[(String, Long, Long)].head()
    assert(clean == (("ok", 2L, 0L)))
  }

  test("equiDepthHistogram rank arithmetic equals ntile across random " +
    "tie-heavy multisets and bucket counts") {
    // heavy ties are the adversarial case: a value's rank span crosses
    // several tile boundaries, and n mod k exercises both tile sizes
    for (seed <- 1 to 3; buckets <- Seq(1, 4, 7)) {
      val rnd = new scala.util.Random(seed * 1000 + buckets)
      val n = 50 + rnd.nextInt(250)
      val rows = (1 to n).map { i =>
        (s"g${rnd.nextInt(3)}", i.toLong, rnd.nextInt(12).toLong)
      }
      val df = rows.toDF("g", "id", "v")
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy($"g").orderBy($"v", $"id")
      val want = df.withColumn("tile", ntile(buckets).over(w).cast("long"))
        .groupBy($"g", $"tile")
        .agg(count(lit(1)).as("n"), min($"v").as("v_min"),
          max($"v").as("v_max"))
        .as[(String, Long, Long, Long, Long)].collect().sorted.toSeq
      val got = Stats.equiDepthHistogram(df, "v", Seq("g"), buckets, "id")
        .as[(String, Long, Long, Long, Long)].collect().sorted.toSeq
      assert(got == want, s"seed=$seed buckets=$buckets n=$n")
    }
  }

  test("ev_median_mad: count-by-value selection equals the per-row " +
    "rank formulation on the real events table") {
    // the deployed query pre-aggregates (event_type, cents) → cnt and
    // selects the value whose cumulative-count range contains ⌈n/2⌉;
    // this brute twin ranks every ROW (the shape the deployed plan
    // must avoid at scale) — identical output pins the rewrite
    val dir = "/root/testdata/sf0.001"
    val got = SparkEntry.queries("ev_median_mad")(spark, dir)
      .as[(String, Long, Long, Long)].collect().toSeq.sorted
    val e = Tables(spark, dir, "events")
      .select($"event_type".cast("string").as("et"), $"event_id",
        round($"value" * 100).cast("long").as("x"))
    val byX = org.apache.spark.sql.expressions.Window
      .partitionBy($"et").orderBy($"x", $"event_id")
    val grp = org.apache.spark.sql.expressions.Window.partitionBy($"et")
    val med = e.withColumn("rn", row_number().over(byX))
      .withColumn("n", count(lit(1)).over(grp))
      .filter($"rn" === expr("(n + 1) div 2"))
      .select($"et", $"n", $"x".as("m"))
    val byD = org.apache.spark.sql.expressions.Window
      .partitionBy($"et").orderBy($"d", $"event_id")
    val want = e.join(med, Seq("et"))
      .withColumn("d", abs($"x" - $"m"))
      .withColumn("rn", row_number().over(byD))
      .filter($"rn" === expr("(n + 1) div 2"))
      .select($"et", $"n", $"m", $"d")
      .as[(String, Long, Long, Long)].collect().toSeq.sorted
    assert(got == want)
  }
  test("profileNumeric/profileDrift: exact one-pass metrics, all-null " +
    "min/max stay null, drift deltas line up") {
    val old = Seq((1L, Some(10L)), (2L, Some(20L)), (3L, Some(20L)))
      .toDF("id", "x")
    val neu = Seq((1L, None: Option[Long]), (2L, Some(40L)),
      (3L, Some(40L)), (4L, Some(5L))).toDF("id", "x")
    val prof = Stats.profileNumeric(old, Seq("x"))
      .as[(String, String, Option[Double])].collect()
      .map(r => (r._2, r._3)).toMap
    assert(prof == Map("n_rows" -> Some(3.0), "n_nulls" -> Some(0.0),
      "n_distinct" -> Some(2.0), "min" -> Some(10.0), "max" -> Some(20.0)))
    val drift = Stats.profileDrift(old, neu, Seq("x"))
      .select($"metric", $"old_value", $"new_value", $"delta")
      .as[(String, Option[Double], Option[Double], Option[Double])]
      .collect().map(r => (r._1, (r._2, r._3, r._4))).toMap
    assert(drift("n_rows") == (Some(3.0), Some(4.0), Some(1.0)))
    assert(drift("n_nulls") == (Some(0.0), Some(1.0), Some(1.0)))
    assert(drift("n_distinct") == (Some(2.0), Some(2.0), Some(0.0)))
    assert(drift("min") == (Some(10.0), Some(5.0), Some(-5.0)))
    assert(drift("max") == (Some(20.0), Some(40.0), Some(20.0)))
    // an all-null column reports null min/max/delta, never fake zeros
    val allNull = Seq((1L, None: Option[Long])).toDF("id", "x")
    val nn = Stats.profileDrift(allNull, allNull, Seq("x"))
      .select($"metric", $"old_value", $"new_value", $"delta")
      .as[(String, Option[Double], Option[Double], Option[Double])]
      .collect().map(r => (r._1, (r._2, r._3, r._4))).toMap
    assert(nn("min") == (None, None, None) && nn("max") == (None, None, None))
    assert(nn("n_nulls") == (Some(1.0), Some(1.0), Some(0.0)))
    intercept[IllegalArgumentException] {
      Stats.profileNumeric(old, Seq.empty)
    }
  }
  test("profileByGroup: exact base metrics, KMV exact-branch distinct " +
    "below k, all-null groups report null bounds and a 0 estimate") {
    val df = Seq(
      ("a", Some(10L)), ("a", Some(10L)), ("a", Some(30L)),
      ("a", None: Option[Long]),
      ("b", None: Option[Long]), ("b", None: Option[Long]))
      .toDF("g", "v")
    val got = Stats.profileByGroup(df, "g", "v", k = 64)
      .orderBy("g")
      .as[(String, Long, Long, Option[Long], Option[Long], Long, Double)]
      .collect().toSeq
    assert(got == Seq(
      ("a", 4L, 1L, Some(10L), Some(30L), 2L, 2.0),
      ("b", 2L, 2L, None, None, 0L, 0.0)))
  }

  test("ksScaled: exact cross-multiplied KS — known two-sample answer, " +
    "invariant under row order") {
    // A = {1,2}, B = {2,3}: ECDFs differ by 1/2 at x=1 and x=2 ->
    // ks_scaled = max|cumA*nb - cumB*na| = 2 (= 0.5 * (2*2))
    val rows = Seq(
      ("k", 1L, 0L), ("k", 2L, 0L), ("k", 2L, 1L), ("k", 3L, 1L))
      .toDF("g", "v", "side")
    val got = graft.operators.Stats.ksScaled(rows, Seq("g"), "v", "side")
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        r.getLong(3))).toSeq
    assert(got == Seq(("k", 2L, 2L, 2L)))
    val re = graft.operators.Stats
      .ksScaled(rows.repartition(5), Seq("g"), "v", "side")
      .collect().map(r => r.getLong(3)).toSeq
    assert(re == Seq(2L))
  }
}
