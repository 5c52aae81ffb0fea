package graft

import graft.operators.Layout
import org.apache.spark.sql.functions._

/** Z-order layout: Morton interleave arithmetic, quadrant locality (the
  * property file-level min/max pruning relies on), and the physical
  * range partitioning of clusterByZOrder. */
class LayoutSpec extends SparkSuite {
  import spark.implicits._

  test("zValue2: hand-checked Morton values") {
    val pts = Seq((0L, 0L), (1L, 0L), (0L, 1L), (1L, 1L), (2L, 3L),
      (7L, 7L), (5L, 2L)).toDF("x", "y")
    val got = pts.withColumn("z", Layout.zValue2($"x", $"y", bits = 3))
      .as[(Long, Long, Long)].collect()
      .map { case (x, y, z) => (x, y) -> z }.toMap
    // interleave: x bits at even positions, y bits at odd
    assert(got((0L, 0L)) == 0L)
    assert(got((1L, 0L)) == 1L)
    assert(got((0L, 1L)) == 2L)
    assert(got((1L, 1L)) == 3L)
    assert(got((2L, 3L)) == 14L) // x=10, y=11 → y1 x1 y0 x0 = 1110
    assert(got((7L, 7L)) == 63L)
    assert(got((5L, 2L)) == 25L) // x=101, y=010 → 011001
  }

  test("zValue2: negative keys wrap into [0, 2^bits) via pmod — never " +
    "interleave a negative residue") {
    // -1 mod 8 = 7, -3 mod 8 = 5, -8 mod 8 = 0: each negative key must
    // produce exactly the z-value of its wrapped non-negative twin.
    val pts = Seq((-1L, -1L), (-3L, 2L), (-8L, 3L), (5L, -6L))
      .toDF("x", "y")
    val got = pts.withColumn("z", Layout.zValue2($"x", $"y", bits = 3))
      .as[(Long, Long, Long)].collect()
      .map { case (x, y, z) => (x, y) -> z }.toMap
    val twin = Seq((7L, 7L), (5L, 2L), (0L, 3L), (5L, 2L)).toDF("x", "y")
      .withColumn("z", Layout.zValue2($"x", $"y", bits = 3))
      .as[(Long, Long, Long)].collect()
      .map { case (x, y, z) => (x, y) -> z }.toMap
    assert(got((-1L, -1L)) == twin((7L, 7L)))
    assert(got((-3L, 2L)) == twin((5L, 2L)))
    assert(got((-8L, 3L)) == twin((0L, 3L)))
    assert(got((5L, -6L)) == twin((5L, 2L)))
    // and every emitted z stays in the valid [0, 4^bits) range
    assert(got.values.forall(z => z >= 0L && z < 64L))
  }

  test("zValue2: quadrant locality — every quadrant owns one contiguous, " +
    "disjoint zkey range (what file min/max stats prune on)") {
    val grid = for (x <- 0L until 16L; y <- 0L until 16L) yield (x, y)
    val z = grid.toDF("x", "y")
      .withColumn("z", Layout.zValue2($"x", $"y", bits = 4))
      .withColumn("quad", ($"x" >= 8).cast("int") * 2 + ($"y" >= 8).cast("int"))
      .groupBy($"quad").agg(min($"z").as("lo"), max($"z").as("hi"),
        count(lit(1)).as("n"))
      .as[(Int, Long, Long, Long)].collect().sortBy(_._2)
    assert(z.length == 4 && z.forall(_._4 == 64L))
    // each quadrant's range covers exactly its 64 points: contiguous...
    assert(z.forall { case (_, lo, hi, n) => hi - lo + 1 == n })
    // ...and disjoint from the next quadrant's
    assert(z.sliding(2).forall { case Array(a, b) => a._3 < b._2 })
  }

  test("clusterByZOrder: physical RangePartitioning on the zkey") {
    val df = (0L until 256L).map(i => (i % 16, i / 16)).toDF("kx", "ky")
    val out = Layout.clusterByZOrder(df, "kx", "ky", numPartitions = 4)
    val plan = out.queryExecution.executedPlan.toString
    assert(plan.toLowerCase.contains("rangepartitioning"))
    assert(out.rdd.getNumPartitions == 4)
    // collision guard
    intercept[IllegalArgumentException] {
      Layout.clusterByZOrder(out, "kx", "ky", 4)
    }
  }

  test("bloom manifest skips files for point lookups where min/max " +
    "pruning is blind (unclustered layout)") {
    val root = java.nio.file.Files.createTempDirectory("bloom_skip").toString
    val store = s"$root/store"
    // round-robin layout: every file's key interval spans the domain
    spark.range(0, 8000)
      .select($"id".as("k"), ($"id" % 7).as("v"))
      .repartition(8).write.parquet(store)
    val mm = s"$root/minmax"
    graft.operators.Skipping.writeManifest(spark, store, Seq("k"), mm)
    val total = spark.read.parquet(store).inputFiles.length
    assert(graft.operators.Skipping.pruneFiles(
      spark.read.parquet(mm), "k", 42L, 42L).size == total,
      "min/max must be BLIND on this layout — the case blooms exist for")
    val bm = s"$root/bloom"
    graft.operators.Skipping.writeBloomManifest(spark, store, "k", bm,
      expectedPerFile = 1000L)
    val admitted = graft.operators.Skipping.pruneFilesPoint(spark, bm, 42L)
    assert(admitted.size < total,
      s"bloom admitted ${admitted.size}/$total — no skip happened")
    val got = graft.operators.Skipping
      .scanPoint(spark, store, bm, "k", 42L)
      .select($"k", $"v").as[(Long, Long)].collect().toSeq
    assert(got == Seq((42L, 0L)), "pruning may skip bytes, never rows")
    assert(graft.operators.Skipping
      .scanPoint(spark, store, bm, "k", 999999L).count() == 0L,
      "an absent key is an empty answer, not an error")
  }

  test("hilbertValueN: bijection onto [0, 2^(n*bits)) and UNIT-STEP " +
    "adjacency — consecutive indexes are grid neighbors, the locality " +
    "Morton loses at higher dimensions") {
    // 2-D, 4 bits: the full 16x16 grid through the ENGINE's expression
    // (codegen path), pinned cell by cell
    val grid2 = (0 until 16).flatMap(x => (0 until 16).map(y =>
      (x.toLong, y.toLong))).toDF("x", "y")
    val h2 = grid2.select($"x", $"y",
      Layout.hilbertValueN(Seq($"x", $"y"), bits = 4).as("h"))
      .as[(Long, Long, Long)].collect()
    assert(h2.map(_._3).sorted.toSeq == (0L until 256L),
      "2-D Hilbert must be a bijection onto 0..255")
    val byIdx2 = h2.map(r => r._3 -> ((r._1, r._2))).toMap
    (0L until 255L).foreach { h =>
      val (x1, y1) = byIdx2(h); val (x2, y2) = byIdx2(h + 1)
      assert(math.abs(x1 - x2) + math.abs(y1 - y2) == 1,
        s"indexes $h and ${h + 1} are not grid-adjacent")
    }
    // 3-D, 3 bits: the full 8x8x8 cube
    val grid3 = (0 until 8).flatMap(x => (0 until 8).flatMap(y =>
      (0 until 8).map(z => (x.toLong, y.toLong, z.toLong)))).toDF("x", "y", "z")
    val h3 = grid3.select($"x", $"y", $"z",
      Layout.hilbertValueN(Seq($"x", $"y", $"z"), bits = 3).as("h"))
      .as[(Long, Long, Long, Long)].collect()
    assert(h3.map(_._4).sorted.toSeq == (0L until 512L),
      "3-D Hilbert must be a bijection onto 0..511")
    val byIdx3 = h3.map(r => r._4 -> ((r._1, r._2, r._3))).toMap
    (0L until 511L).foreach { h =>
      val (a, b) = (byIdx3(h), byIdx3(h + 1))
      assert(math.abs(a._1 - b._1) + math.abs(a._2 - b._2) +
        math.abs(a._3 - b._3) == 1,
        s"indexes $h and ${h + 1} are not cube-adjacent")
    }
    // null propagation mirrors the Morton arithmetic
    val n = Seq((Some(1L), None: Option[Long])).toDF("x", "y")
      .select(Layout.hilbertValueN(Seq($"x", $"y"), 4).as("h"))
      .collect().head
    assert(n.isNullAt(0), "a null key must yield a null index")
  }

  test("clusterByHilbertN: physical RangePartitioning on the hkey; " +
    "negative keys wrap via pmod like the Morton form") {
    val df = (0 until 256).map(i =>
      (i.toLong, (i % 16).toLong, ((i * 7) % 16).toLong))
      .toDF("row", "a", "b")
    val clustered = Layout.clusterByHilbertN(df, Seq("a", "b"),
      numPartitions = 4, bits = 4)
    val plan = clustered.queryExecution.executedPlan.toString
    assert(plan.contains("rangepartitioning") ||
      plan.contains("RangePartitioning"),
      s"expected a range exchange on hkey:\n$plan")
    assert(clustered.drop("hkey").except(df).isEmpty &&
      df.except(clustered.drop("hkey")).isEmpty,
      "clustering must re-arrange rows, never change them")
    val neg = Seq((-1L, 3L)).toDF("x", "y")
      .select(Layout.hilbertValueN(Seq($"x", $"y"), 4).as("h"))
      .as[Long].head()
    val wrapped = Seq((15L, 3L)).toDF("x", "y")
      .select(Layout.hilbertValueN(Seq($"x", $"y"), 4).as("h"))
      .as[Long].head()
    assert(neg == wrapped, "-1 must wrap to 2^bits - 1 under pmod")
  }
}
