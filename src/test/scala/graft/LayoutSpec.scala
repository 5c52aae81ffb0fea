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
}
