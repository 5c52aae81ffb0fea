package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.operators.Snapshots

/** Round-17 lakehouse maintenance surfaces: the deletion-vector growth
  * trigger ([[Snapshots.dvStats]]), metadata-only schema type widening
  * (int→long, float→double through [[Snapshots]]' append merge), and
  * the N-dimensional Z-order layout
  * ([[Snapshots.commitZorderedN]]/[[Snapshots.scanBoxAsOfN]]). */
class SnapshotsMaintenanceSpec extends SparkSuite {
  import spark.implicits._

  private def freshTable(): String = {
    val p = Files.createTempDirectory("snap_maint_").toString + "/tbl"
    Snapshots.init(spark, p)
    p
  }

  test("dvStats: repeated deleteWhere grows the gauge past the " +
    "threshold, optimize clears it — all from metadata") {
    val tbl = freshTable()
    Snapshots.commit(spark,
      (1L to 100L).map(i => (i, s"r$i")).toDF("id", "v"),
      tbl, append = false)
    def gauge() = {
      val r = Snapshots.dvStats(spark, tbl, compactAt = 0.1).collect().head
      (r.getLong(1), r.getLong(2), r.getBoolean(4))
    }
    assert(gauge() == ((100L, 0L, false)), "a DV-free table reads zero")
    Snapshots.deleteWhere(spark, tbl, col("id") <= 5L)
    assert(gauge() == ((100L, 5L, false)), "5% is below the 10% trigger")
    Snapshots.deleteWhere(spark, tbl, col("id") > 5L && col("id") <= 15L)
    val (phys, dvRows, due) = gauge()
    assert(phys == 100L && dvRows == 15L && due,
      s"15% must trip the trigger: $phys/$dvRows/$due")
    // the logical face never lies while the gauge is hot
    assert(Snapshots.countAsOf(spark, tbl,
      Snapshots.latestVersion(spark, tbl).get) == 85L)
    // OPTIMIZE rewrites through the DV-applied read: fresh DV-free
    // files, dead entries drop out of the gauge by construction
    Snapshots.optimize(spark, tbl, targetBytes = 1L << 30)
    assert(gauge() == ((85L, 0L, false)),
      "optimize must clear the deletion pressure")
  }

  test("schema widening: an append may promote int→long and " +
    "float→double as pure metadata — history reads through the wide " +
    "type, time travel keeps the narrow one, other retypes refuse") {
    val tbl = freshTable()
    val narrow = Seq((1, 1.5f), (2, 2.5f)).toDF("n", "x")
    Snapshots.commit(spark, narrow, tbl, append = false) // v0: int, float
    // the widening batch carries values an int32/float32 cannot hold
    val wide = Seq((3000000000L, 1e40)).toDF("n", "x")
    val v1 = Snapshots.commit(spark, wide, tbl, append = true)
    val head = Snapshots.readAsOf(spark, tbl, v1)
    assert(head.schema("n").dataType == LongType &&
      head.schema("x").dataType == DoubleType,
      s"head must read the widened types, got ${head.schema}")
    assert(head.select($"n").as[Long].collect().sorted.toSeq ==
      Seq(1L, 2L, 3000000000L),
      "old int32 files must up-cast under the widened schema")
    assert(head.filter($"x" > 1e39).count() == 1L)
    // time travel below the widening commit answers the NARROW schema
    val v0Face = Snapshots.readAsOf(spark, tbl, 0L)
    assert(v0Face.schema("n").dataType == IntegerType &&
      v0Face.schema("x").dataType == FloatType,
      s"v0 must keep its own stored types, got ${v0Face.schema}")
    // the NARROW side of the pair may also arrive after the wide one
    val v2 = Snapshots.commit(spark, Seq((7, 7.5f)).toDF("n", "x"),
      tbl, append = true)
    val after = Snapshots.readAsOf(spark, tbl, v2)
    assert(after.schema("n").dataType == LongType &&
      after.select(sum($"n")).as[Long].head() == 3000000010L)
    // anything beyond the two safe pairs still refuses
    val ex = intercept[IllegalArgumentException] {
      Snapshots.commit(spark, Seq(("s", 1.0)).toDF("n", "x"),
        tbl, append = true)
    }
    assert(ex.getMessage.contains("cannot change column"))
  }

  test("clustered stats survive file-preserving metadata verbs: a " +
    "deleteWhere head range-scans through the governing generation " +
    "(DV-applied), a replace buries it and the scan refuses") {
    val tbl = freshTable()
    Snapshots.commitClustered(spark,
      (1L to 100L).map(i => (i, s"r$i")).toDF("k", "v"),
      tbl, "k", numFiles = 4, append = false)
    val vDel = Snapshots.deleteWhere(spark, tbl, col("k") <= 25L)
    // the delete's generation minted no stats dir of its own, but its
    // files are the parent's verbatim — the scan resolves the
    // describing generation and composes with the deletion vectors
    val got = Snapshots.scanRangeAsOf(spark, tbl, vDel, "k", 20L, 30L)
      .select($"k").as[Long].collect().sorted.toSeq
    assert(got == (26L to 30L),
      s"stats scan through a deleteWhere head wrong: $got")
    // a constraint change repoints files verbatim too
    Snapshots.addConstraint(spark, tbl, "k_nn", "k IS NOT NULL")
    val vCon = Snapshots.latestVersion(spark, tbl).get
    assert(Snapshots.scanRangeAsOf(spark, tbl, vCon, "k", 90L, 95L)
      .count() == 6L)
    // a plain replace leaves the described set — bounds no longer
    // speak for the data, so the scan refuses rather than mis-pruning
    Snapshots.commit(spark, Seq((999L, "z")).toDF("k", "v"),
      tbl, append = false)
    val head = Snapshots.latestVersion(spark, tbl).get
    val e = intercept[IllegalArgumentException](
      Snapshots.scanRangeAsOf(spark, tbl, head, "k", 0L, 1000L))
    assert(e.getMessage.contains("no stats manifest"))
  }

  test("optimizePreserving keeps the layout contract under blind " +
    "maintenance: clustered heads keep range skipping, Z-ordered " +
    "heads keep box skipping, partitioned heads keep fragments, " +
    "bloom heads refuse toward optimizeBloom") {
    // clustered + deletion pressure: the compaction must both clear
    // the DVs and leave the new head range-scannable
    val t1 = freshTable()
    Snapshots.commitClustered(spark,
      (1L to 100L).map(i => (i, s"r$i")).toDF("k", "v"),
      t1, "k", numFiles = 4, append = false)
    Snapshots.deleteWhere(spark, t1, col("k") <= 20L)
    val v1 = Snapshots.optimizePreserving(spark, t1, targetBytes = 2048L)
    val got = Snapshots.scanRangeAsOf(spark, t1, v1, "k", 30L, 40L)
      .select($"k").as[Long].collect().sorted.toSeq
    assert(got == (30L to 40L), s"range scan broken after compaction: $got")
    assert(Snapshots.countAsOf(spark, t1, v1) == 80L)
    assert(Snapshots.dvStats(spark, t1).collect().head.getLong(2) == 0L,
      "compaction must clear the deletion pressure")

    // Z-ordered (multi-key stats): box skipping survives, on the
    // sidecar's own keys read off its schema
    val t2 = freshTable()
    Snapshots.commitZorderedN(spark,
      (0 until 512).map(i =>
        (i.toLong, (i % 16).toLong, ((i * 7) % 16).toLong))
        .toDF("row", "a", "b"),
      t2, Seq("a", "b"), numFiles = 8, append = false)
    val v2 = Snapshots.optimizePreserving(spark, t2, targetBytes = 4096L)
    val expect = (0 until 512).filter(i =>
      i % 16 <= 3 && (i * 7) % 16 <= 3).map(_.toLong).sorted
    val box = Snapshots.scanBoxAsOfN(spark, t2, v2,
      Seq(("a", 0L, 3L), ("b", 0L, 3L)))
      .select($"row").as[Long].collect().sorted.toSeq
    assert(box == expect, "box scan broken after compaction")

    // partitioned: fragments survive, one file per partition value
    val t3 = freshTable()
    Snapshots.commitPartitioned(spark,
      Seq((1L, "x", "d1"), (2L, "y", "d2")).toDF("id", "v", "day"),
      t3, "day", append = false)
    Snapshots.commitPartitioned(spark,
      Seq((3L, "z", "d1")).toDF("id", "v", "day"),
      t3, "day", append = true)
    val v3 = Snapshots.optimizePreserving(spark, t3, targetBytes = 1L << 20)
    val d1 = Snapshots.scanPartitionAsOf(spark, t3, v3, "day", "d1")
    assert(d1.select($"id").as[Long].collect().sorted.toSeq ==
      Seq(1L, 3L))
    assert(d1.inputFiles.length == 1,
      "partitioned compaction must leave one file per partition")

    // bloom: the sidecar records its key column, so the fleet sweep
    // rebuilds the point index over the compacted files
    val t4 = freshTable()
    Snapshots.commitBloom(spark,
      (1L to 40L).map(i => (i, s"r$i")).toDF("id", "v").repartition(4),
      t4, "id", append = false)
    val v4 = Snapshots.optimizePreserving(spark, t4, 1L << 20)
    val hit = Snapshots.scanPointAsOf(spark, t4, v4, "id", 7L)
      .select($"v").as[String].collect().toSeq
    assert(hit == Seq("r7"),
      s"point lookup broken after bloom compaction: $hit")
    assert(Snapshots.countAsOf(spark, t4, v4) == 40L)

    // a LEGACY sidecar without the recorded key still refuses toward
    // the explicit verb rather than guessing the column
    val f = new org.apache.hadoop.fs.Path(t4)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    val bloomDir = s"$t4/_bloom/v$v4"
    val keyless = spark.read.parquet(bloomDir).drop("key")
    val tmp = s"$t4/_bloom/keyless_tmp"
    keyless.coalesce(1).write.parquet(tmp)
    assert(f.delete(new org.apache.hadoop.fs.Path(bloomDir), true))
    assert(f.rename(new org.apache.hadoop.fs.Path(tmp),
      new org.apache.hadoop.fs.Path(bloomDir)))
    val e = intercept[IllegalArgumentException](
      Snapshots.optimizePreserving(spark, t4, 1L << 20))
    assert(e.getMessage.contains("optimizeBloom"))

    // plain: falls through to the plain optimize
    val t5 = freshTable()
    Snapshots.commit(spark, Seq((1L, "a")).toDF("id", "v"),
      t5, append = false)
    val v5 = Snapshots.optimizePreserving(spark, t5, 1L << 20)
    assert(Snapshots.readAsOf(spark, t5, v5).count() == 1L)
  }

  test("sidecar appends resolve the RECORDED lineage parent through " +
    "its describing generation: a bloom/clustered append onto a " +
    "file-preserving metadata head inherits the covering sidecar; an " +
    "append onto an undescribed head refuses BEFORE publishing") {
    // bloom append onto a deleteWhere head: the delete minted no bloom
    // dir of its own, but v0's sidecar still describes its files — the
    // append must union THROUGH it (reading the parent's exact dir
    // would crash on a missing path; unioning the pre-claim observed
    // head's dir is the rebase bug the recorded parent fixes)
    val t1 = freshTable()
    Snapshots.commitBloom(spark,
      (1L to 40L).map(i => (i, s"r$i")).toDF("id", "v").repartition(4),
      t1, "id", append = false)
    Snapshots.deleteWhere(spark, t1, col("id") > 38L)
    val v2 = Snapshots.commitBloom(spark,
      Seq((100L, "fresh")).toDF("id", "v"), t1, "id", append = true)
    // the minted sidecar must admit BOTH eras' files (old-file lookup,
    // fresh-file lookup), composed with the governing deletes
    assert(Snapshots.scanPointAsOf(spark, t1, v2, "id", 7L)
      .select($"v").as[String].collect().toSeq == Seq("r7"))
    assert(Snapshots.scanPointAsOf(spark, t1, v2, "id", 100L)
      .select($"v").as[String].collect().toSeq == Seq("fresh"))
    assert(Snapshots.scanPointAsOf(spark, t1, v2, "id", 39L).isEmpty,
      "DV-deleted rows must stay deleted through the inherited sidecar")

    // an append onto a head NO stats generation describes refuses
    // before the commit publishes — the head must not move
    val t2 = freshTable()
    Snapshots.commit(spark, Seq((1L, "a")).toDF("k", "v"), t2,
      append = false)
    val headBefore = Snapshots.latestVersion(spark, t2)
    val e1 = intercept[IllegalArgumentException](
      Snapshots.commitClustered(spark, Seq((2L, "b")).toDF("k", "v"),
        t2, "k", numFiles = 1, append = true))
    assert(e1.getMessage.contains("before publishing"))
    val e2 = intercept[IllegalArgumentException](
      Snapshots.commitBloom(spark, Seq((3L, "c")).toDF("k", "v"),
        t2, "k", append = true))
    assert(e2.getMessage.contains("before publishing"))
    assert(Snapshots.latestVersion(spark, t2) == headBefore,
      "a pre-flight refusal must leave the table untouched")
  }

  test("3-key HILBERT layout: the same stats sidecar and box read " +
    "path prune a strict file subset on EACH single key, answers " +
    "exact — and optimizePreserving re-clusters it like any " +
    "stats-governed head") {
    val tbl = freshTable()
    val n = 4096
    val df = (0 until n).map { i =>
      (i.toLong, ((i * 37) % 64).toLong, ((i * 101) % 64).toLong,
        ((i * 13) % 64).toLong)
    }.toDF("row", "a", "b", "c")
    val v = Snapshots.commitHilbertN(spark, df, tbl,
      Seq("a", "b", "c"), numFiles = 16, append = false)
    def admitted(bounds: Seq[(String, Any, Any)]): Long = {
      val scan = Snapshots.scanBoxAsOfN(spark, tbl, v, bounds)
      scan.count()
      scan.inputFiles.length.toLong
    }
    Seq("a", "b", "c").foreach { k =>
      val files = admitted(Seq((k, 0L, 7L)))
      assert(files > 0L && files < 16L,
        s"single-key box on '$k' admitted $files of 16 files — no pruning")
    }
    val expect = df.filter($"b" <= 7L && $"c" <= 7L)
      .select($"row").as[Long].collect().sorted.toSeq
    val got = Snapshots.scanBoxAsOfN(spark, tbl, v,
      Seq(("b", 0L, 7L), ("c", 0L, 7L)))
      .select($"row").as[Long].collect().sorted.toSeq
    assert(got == expect, "Hilbert box scan must be exact")
    // the fleet sweep treats a Hilbert head like any stats-governed
    // one: re-cluster on the sidecar's own keys, skipping survives
    val v2 = Snapshots.optimizePreserving(spark, tbl, targetBytes = 4096L)
    val after = Snapshots.scanBoxAsOfN(spark, tbl, v2,
      Seq(("b", 0L, 7L), ("c", 0L, 7L)))
      .select($"row").as[Long].collect().sorted.toSeq
    assert(after == expect, "box scan broken after compaction")
  }

  test("3-key Z-order: scanBoxAsOfN prunes a strict file subset on " +
    "EACH single key and on subset boxes, with exact answers") {
    val tbl = freshTable()
    // three independent axes so no single sort order could serve all
    val n = 4096
    val df = (0 until n).map { i =>
      (i.toLong, ((i * 37) % 64).toLong, ((i * 101) % 64).toLong,
        ((i * 13) % 64).toLong)
    }.toDF("row", "a", "b", "c")
    val v = Snapshots.commitZorderedN(spark, df, tbl,
      Seq("a", "b", "c"), numFiles = 16, append = false)
    val total = Snapshots.manifest(spark, tbl)
      .filter(col("version") === v).count()
    assert(total == 16L, s"expected 16 files, got $total")
    def admitted(bounds: Seq[(String, Any, Any)]): Long = {
      val scan = Snapshots.scanBoxAsOfN(spark, tbl, v, bounds)
      scan.count() // force planning
      scan.inputFiles.length.toLong
    }
    // every SINGLE key prunes a strict subset — the N-D layout's point
    Seq("a", "b", "c").foreach { k =>
      val files = admitted(Seq((k, 0L, 7L)))
      assert(files > 0L && files < total,
        s"single-key box on '$k' admitted $files of $total files — " +
          "no pruning")
    }
    // a 2-of-3 subset box prunes at least as hard as its weaker key
    val two = admitted(Seq(("a", 0L, 7L), ("c", 0L, 7L)))
    assert(two > 0L && two < total)
    // exactness: the box answer equals the brute-force filter
    val expect = df.filter($"a" <= 7L && $"c" <= 7L)
      .select($"row").as[Long].collect().sorted.toSeq
    val got = Snapshots.scanBoxAsOfN(spark, tbl, v,
      Seq(("a", 0L, 7L), ("c", 0L, 7L)))
      .select($"row").as[Long].collect().sorted.toSeq
    assert(got == expect, "box scan must be exact, not just pruned")
    // appends carry the parent's stats rows; the widened sidecar keeps
    // serving all three keys
    val v2 = Snapshots.commitZorderedN(spark,
      Seq((9999L, 1L, 1L, 1L)).toDF("row", "a", "b", "c"),
      tbl, Seq("a", "b", "c"), numFiles = 1, append = true)
    val after = Snapshots.scanBoxAsOfN(spark, tbl, v2,
      Seq(("b", 1L, 1L)))
    assert(after.filter($"row" === 9999L).count() == 1L)
  }
}
