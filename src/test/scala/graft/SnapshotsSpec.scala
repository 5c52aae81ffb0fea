package graft

import java.nio.file.Files

import graft.operators.Snapshots

/** Snapshot lifecycle contracts: append-mode file sharing (the
  * O(delta) commit), replace semantics, time-travel isolation, vacuum
  * deleting exactly the expired files while the live snapshot reads
  * back untouched, and loud failures for expired/unknown versions. */
class SnapshotsSpec extends SparkSuite {
  import spark.implicits._

  private def freshTable(): String = {
    val p = Files.createTempDirectory("snap_spec_").toString + "/tbl"
    Snapshots.init(spark, p)
    p
  }

  private val rows0 = Seq((1L, "a"), (2L, "b")).toDF("id", "v")
  private val rows1 = Seq((3L, "c")).toDF("id", "v")

  test("versions mint 0,1,2…; append shares the parent's files, " +
    "replace references only its own") {
    val tbl = freshTable()
    assert(Snapshots.latestVersion(spark, tbl).isEmpty)
    val v0 = Snapshots.commit(spark, rows0, tbl, append = false)
    val v1 = Snapshots.commit(spark, rows1, tbl, append = true)
    val v2 = Snapshots.commit(spark, rows0, tbl, append = false)
    assert((v0, v1, v2) == (0L, 1L, 2L))
    val m = Snapshots.manifest(spark, tbl)
      .collect().map(r => (r.getLong(0), r.getString(1)))
    val files = (v: Long) => m.filter(_._1 == v).map(_._2).toSet
    assert(files(0L).subsetOf(files(1L)),
      "append-mode v1 must reference every v0 file (no data rewrite)")
    assert(files(1L).size > files(0L).size)
    assert(files(2L).intersect(files(1L)).isEmpty,
      "replace-mode v2 must share nothing with v1")
  }

  test("time travel: each version reads back exactly its committed rows") {
    val tbl = freshTable()
    Snapshots.commit(spark, rows0, tbl, append = false)
    Snapshots.commit(spark, rows1, tbl, append = true)
    Snapshots.commit(spark, rows1, tbl, append = false)
    def ids(v: Long) = Snapshots.readAsOf(spark, tbl, v)
      .select($"id").collect().map(_.getLong(0)).sorted.toSeq
    assert(ids(0L) == Seq(1L, 2L))
    assert(ids(1L) == Seq(1L, 2L, 3L))
    assert(ids(2L) == Seq(3L))
  }

  test("vacuum deletes exactly the files no retained version " +
    "references and the live snapshot is untouched") {
    val tbl = freshTable()
    Snapshots.commit(spark, rows0, tbl, append = false)
    Snapshots.commit(spark, rows1, tbl, append = true) // shares v0 files
    Snapshots.commit(spark, rows0, tbl, append = false)
    val before = Snapshots.manifest(spark, tbl)
      .select($"file").distinct().count()
    val deleted = Snapshots.vacuum(spark, tbl, keepFrom = 2L)
    // v0's files were shared by v1 — both expired, so they die; v2's live
    assert(deleted > 0)
    val after = Snapshots.manifest(spark, tbl)
      .select($"file").distinct().count()
    assert(after == before - deleted)
    assert(Snapshots.readAsOf(spark, tbl, 2L)
      .select($"id").collect().map(_.getLong(0)).sorted.toSeq ==
      Seq(1L, 2L))
    val e = intercept[IllegalArgumentException] {
      Snapshots.readAsOf(spark, tbl, 0L)
    }
    assert(e.getMessage.contains("expired"))
  }

  test("vacuum keeps shared files alive while ANY retained version " +
    "references them") {
    val tbl = freshTable()
    Snapshots.commit(spark, rows0, tbl, append = false)
    Snapshots.commit(spark, rows1, tbl, append = true)
    // keepFrom=1 retains v1, which references v0's files — nothing dies
    assert(Snapshots.vacuum(spark, tbl, keepFrom = 1L) == 0L)
    assert(Snapshots.readAsOf(spark, tbl, 1L).count() == 3L)
  }

  test("unknown version and empty-retention vacuum fail loudly") {
    val tbl = freshTable()
    Snapshots.commit(spark, rows0, tbl, append = false)
    intercept[IllegalArgumentException] {
      Snapshots.readAsOf(spark, tbl, 7L)
    }
    intercept[IllegalArgumentException] {
      Snapshots.vacuum(spark, tbl, keepFrom = 99L)
    }
  }

  test("commitClustered + scanRangeAsOf: per-version stats admit a " +
    "file subset (executed numFiles), append reuses parent stats, " +
    "vacuum expires the dropped version's stats") {
    val tbl = freshTable()
    val rows = (1 to 400).map(i => (i.toLong, s"p$i")).toDF("k", "v")
    val v0 = Snapshots.commitClustered(spark, rows.filter($"k" <= 200),
      tbl, keyCol = "k", numFiles = 8, append = false)
    val v1 = Snapshots.commitClustered(spark, rows.filter($"k" > 200),
      tbl, keyCol = "k", numFiles = 8, append = true)
    // append-mode stats = parent's 8 rows + 8 fresh rows, no rescan of
    // parent data possible (rows are per FILE)
    assert(spark.read.parquet(s"$tbl/_stats/v$v0").count() == 8L)
    assert(spark.read.parquet(s"$tbl/_stats/v$v1").count() == 16L)
    val scan = Snapshots.scanRangeAsOf(spark, tbl, v1, "k", 50L, 60L)
    // execute THIS dataset's plan — a derived .select() would build a
    // separate QueryExecution whose metrics this one never sees
    assert(scan.collect().map(_.getLong(0)).sorted.toSeq == (50L to 60L))
    val scanFiles = scan.queryExecution.executedPlan.collectLeaves()
      .flatMap(_.metrics.get("numFiles")).map(_.value).sum
    assert(scanFiles > 0 && scanFiles < 16,
      s"range scan read $scanFiles of 16 files — no stats pruning")
    // time travel composes: v0's snapshot ends at 200
    assert(Snapshots.scanRangeAsOf(spark, tbl, v0, "k", 150L, 250L)
      .select($"k").as[Long].collect().sorted.toSeq == (150L to 200L))
    // a selective miss is an empty answer, not an error
    assert(Snapshots.scanRangeAsOf(spark, tbl, v1, "k", 5000L, 6000L)
      .count() == 0L)
    // vacuum: v1 still references v0's data files (they survive) but
    // v0's STATS manifest expires with its generation
    Snapshots.vacuum(spark, tbl, keepFrom = v1)
    val e = intercept[IllegalArgumentException] {
      Snapshots.scanRangeAsOf(spark, tbl, v0, "k", 1L, 2L)
    }
    assert(e.getMessage.contains("stats manifest"))
    assert(Snapshots.scanRangeAsOf(spark, tbl, v1, "k", 50L, 60L)
      .count() == 11L)
  }

  test("optimize: rewrites the latest snapshot as a replace version " +
    "with fewer files and identical rows; older versions untouched " +
    "until vacuum") {
    val tbl = freshTable()
    val rows = (1 to 300).map(i => (i.toLong, s"p$i")).toDF("k", "v")
    Snapshots.commit(spark, rows.filter($"k" <= 150).repartition(6),
      tbl, append = false)
    Snapshots.commit(spark, rows.filter($"k" > 150).repartition(6),
      tbl, append = true)
    val before = Snapshots.readAsOf(spark, tbl, 1L).inputFiles.length
    assert(before == 12)
    val v = Snapshots.optimize(spark, tbl, targetBytes = 1L << 26)
    assert(v == 2L)
    val opt = Snapshots.readAsOf(spark, tbl, v)
    assert(opt.inputFiles.length < before)
    assert(opt.select($"k").as[Long].collect().sorted.toSeq
      == (1L to 300L))
    // pre-vacuum, the small-file version still reads
    assert(Snapshots.readAsOf(spark, tbl, 1L).count() == 300L)
    // post-vacuum the 12 small files die; the optimized version lives
    assert(Snapshots.vacuum(spark, tbl, keepFrom = v) == 12L)
    assert(Snapshots.readAsOf(spark, tbl, v).count() == 300L)
    intercept[IllegalArgumentException] {
      Snapshots.optimize(spark, s"$tbl-empty", 1L)
    }
  }

  test("commitPartitioned: manifest rows carry the partition fragment, " +
    "readAsOf rebuilds the partition column, append shares parent files") {
    val tbl = freshTable()
    val day0 = Seq((1L, "a", "d1"), (2L, "b", "d1"), (3L, "c", "d2"))
      .toDF("id", "v", "day")
    val day1 = Seq((4L, "d", "d3")).toDF("id", "v", "day")
    val v0 = Snapshots.commitPartitioned(spark, day0, tbl, "day", append = false)
    val v1 = Snapshots.commitPartitioned(spark, day1, tbl, "day", append = true)
    val m = Snapshots.manifest(spark, tbl)
      .collect().map(r => (r.getLong(0), r.getString(1), r.getString(2)))
    assert(m.forall(_._3 != null), "every partitioned row carries its fragment")
    assert(m.filter(_._1 == v0).map(_._3).toSet == Set("day=d1", "day=d2"))
    assert(m.filter(_._1 == v1).map(_._3).toSet ==
      Set("day=d1", "day=d2", "day=d3"), "append inherits parent fragments")
    // file-level: every file lives under its fragment's directory
    assert(m.forall { case (_, f, p) => f.contains(s"/$p/") })
    def rows(v: Long) = Snapshots.readAsOf(spark, tbl, v)
      .select($"id", $"day").as[(Long, String)].collect().sorted.toSeq
    assert(rows(v0) == Seq((1L, "d1"), (2L, "d1"), (3L, "d2")))
    assert(rows(v1) == Seq((1L, "d1"), (2L, "d1"), (3L, "d2"), (4L, "d3")))
  }

  test("scanPartitionAsOf: only the requested partition's files are " +
    "planned at a PAST version; missing partition is an empty answer") {
    val tbl = freshTable()
    val v0 = Snapshots.commitPartitioned(spark,
      Seq((1L, "d1"), (2L, "d2")).toDF("id", "day"), tbl, "day",
      append = false)
    // v1 rewrites d1 and adds d3 — a replace commit, so reading AS OF
    // v0 below must hit v0's directories, not v1's
    val v1 = Snapshots.commitPartitioned(spark,
      Seq((10L, "d1"), (30L, "d3")).toDF("id", "day"), tbl, "day",
      append = false)
    val scan = Snapshots.scanPartitionAsOf(spark, tbl, v0, "day", "d1")
    assert(scan.select($"id").as[Long].collect().toSeq == Seq(1L))
    // the skip contract, pinned at the plan level: every input file of
    // the scan sits under v0's day=d1 directory — the untouched d2
    // partition and all of v1 never enter the plan
    val inputs = scan.inputFiles.toSeq
    assert(inputs.nonEmpty &&
      inputs.forall(f => f.contains("/v0/") && f.contains("/day=d1/")),
      s"scan planned beyond v0/day=d1: $inputs")
    assert(Snapshots.scanPartitionAsOf(spark, tbl, v1, "day", "d2").isEmpty,
      "a partition absent from the version is an empty answer")
    assert(Snapshots.scanPartitionAsOf(spark, tbl, v1, "day", "d1")
      .select($"id").as[Long].collect().toSeq == Seq(10L))
    val e = intercept[IllegalArgumentException](
      Snapshots.scanPartitionAsOf(spark, tbl, 99L, "day", "d1"))
    assert(e.getMessage.contains("not in the manifest"))
  }

  test("commit CAS: two interleaved committers both survive, on " +
    "distinct versions with distinct file sets") {
    val tbl = freshTable()
    Snapshots.commit(spark, rows0, tbl, append = false)
    import java.util.concurrent.{CountDownLatch, Executors, TimeUnit}
    val pool = Executors.newFixedThreadPool(2)
    val gate = new CountDownLatch(1)
    def racer(tag: String) = pool.submit(
      new java.util.concurrent.Callable[Long] {
        def call(): Long = {
          gate.await(10, TimeUnit.SECONDS)
          // both racers observed latest = 0 before either publishes —
          // the exact read-latest-then-write race the CAS must close
          Snapshots.commit(spark,
            Seq((99L, tag)).toDF("id", "v"), tbl, append = false)
        }
      })
    val (fa, fb) = (racer("a"), racer("b"))
    gate.countDown()
    val (va, vb) = (fa.get(120, TimeUnit.SECONDS), fb.get(120, TimeUnit.SECONDS))
    pool.shutdown()
    assert(va != vb, s"racing committers minted the same version $va")
    assert(Set(va, vb).subsetOf(Set(1L, 2L)))
    // both snapshots read back their own single row — no silent merge
    def vs(v: Long) = Snapshots.readAsOf(spark, tbl, v)
      .select($"v").as[String].collect().toSeq
    assert((vs(va) ++ vs(vb)).sorted == Seq("a", "b"))
    assert(Snapshots.latestVersion(spark, tbl).contains(math.max(va, vb)))
  }

  test("vacuum swap recovery: a crash between the renames (live " +
    "missing, staged complete) rolls forward on the next read") {
    val tbl = freshTable()
    Snapshots.commit(spark, rows0, tbl, append = false)
    Snapshots.commit(spark, rows1, tbl, append = false)
    // reproduce the crash window by hand: move the live manifest to the
    // staged name — exactly the state after "rename live aside" if the
    // process died before installing the staged copy (staged is always
    // complete by then; here the old live plays that role)
    val fs = new org.apache.hadoop.fs.Path(tbl)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    assert(fs.rename(new org.apache.hadoop.fs.Path(s"$tbl/_versions"),
      new org.apache.hadoop.fs.Path(s"$tbl/_versions_staged")))
    // next manifest read recovers: some manifest always exists
    assert(Snapshots.latestVersion(spark, tbl).contains(1L))
    assert(Snapshots.readAsOf(spark, tbl, 1L)
      .select($"id").as[Long].collect().toSeq == Seq(3L))
    assert(!fs.exists(new org.apache.hadoop.fs.Path(s"$tbl/_versions_staged")))
  }

  test("schema evolution: an append commit with a NEW column reads back " +
    "merged — parent rows null-fill, past versions keep the old schema") {
    val tbl = freshTable()
    val v0 = Snapshots.commit(spark, rows0, tbl, append = false)
    val v1 = Snapshots.commit(spark,
      Seq((3L, "c", 9L)).toDF("id", "v", "w"), tbl, append = true)
    val at1 = Snapshots.readAsOf(spark, tbl, v1)
    assert(at1.columns.sorted.toSeq == Seq("id", "v", "w"))
    val rows = at1.select($"id", $"w").collect()
      .map(r => (r.getLong(0), if (r.isNullAt(1)) None else Some(r.getLong(1))))
      .sortBy(_._1).toSeq
    assert(rows == Seq((1L, None), (2L, None), (3L, Some(9L))),
      "evolved column must null-fill the parent generation's rows")
    // time travel is schema travel too: v0 predates the column
    assert(Snapshots.readAsOf(spark, tbl, v0).columns.sorted.toSeq ==
      Seq("id", "v"))
    // the schema rides the MANIFEST, not the footers: each generation
    // stores its full read schema, and readAsOf plans from it — an
    // O(1) metadata fetch instead of O(files of v) footer merges
    val s0 = Snapshots.storedSchema(spark, tbl, v0)
    val s1 = Snapshots.storedSchema(spark, tbl, v1)
    assert(s0.isDefined && s1.isDefined,
      "every generation must persist its schema in the manifest")
    assert(s0.get.fieldNames.sorted.toSeq == Seq("id", "v"))
    assert(s1.get.fieldNames.toSeq == Seq("id", "v", "w"),
      "append evolution: parent columns keep their position, new " +
        "columns join at the end")
    assert(at1.schema == s1.get,
      "readAsOf must surface exactly the manifest-carried schema")
  }

  test("append cannot retype an existing column — refused loudly") {
    val tbl = freshTable()
    Snapshots.commit(spark, rows0, tbl, append = false)
    val retyped = Seq((4L, 7L)).toDF("id", "v") // v was string
    val ex = intercept[IllegalArgumentException] {
      Snapshots.commit(spark, retyped, tbl, append = true)
    }
    assert(ex.getMessage.contains("cannot change column"))
  }

  test("mergePartitioned: touched partitions rewrite (update wins, " +
    "inserts land), untouched partitions' FILES carry over as pointers") {
    val tbl = freshTable()
    val v0 = Snapshots.commitPartitioned(spark,
      Seq((1L, "a", "d1"), (2L, "b", "d1"), (3L, "c", "d2"),
        (4L, "d", "d3")).toDF("id", "v", "day"),
      tbl, "day", append = false)
    // update id 1 in d1, insert id 9 into d1, open new partition d4;
    // d2 and d3 are untouched
    val v1 = Snapshots.mergePartitioned(spark, tbl,
      Seq((1L, "A", "d1"), (9L, "i", "d1"), (8L, "n", "d4"))
        .toDF("id", "v", "day"),
      keyCols = Seq("id"), partCol = "day")
    val rows = Snapshots.readAsOf(spark, tbl, v1)
      .select($"id", $"v", $"day").as[(Long, String, String)]
      .collect().sorted.toSeq
    assert(rows == Seq((1L, "A", "d1"), (2L, "b", "d1"), (3L, "c", "d2"),
      (4L, "d", "d3"), (8L, "n", "d4"), (9L, "i", "d1")))
    // file-level: d2/d3 rows in v1's manifest are v0's files verbatim
    val m = Snapshots.manifest(spark, tbl)
      .collect().map(r => (r.getLong(0), r.getString(1), r.getString(2)))
    def files(v: Long, frag: String) =
      m.filter(r => r._1 == v && r._3 == frag).map(_._2).toSet
    assert(files(v1, "day=d2") == files(v0, "day=d2") &&
      files(v1, "day=d3") == files(v0, "day=d3"),
      "untouched partitions must carry the parent's files, not copies")
    assert(files(v1, "day=d1").intersect(files(v0, "day=d1")).isEmpty,
      "touched partition must be rewritten under the new version")
    // past version unchanged
    assert(Snapshots.readAsOf(spark, tbl, v0)
      .filter($"id" === 1L).select($"v").as[String].head() == "a")
  }

  test("mergePartitioned with an op column: deletes evict without " +
    "re-inserting, unknown verbs refuse, untouched files still reuse") {
    val tbl = freshTable()
    val v0 = Snapshots.commitPartitioned(spark,
      Seq((1L, "a", "d1"), (2L, "b", "d1"), (3L, "c", "d2"),
        (4L, "d", "d3")).toDF("id", "v", "day"),
      tbl, "day", append = false)
    // delete id 2 (d1), upsert id 1 (d1); d2/d3 untouched
    val v1 = Snapshots.mergePartitioned(spark, tbl,
      Seq((1L, "A", "d1", "upsert"), (2L, "b", "d1", "delete"))
        .toDF("id", "v", "day", "op"),
      keyCols = Seq("id"), partCol = "day", opCol = Some("op"))
    val rows = Snapshots.readAsOf(spark, tbl, v1)
      .select($"id", $"v", $"day").as[(Long, String, String)]
      .collect().sorted.toSeq
    assert(rows == Seq((1L, "A", "d1"), (3L, "c", "d2"), (4L, "d", "d3")),
      "delete must evict its key; the op column must not leak into the table")
    assert(!Snapshots.readAsOf(spark, tbl, v1).columns.contains("op"))
    val m = Snapshots.manifest(spark, tbl)
      .collect().map(r => (r.getLong(0), r.getString(1), r.getString(2)))
    def files(v: Long, frag: String) =
      m.filter(r => r._1 == v && r._3 == frag).map(_._2).toSet
    assert(files(v1, "day=d2") == files(v0, "day=d2") &&
      files(v1, "day=d3") == files(v0, "day=d3"),
      "untouched partitions must still carry over as pointers")
    // past version keeps the deleted row
    assert(Snapshots.readAsOf(spark, tbl, v0).count() == 4L)
    val ex = intercept[IllegalArgumentException] {
      Snapshots.mergePartitioned(spark, tbl,
        Seq((9L, "x", "d1", "detele")).toDF("id", "v", "day", "op"),
        keyCols = Seq("id"), partCol = "day", opCol = Some("op"))
    }
    assert(ex.getMessage.contains("unknown verb"))
  }

  test("flat-table merge: upserts replace-or-insert, deletes evict, " +
    "committed as a replace version; history untouched") {
    val tbl = freshTable()
    val v0 = Snapshots.commit(spark, rows0, tbl, append = false) // (1,a) (2,b)
    val v1 = Snapshots.merge(spark, tbl,
      Seq((1L, "A", "upsert"), (2L, "b", "delete"), (5L, "e", "upsert"))
        .toDF("id", "v", "op"),
      keyCols = Seq("id"), opCol = Some("op"))
    val rows = Snapshots.readAsOf(spark, tbl, v1)
      .select($"id", $"v").as[(Long, String)].collect().sorted.toSeq
    assert(rows == Seq((1L, "A"), (5L, "e")))
    assert(Snapshots.readAsOf(spark, tbl, v0)
      .select($"id", $"v").as[(Long, String)].collect().sorted.toSeq ==
      Seq((1L, "a"), (2L, "b")), "older versions read back unchanged")
    // without an op column every row is an upsert (the q33 behavior)
    val v2 = Snapshots.merge(spark, tbl,
      Seq((5L, "E")).toDF("id", "v"), keyCols = Seq("id"))
    assert(Snapshots.readAsOf(spark, tbl, v2)
      .select($"id", $"v").as[(Long, String)].collect().sorted.toSeq ==
      Seq((1L, "A"), (5L, "E")))
  }

  test("append after a crashed claim (version gap) still carries the " +
    "full parent lineage") {
    val tbl = freshTable()
    Snapshots.commit(spark, rows0, tbl, append = false) // v0
    // a committer that claimed v1 and died before publishing: the
    // marker exists, no manifest generation does
    assert(new java.io.File(s"$tbl/_commits/v1").createNewFile())
    val v = Snapshots.commit(spark, rows1, tbl, append = true)
    assert(v == 2L, "the claim must skip the crashed number")
    val ids = Snapshots.readAsOf(spark, tbl, v)
      .select($"id").as[Long].collect().sorted.toSeq
    assert(ids == Seq(1L, 2L, 3L),
      "the append's parent must be the latest PUBLISHED version (v0), " +
        "not the numeric predecessor v1 — a gap must never truncate " +
        "the table history")
    intercept[Exception](Snapshots.readAsOf(spark, tbl, 1L).collect())
  }

  test("partition values with hive-special characters round-trip " +
    "through scanPartitionAsOf and mergePartitioned") {
    val tbl = freshTable()
    val v0 = Snapshots.commitPartitioned(spark,
      Seq((1L, "x", "k=1:a"), (2L, "y", "k=1:a"), (3L, "z", "plain"))
        .toDF("id", "v", "part"),
      tbl, "part", append = false)
    // the writer escapes '=' and ':' into the directory name; a lookup
    // that compares the raw value would match nothing
    val scanned = Snapshots.scanPartitionAsOf(spark, tbl, v0, "part", "k=1:a")
    assert(scanned.select($"id").as[Long].collect().sorted.toSeq ==
      Seq(1L, 2L))
    val v1 = Snapshots.mergePartitioned(spark, tbl,
      Seq((2L, "Y", "k=1:a")).toDF("id", "v", "part"),
      keyCols = Seq("id"), partCol = "part")
    val after = Snapshots.readAsOf(spark, tbl, v1)
      .select($"id", $"v").as[(Long, String)].collect().sorted.toSeq
    assert(after == Seq((1L, "x"), (2L, "Y"), (3L, "z")),
      "the merge must rewrite the escaped partition, not leave the " +
        "stale row beside the update")
  }

  test("optimizePartitioned: one file per partition after appends, " +
    "identical rows, pruning survives, old versions untouched") {
    val tbl = freshTable()
    (0 until 3).foreach { i =>
      Snapshots.commitPartitioned(spark,
        Seq((i * 10L + 1L, s"a$i", "d1"), (i * 10L + 2L, s"b$i", "d2"))
          .toDF("id", "v", "day"),
        tbl, "day", append = i > 0)
    }
    val before = Snapshots.latestVersion(spark, tbl).get
    def filesPerPart(v: Long): Map[String, Int] =
      Snapshots.manifest(spark, tbl)
        .filter($"version" === v)
        .collect().map(r => r.getString(2)).groupBy(identity)
        .map { case (k, vs) => k -> vs.length }
    assert(filesPerPart(before).values.forall(_ >= 3),
      "fixture must start with several files per partition")
    val v = Snapshots.optimizePartitioned(spark, tbl, "day")
    assert(filesPerPart(v) == Map("day=d1" -> 1, "day=d2" -> 1),
      "each partition must compact to one file, fragments kept")
    val rows = Snapshots.readAsOf(spark, tbl, v)
      .select($"id", $"v", $"day").as[(Long, String, String)]
      .collect().sorted.toSeq
    assert(rows == Seq((1L, "a0", "d1"), (2L, "b0", "d2"),
      (11L, "a1", "d1"), (12L, "b1", "d2"),
      (21L, "a2", "d1"), (22L, "b2", "d2")))
    // pruning still answers from the manifest
    assert(Snapshots.scanPartitionAsOf(spark, tbl, v, "day", "d2")
      .select($"id").as[Long].collect().sorted.toSeq == Seq(2L, 12L, 22L))
    assert(Snapshots.readAsOf(spark, tbl, before).count() == 6L)
    // flat tables refuse
    val flat = freshTable()
    Snapshots.commit(spark, rows0, flat, append = false)
    intercept[IllegalArgumentException] {
      Snapshots.optimizePartitioned(spark, flat, "day")
    }
  }

  test("removeOrphans: a crashed publish's unreferenced files die, " +
    "fresh files inside the safety window and referenced files survive") {
    val tbl = freshTable()
    Snapshots.commit(spark, rows0, tbl, append = false)
    // a committer that claimed v1, wrote data, and died before publish
    assert(new java.io.File(s"$tbl/_commits/v1").createNewFile())
    rows1.write.parquet(s"$tbl/data/v1")
    // raw java.io listing sees the local FS's hidden .crc sidecars the
    // Hadoop ChecksumFileSystem filters; count only real data files
    val orphanCount = new java.io.File(s"$tbl/data/v1").listFiles()
      .count(f => f.isFile && !f.getName.startsWith("_") &&
        !f.getName.startsWith("."))
    assert(orphanCount > 0)
    // inside the safety window: a racer could still be publishing
    assert(Snapshots.removeOrphans(spark, tbl, olderThanMs = 3600000L) == 0L)
    // past the window: exactly the orphans die, the table is untouched
    assert(Snapshots.removeOrphans(spark, tbl, olderThanMs = 0L) ==
      orphanCount.toLong)
    assert(Snapshots.readAsOf(spark, tbl, 0L)
      .select($"id").as[Long].collect().sorted.toSeq == Seq(1L, 2L))
    assert(Snapshots.removeOrphans(spark, tbl, olderThanMs = 0L) == 0L,
      "a second pass must find nothing")
  }

  test("rollback: the new head is pointers to the target's files — " +
    "no data file written, content restores, the botch stays AS OF-" +
    "readable, vacuum keeps the re-referenced files") {
    val tbl = freshTable()
    val v0 = Snapshots.commit(spark, rows0, tbl, append = false)
    val v1 = Snapshots.commit(spark, rows1, tbl, append = false)
    def dataFiles(): Set[String] = {
      def walk(f: java.io.File): Seq[java.io.File] =
        if (f.isDirectory) f.listFiles().toSeq.flatMap(walk) else Seq(f)
      walk(new java.io.File(s"$tbl/data"))
        .filter(f => !f.getName.startsWith("_") && !f.getName.startsWith("."))
        .map(_.getPath).toSet
    }
    val physical = dataFiles()
    val v2 = Snapshots.rollback(spark, tbl, v0)
    assert(v2 == 2L)
    assert(dataFiles() == physical,
      "rollback must be metadata-only: not one data file written")
    val m = Snapshots.manifest(spark, tbl).collect()
      .map(r => (r.getLong(0), r.getString(1)))
    def files(v: Long) = m.filter(_._1 == v).map(_._2).toSet
    assert(files(v2) == files(v0),
      "the restored head must be POINTERS to the target's files")
    assert(Snapshots.readAsOf(spark, tbl, v2)
      .select($"id").as[Long].collect().sorted.toSeq == Seq(1L, 2L))
    assert(Snapshots.readAsOf(spark, tbl, v1)
      .select($"id").as[Long].collect().toSeq == Seq(3L),
      "the rolled-back botch must stay readable for the post-mortem")
    assert(Snapshots.latestVersion(spark, tbl).contains(v2))
    // the head references v0's files, so vacuum reclaims exactly the
    // botched commit's files while the restored content survives
    val botched = files(v1)
    assert(Snapshots.vacuum(spark, tbl, keepFrom = v2) == botched.size.toLong)
    assert(Snapshots.readAsOf(spark, tbl, v2)
      .select($"id").as[Long].collect().sorted.toSeq == Seq(1L, 2L))
    intercept[IllegalArgumentException](Snapshots.rollback(spark, tbl, 77L))
  }

  test("rollback carries partition fragments and schema — pruned scans " +
    "work on the restored head") {
    val tbl = freshTable()
    val v0 = Snapshots.commitPartitioned(spark,
      Seq((1L, "a", "d1"), (2L, "b", "d2")).toDF("id", "v", "day"),
      tbl, "day", append = false)
    Snapshots.commitPartitioned(spark,
      Seq((9L, "x", "d1")).toDF("id", "v", "day"), tbl, "day",
      append = false)
    val v2 = Snapshots.rollback(spark, tbl, v0)
    val scan = Snapshots.scanPartitionAsOf(spark, tbl, v2, "day", "d2")
    assert(scan.select($"id").as[Long].collect().toSeq == Seq(2L))
    assert(scan.inputFiles.forall(_.contains("/day=d2/")),
      "partition pruning must survive the rollback")
    assert(Snapshots.storedSchema(spark, tbl, v2).isDefined &&
      Snapshots.storedSchema(spark, tbl, v2) ==
        Snapshots.storedSchema(spark, tbl, v0),
      "the restored head must carry the target's manifest schema")
  }

  test("countAsOf and tableStats answer from the manifest alone — " +
    "correct with the data directory hidden entirely") {
    val tbl = freshTable()
    val v0 = Snapshots.commitPartitioned(spark,
      Seq((1L, "a", "d1"), (2L, "b", "d1"), (3L, "c", "d2"))
        .toDF("id", "v", "day"),
      tbl, "day", append = false)
    val v1 = Snapshots.commitPartitioned(spark,
      Seq((4L, "d", "d2")).toDF("id", "v", "day"), tbl, "day",
      append = true)
    // hide every data file: a metadata-only answer must not notice
    val dataDir = new java.io.File(s"$tbl/data")
    val hidden = new java.io.File(s"$tbl/data_hidden")
    assert(dataDir.renameTo(hidden))
    try {
      assert(Snapshots.countAsOf(spark, tbl, v0) == 3L)
      assert(Snapshots.countAsOf(spark, tbl, v1) == 4L)
      val stats = Snapshots.tableStats(spark, tbl)
        .select($"version", $"part", $"n_files", $"n_rows")
        .collect()
        .map(r => ((r.getLong(0), r.getString(1)), (r.getLong(2), r.getLong(3))))
        .toMap
      assert(stats.keySet == Set((v0, "day=d1"), (v0, "day=d2"),
        (v1, "day=d1"), (v1, "day=d2")))
      assert(stats.values.forall(_._1 >= 1L), "file counts are positive")
      assert(stats((v0, "day=d1"))._2 == 2L)
      assert(stats((v0, "day=d2"))._2 == 1L)
      assert(stats((v1, "day=d1"))._2 == 2L,
        "append shares the parent partition's files AND counts")
      assert(stats((v1, "day=d2"))._2 == 2L)
    } finally assert(hidden.renameTo(dataDir))
    intercept[IllegalArgumentException](Snapshots.countAsOf(spark, tbl, 9L))
  }

  test("legacy manifests without footer counts refuse count/stats " +
    "loudly instead of undercounting") {
    val tbl = freshTable()
    Snapshots.commit(spark, rows0, tbl, append = false)
    // simulate a pre-row-count layout: rewrite the live manifest
    // without the rows column (the normalizer will null-fill it),
    // keeping the canonical gen-v<N>.parquet name the version-bounded
    // reads index by
    val legacy = Snapshots.manifest(spark, tbl).drop("rows")
    val fs = new org.apache.hadoop.fs.Path(tbl)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    val tmp = s"$tbl/_versions_legacy_tmp"
    legacy.coalesce(1).write.parquet(tmp)
    val part = new java.io.File(tmp).listFiles
      .filter(f => f.isFile && f.getName.endsWith(".parquet")).head
    assert(fs.delete(new org.apache.hadoop.fs.Path(s"$tbl/_versions"), true))
    assert(fs.mkdirs(new org.apache.hadoop.fs.Path(s"$tbl/_versions")))
    assert(fs.rename(new org.apache.hadoop.fs.Path(part.getAbsolutePath),
      new org.apache.hadoop.fs.Path(s"$tbl/_versions/gen-v0.parquet")))
    assert(fs.delete(new org.apache.hadoop.fs.Path(tmp), true))
    val e = intercept[IllegalArgumentException](
      Snapshots.countAsOf(spark, tbl, 0L))
    assert(e.getMessage.contains("row-count"))
    intercept[IllegalArgumentException](Snapshots.tableStats(spark, tbl))
    // the data itself still reads — only the metadata shortcut refuses
    assert(Snapshots.readAsOf(spark, tbl, 0L).count() == 2L)
  }

  test("readAppendsBetween plans only the delta's files; a replace in " +
    "the interval refuses; same-version is the empty delta") {
    val tbl = freshTable()
    val v0 = Snapshots.commit(spark, rows0, tbl, append = false)
    Snapshots.commit(spark, rows1, tbl, append = true)
    val v2 = Snapshots.commit(spark, Seq((4L, "d")).toDF("id", "v"),
      tbl, append = true)
    val delta = Snapshots.readAppendsBetween(spark, tbl, v0, v2)
    assert(delta.select($"id").as[Long].collect().sorted.toSeq ==
      Seq(3L, 4L))
    assert(delta.inputFiles.nonEmpty && delta.inputFiles.forall(f =>
      f.contains("/data/v1/") || f.contains("/data/v2/")),
      "the incremental scan must plan ONLY the delta commits' files")
    val empty = Snapshots.readAppendsBetween(spark, tbl, v2, v2)
    assert(empty.count() == 0L &&
      empty.columns.toSeq == Seq("id", "v"),
      "same-version delta is empty WITH the snapshot's schema")
    val v3 = Snapshots.commit(spark, rows1, tbl, append = false)
    val e = intercept[IllegalArgumentException](
      Snapshots.readAppendsBetween(spark, tbl, v2, v3))
    assert(e.getMessage.contains("append lineage"))
    intercept[IllegalArgumentException](
      Snapshots.readAppendsBetween(spark, tbl, 77L, v3))
  }

  test("commitAudited: write-audit-publish — a refused batch leaves no " +
    "trace, the clean batch passes the same gate and publishes") {
    val tbl = freshTable()
    val v0 = Snapshots.commit(spark, rows0, tbl, append = false)
    def dataFiles(): Set[String] = {
      def walk(f: java.io.File): Seq[java.io.File] =
        if (f.isDirectory) f.listFiles().toSeq.flatMap(walk) else Seq(f)
      walk(new java.io.File(s"$tbl/data"))
        .filter(f => !f.getName.startsWith("_") && !f.getName.startsWith("."))
        .map(_.getPath).toSet
    }
    val before = dataFiles()
    val gate: org.apache.spark.sql.DataFrame => org.apache.spark.sql.DataFrame =
      f => graft.operators.Stats.expectRows(f,
        Seq("positive_id" -> ($"id" <= 0)))
    val refused = Snapshots.commitAudited(spark,
      Seq((-5L, "bad"), (6L, "ok")).toDF("id", "v"), tbl, gate,
      append = true)
    assert(refused.isLeft)
    val report = refused.swap.getOrElse(Seq.empty)
    assert(report.exists(r => r.getAs[String]("rule") == "positive_id" &&
      r.getAs[Long]("n_violations") == 1L),
      "the refusal must carry the audit report")
    assert(dataFiles() == before,
      "the refused batch's staged files must be deleted — never visible")
    assert(Snapshots.latestVersion(spark, tbl).contains(v0),
      "a refused commit must not advance the table")
    val accepted = Snapshots.commitAudited(spark,
      Seq((7L, "ok")).toDF("id", "v"), tbl, gate, append = true)
    val v = accepted.getOrElse(fail("the clean batch must publish"))
    assert(v == v0 + 2L,
      "the refusal's claimed version stays burned — a benign gap")
    assert(Snapshots.readAsOf(spark, tbl, v)
      .select($"id").as[Long].collect().sorted.toSeq == Seq(1L, 2L, 7L))
  }

  test("versionAt/readAsOfTimestamp: latest-commit-at-or-before " +
    "resolution, boundary inclusive, loud on pre-history, mixed and " +
    "empty tables; vacuum preserves the timeline") {
    val tbl = freshTable()
    intercept[IllegalArgumentException](Snapshots.versionAt(spark, tbl, 5L))
    val v0 = Snapshots.commit(spark, rows0, tbl, append = false,
      ts = Some(100L))
    val v1 = Snapshots.commit(spark, rows1, tbl, append = true,
      ts = Some(200L))
    val v2 = Snapshots.commit(spark, rows0, tbl, append = false,
      ts = Some(300L))
    assert(Snapshots.versionAt(spark, tbl, 100L) == v0,
      "a ts equal to a commit stamp resolves to THAT commit")
    assert(Snapshots.versionAt(spark, tbl, 250L) == v1)
    assert(Snapshots.versionAt(spark, tbl, 999L) == v2)
    assert(Snapshots.readAsOfTimestamp(spark, tbl, 250L)
      .select($"id").as[Long].collect().sorted.toSeq == Seq(1L, 2L, 3L))
    val e = intercept[IllegalArgumentException](
      Snapshots.versionAt(spark, tbl, 99L))
    assert(e.getMessage.contains("at or before"))
    // vacuum must carry the timeline through its manifest rewrite
    Snapshots.vacuum(spark, tbl, keepFrom = v1)
    assert(Snapshots.versionAt(spark, tbl, 250L) == v1)
    // a generation without a stamp poisons resolution loudly — never
    // silently falls out of the timeline
    Snapshots.commit(spark, rows1, tbl, append = true)
    val m = intercept[IllegalArgumentException](
      Snapshots.versionAt(spark, tbl, 999L))
    assert(m.getMessage.contains("commit_ts"))
  }

  test("purgeKeys erases the subject from EVERY retained version, " +
    "file-granular: clean files keep their paths, hit files die, " +
    "counts refresh, a second purge finds nothing") {
    val tbl = freshTable()
    val a = Seq((1L, 10L, "x"), (2L, 20L, "y")).toDF("id", "uid", "v")
    val b = Seq((3L, 10L, "z"), (4L, 30L, "w")).toDF("id", "uid", "v")
    val v0 = Snapshots.commit(spark, a, tbl, append = false)
    val v1 = Snapshots.commit(spark, b, tbl, append = true)
    def manifestFiles(): Set[String] = Snapshots.manifest(spark, tbl)
      .select($"file").distinct().as[String].collect().toSet
    val before = manifestFiles()
    val purged = Snapshots.purgeKeys(spark, tbl,
      Seq(10L).toDF("uid"), Seq("uid"))
    assert(purged == 2L)
    def ids(v: Long) = Snapshots.readAsOf(spark, tbl, v)
      .select($"id").as[Long].collect().sorted.toSeq
    assert(ids(v0) == Seq(2L), "v0 must be rewritten, not just the head")
    assert(ids(v1) == Seq(2L, 4L))
    assert(Snapshots.countAsOf(spark, tbl, v0) == 1L &&
      Snapshots.countAsOf(spark, tbl, v1) == 2L,
      "manifest row counts must refresh from the rewritten footers")
    val after = manifestFiles()
    val gone = before -- after
    val fresh = after -- before
    assert(gone.nonEmpty && fresh.nonEmpty)
    assert((before intersect after).nonEmpty,
      "files without a hit must keep their byte-identical paths")
    val hfs = new org.apache.hadoop.fs.Path(tbl)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    gone.foreach(p => assert(
      !hfs.exists(new org.apache.hadoop.fs.Path(p)),
      s"purged file $p must not remain on disk"))
    // the purged subject is unreadable from ANY surface
    Seq(v0, v1).foreach(v =>
      assert(Snapshots.readAsOf(spark, tbl, v)
        .filter($"uid" === 10L).count() == 0L))
    // idempotent: a second purge of the same subject rewrites nothing
    val m2 = manifestFiles()
    assert(Snapshots.purgeKeys(spark, tbl,
      Seq(10L).toDF("uid"), Seq("uid")) == 0L)
    assert(manifestFiles() == m2)
  }

  test("purgeKeys repoints clustered stats manifests — scanRangeAsOf " +
    "still prunes and never plans a deleted file") {
    val tbl = freshTable()
    val df = (1L to 40L).map(i => (i, i * 10L, s"r$i")).toDF("k", "uid", "v")
    val v0 = Snapshots.commitClustered(spark, df, tbl, "k",
      numFiles = 4, append = false)
    // purge uid 150 (k = 15) — lives in one clustered file
    assert(Snapshots.purgeKeys(spark, tbl,
      Seq(150L).toDF("uid"), Seq("uid")) == 1L)
    val scan = Snapshots.scanRangeAsOf(spark, tbl, v0, "k", 11L, 20L)
    assert(scan.select($"k").as[Long].collect().sorted.toSeq ==
      ((11L to 20L).toSet - 15L).toSeq.sorted,
      "the range scan must read the purged face")
    val hfs = new org.apache.hadoop.fs.Path(tbl)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    scan.inputFiles.foreach(p => assert(
      hfs.exists(new org.apache.hadoop.fs.Path(
        new java.net.URI(p).getPath)),
      s"range scan planned a deleted file: $p"))
    // pruning still holds: a range outside the purged file's bounds
    // plans fewer files than the table holds
    val narrow = Snapshots.scanRangeAsOf(spark, tbl, v0, "k", 1L, 5L)
    assert(narrow.inputFiles.length < Snapshots.manifest(spark, tbl)
      .filter($"version" === v0).count())
    assert(narrow.select($"k").as[Long].collect().sorted.toSeq ==
      (1L to 5L).toSeq)
  }

  test("purgeKeys on a partitioned lineage preserves fragments — " +
    "pruned partition scans still work on every rewritten version") {
    val tbl = freshTable()
    val v0 = Snapshots.commitPartitioned(spark,
      Seq((1L, 10L, "d1"), (2L, 20L, "d1"), (3L, 10L, "d2"))
        .toDF("id", "uid", "day"),
      tbl, "day", append = false)
    val v1 = Snapshots.commitPartitioned(spark,
      Seq((4L, 10L, "d2"), (5L, 40L, "d2")).toDF("id", "uid", "day"),
      tbl, "day", append = true)
    assert(Snapshots.purgeKeys(spark, tbl,
      Seq(10L).toDF("uid"), Seq("uid")) == 3L)
    val d2v1 = Snapshots.scanPartitionAsOf(spark, tbl, v1, "day", "d2")
    assert(d2v1.select($"id").as[Long].collect().sorted.toSeq == Seq(5L))
    assert(d2v1.inputFiles.forall(_.contains("/day=d2/")),
      "partition-column reconstruction must survive the purge rewrite")
    assert(Snapshots.scanPartitionAsOf(spark, tbl, v0, "day", "d1")
      .select($"id").as[Long].collect().toSeq == Seq(2L))
    assert(Snapshots.readAsOf(spark, tbl, v1)
      .filter($"uid" === 10L).count() == 0L)
  }

  test("cloneTable: zero-copy fork — no data copied, reads equal; the " +
    "clone's purge and vacuum never touch the source's files") {
    val src = freshTable()
    Snapshots.commit(spark, rows0, src, append = false)
    val s1 = Snapshots.commit(spark, rows1, src, append = true)
    val dst = freshTable()
    val c0 = Snapshots.cloneTable(spark, src, s1, dst)
    assert(c0 == 0L)
    assert(!new java.io.File(s"$dst/data").exists(),
      "a shallow clone must copy ZERO data files")
    assert(Snapshots.readAsOf(spark, dst, c0)
      .select($"id").as[Long].collect().sorted.toSeq == Seq(1L, 2L, 3L))
    // purge on the CLONE: the clone's face loses the key, the source
    // keeps it — the old external file must survive on disk
    assert(Snapshots.purgeKeys(spark, dst,
      Seq(1L).toDF("id"), Seq("id")) == 1L)
    assert(Snapshots.readAsOf(spark, dst, c0)
      .select($"id").as[Long].collect().sorted.toSeq == Seq(2L, 3L))
    assert(Snapshots.readAsOf(spark, src, s1)
      .select($"id").as[Long].collect().sorted.toSeq == Seq(1L, 2L, 3L),
      "the source must be untouched by the clone's purge")
    // diverge with a replace, then vacuum the clone: owned purge
    // rewrites die, borrowed externals are only dropped from the
    // manifest — and the source still reads
    val d1 = Snapshots.commit(spark, rows0, dst, append = false)
    Snapshots.vacuum(spark, dst, keepFrom = d1)
    assert(Snapshots.readAsOf(spark, src, s1)
      .select($"id").as[Long].collect().sorted.toSeq == Seq(1L, 2L, 3L),
      "the source must survive the clone's vacuum")
    assert(Snapshots.readAsOf(spark, dst, d1)
      .select($"id").as[Long].collect().sorted.toSeq == Seq(1L, 2L))
    // refusals: non-empty destination, unknown source version
    intercept[IllegalArgumentException](
      Snapshots.cloneTable(spark, src, s1, dst))
    val dst2 = freshTable()
    intercept[IllegalArgumentException](
      Snapshots.cloneTable(spark, src, 77L, dst2))
  }

  test("commitBloom/scanPointAsOf: point lookups AS OF a version plan " +
    "only sidecar-admitted files; append shares the parent's rows; " +
    "purge repoints blooms; vacuum expires sidecars") {
    val tbl = freshTable()
    val a = (0L until 40L by 2L).map(i => (i, s"a$i")).toDF("id", "v")
      .repartition(4)
    val b = (1L until 40L by 2L).map(i => (i, s"b$i")).toDF("id", "v")
      .repartition(4)
    val v0 = Snapshots.commitBloom(spark, a, tbl, "id", append = false,
      expectedPerFile = 100L)
    val v1 = Snapshots.commitBloom(spark, b, tbl, "id", append = true,
      expectedPerFile = 100L)
    assert(Snapshots.scanPointAsOf(spark, tbl, v0, "id", 6L)
      .select($"v").as[String].collect().toSeq == Seq("a6"))
    assert(Snapshots.scanPointAsOf(spark, tbl, v0, "id", 7L).count() == 0L,
      "an id that only arrived in the append must MISS as of v0")
    assert(Snapshots.scanPointAsOf(spark, tbl, v1, "id", 7L)
      .select($"v").as[String].collect().toSeq == Seq("b7"))
    val pruned = Snapshots.scanPointAsOf(spark, tbl, v1, "id", 6L)
    val totalFiles = Snapshots.manifest(spark, tbl)
      .filter($"version" === v1).count()
    assert(pruned.inputFiles.nonEmpty &&
      pruned.inputFiles.length < totalFiles,
      s"bloom admitted ${pruned.inputFiles.length} of $totalFiles files " +
        "— no skip happened")
    // purge: the hit file rewrites, its bloom row repoints — the key
    // is gone, neighbors still resolve, and no deleted file is planned
    assert(Snapshots.purgeKeys(spark, tbl,
      Seq(6L).toDF("id"), Seq("id")) == 1L)
    assert(Snapshots.scanPointAsOf(spark, tbl, v1, "id", 6L).count() == 0L)
    val after = Snapshots.scanPointAsOf(spark, tbl, v1, "id", 8L)
    assert(after.select($"v").as[String].collect().toSeq == Seq("a8"))
    val hfs = new org.apache.hadoop.fs.Path(tbl)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    after.inputFiles.foreach(p => assert(
      hfs.exists(new org.apache.hadoop.fs.Path(new java.net.URI(p).getPath)),
      s"post-purge point scan planned a deleted file: $p"))
    // vacuum: the expired version's sidecar dies with it
    Snapshots.vacuum(spark, tbl, keepFrom = v1)
    intercept[IllegalArgumentException](
      Snapshots.scanPointAsOf(spark, tbl, v0, "id", 6L))
    assert(Snapshots.scanPointAsOf(spark, tbl, v1, "id", 9L)
      .select($"v").as[String].collect().toSeq == Seq("b9"),
      "the retained version's sidecar must survive the vacuum")
    // optimizeBloom: compaction keeps the point index — the rewritten
    // head still prunes (one compacted file admitted of however many)
    val v2 = Snapshots.optimizeBloom(spark, tbl, "id",
      targetBytes = 1L << 30, expectedPerFile = 100L)
    assert(Snapshots.scanPointAsOf(spark, tbl, v2, "id", 9L)
      .select($"v").as[String].collect().toSeq == Seq("b9"))
    assert(Snapshots.scanPointAsOf(spark, tbl, v2, "id", 6L).count() == 0L,
      "the purged key must stay gone through compaction")
  }

  test("diff tags multiset adds and removals") {
    val tbl = freshTable()
    val old = Seq((1L, "a"), (1L, "a"), (2L, "b")).toDF("id", "v")
    val neu = Seq((1L, "a"), (3L, "c")).toDF("id", "v")
    Snapshots.commit(spark, old, tbl, append = false)
    Snapshots.commit(spark, neu, tbl, append = false)
    val d = Snapshots.diff(spark, tbl, 0L, 1L)
      .select($"change", $"id").collect()
      .map(r => (r.getString(0), r.getLong(1))).sorted.toSeq
    // one copy of (1,"a") survives on both sides; the second is removed
    assert(d == Seq(("+", 3L), ("-", 1L), ("-", 2L)))
  }

  private val dvRows =
    Seq((1L, "a"), (2L, "b"), (3L, "c"), (4L, "d")).toDF("id", "v")

  test("deleteWhere: a metadata-only commit — the new generation's " +
    "file set is the parent's VERBATIM; reads anti-join the sidecar; " +
    "older versions keep the rows (MVCC); deletes stack") {
    val tbl = freshTable()
    val v0 = Snapshots.commit(spark, dvRows, tbl, append = false)
    val v1 = Snapshots.deleteWhere(spark, tbl, $"id" % 2 === 0L)
    val v2 = Snapshots.deleteWhere(spark, tbl, $"v" === "c")
    def ids(v: Long) = Snapshots.readAsOf(spark, tbl, v)
      .select($"id").collect().map(_.getLong(0)).sorted.toSeq
    assert(ids(v0) == Seq(1L, 2L, 3L, 4L))
    assert(ids(v1) == Seq(1L, 3L))
    assert(ids(v2) == Seq(1L))
    // zero data rewritten: every generation references the SAME files
    val m = Snapshots.manifest(spark, tbl)
      .collect().map(r => (r.getLong(0), r.getString(1)))
    val files = (v: Long) => m.filter(_._1 == v).map(_._2).toSet
    assert(files(v1) == files(v0) && files(v2) == files(v0),
      "deleteWhere must repoint the parent's files, not rewrite them")
    // countAsOf subtracts the governing deletes, still metadata+sidecar
    assert(Snapshots.countAsOf(spark, tbl, v0) == 4L)
    assert(Snapshots.countAsOf(spark, tbl, v1) == 2L)
    assert(Snapshots.countAsOf(spark, tbl, v2) == 1L)
    // an APPEND after a delete inherits the governing set: old files'
    // deleted rows stay dead, the fresh file's rows all arrive
    val v3 = Snapshots.commit(spark, Seq((9L, "z")).toDF("id", "v"),
      tbl, append = true)
    assert(ids(v3) == Seq(1L, 9L))
    // physical-count views refuse under live DVs instead of silently
    // overcounting — countAsOf is the DV-aware number
    val err = intercept[IllegalArgumentException] {
      Snapshots.tableStats(spark, tbl).collect()
    }
    assert(err.getMessage.contains("countAsOf"))
    intercept[IllegalArgumentException] {
      Snapshots.tableHistory(spark, tbl).collect()
    }
  }

  test("deleteWhere composes with optimize (physical drop), rollback " +
    "(restores the target's governing set), cloneTable (set transfers) " +
    "and vacuum (a governing set below keepFrom is re-materialized)") {
    val tbl = freshTable()
    Snapshots.commit(spark, dvRows, tbl, append = false)
    val vDel = Snapshots.deleteWhere(spark, tbl, $"id" >= 3L)
    def ids(v: Long) = Snapshots.readAsOf(spark, tbl, v)
      .select($"id").collect().map(_.getLong(0)).sorted.toSeq
    assert(ids(vDel) == Seq(1L, 2L))

    // a clone of the deleted-from snapshot must not resurrect rows
    val clone = Files.createTempDirectory("snap_spec_").toString + "/fork"
    Snapshots.cloneTable(spark, tbl, vDel, clone)
    assert(Snapshots.readAsOf(spark, clone, 0L)
      .select($"id").collect().map(_.getLong(0)).sorted.toSeq ==
      Seq(1L, 2L))

    // rollback to the pre-delete version restores the rows even though
    // a later delete's sidecar exists (the target's EMPTY set masks it)
    val vBack = Snapshots.rollback(spark, tbl, 0L)
    assert(ids(vBack) == Seq(1L, 2L, 3L, 4L))

    // optimize rewrites through the DV-applied read as of ITS parent:
    // roll forward to the deleted face first, then compact — fresh
    // files carry only surviving rows, no sidecar needed
    Snapshots.rollback(spark, tbl, vDel)
    val vOpt = Snapshots.optimize(spark, tbl, 1L << 20)
    assert(ids(vOpt) == Seq(1L, 2L))
    val optFiles = Snapshots.manifest(spark, tbl)
      .filter($"version" === vOpt).select($"file")
      .collect().map(_.getString(0)).toSet
    val v0Files = Snapshots.manifest(spark, tbl)
      .filter($"version" === 0L).select($"file")
      .collect().map(_.getString(0)).toSet
    assert(optFiles.intersect(v0Files).isEmpty,
      "optimize must commit fresh physical files")

    // vacuum everything below the optimized head: the governing DV
    // set's entries are all dead (their files left the lineage), but
    // the retained read must stay identical
    Snapshots.vacuum(spark, tbl, vOpt)
    assert(ids(vOpt) == Seq(1L, 2L))
  }

  test("vacuum re-materializes a below-keepFrom governing set so " +
    "retained DV-governed versions read unchanged; purgeKeys refuses " +
    "while live DV entries exist") {
    val tbl = freshTable()
    Snapshots.commit(spark, dvRows, tbl, append = false)
    val vDel = Snapshots.deleteWhere(spark, tbl, $"id" === 2L)
    // an append above the delete — its generation has no own DV dir
    val vApp = Snapshots.commit(spark, Seq((9L, "z")).toDF("id", "v"),
      tbl, append = true)
    // drop v0 and the delete's own version; the append stays
    Snapshots.vacuum(spark, tbl, vApp)
    assert(Snapshots.readAsOf(spark, tbl, vApp)
      .select($"id").collect().map(_.getLong(0)).sorted.toSeq ==
      Seq(1L, 3L, 4L, 9L),
      "the delete must survive vacuum though its version was dropped")
    val err = intercept[IllegalArgumentException] {
      Snapshots.purgeKeys(spark, tbl,
        Seq(Tuple1(1L)).toDF("id"), Seq("id"))
    }
    assert(err.getMessage.contains("deletion-vector"),
      s"purge must refuse on live DV entries, got: ${err.getMessage}")
  }

  test("CHECK constraints: addConstraint validates the existing face, " +
    "enforcement rides every ingest write (violator aborts, nothing " +
    "publishes), null passes (SQL three-valued), drop lifts the gate") {
    val tbl = freshTable()
    Snapshots.commit(spark,
      Seq((1L, Some(10L)), (2L, None)).toDF("id", "amt"),
      tbl, append = false)
    // retrofit refused while existing rows violate
    val bad = intercept[IllegalArgumentException] {
      Snapshots.addConstraint(spark, tbl, "big", "amt >= 100")
    }
    assert(bad.getMessage.contains("existing rows"))
    // a satisfiable constraint lands as a METADATA-ONLY version
    // (null amt passes — three-valued CHECK semantics)
    val vC = Snapshots.addConstraint(spark, tbl, "amt_pos", "amt > 0")
    val m = Snapshots.manifest(spark, tbl)
      .collect().map(r => (r.getLong(0), r.getString(1)))
    assert(m.filter(_._1 == vC).map(_._2).toSet ==
      m.filter(_._1 == 0L).map(_._2).toSet,
      "addConstraint must repoint the parent's files verbatim")
    assert(Snapshots.constraintsAsOf(spark, tbl, vC) ==
      Seq(("amt_pos", "amt > 0")))
    assert(Snapshots.constraintsAsOf(spark, tbl, 0L).isEmpty,
      "the pre-constraint face is governed by nothing")
    // a violating batch aborts inside the write job; no version lands
    val boom = intercept[Exception] {
      Snapshots.commit(spark,
        Seq((3L, Some(-5L))).toDF("id", "amt"), tbl, append = true)
    }
    def chain(t: Throwable): Seq[String] =
      Option(t).toSeq.flatMap(e => e.getMessage +: chain(e.getCause))
    assert(chain(boom).exists(m => m != null && m.contains("amt_pos")),
      s"the abort must name the constraint, got: ${chain(boom)}")
    assert(Snapshots.latestVersion(spark, tbl).contains(vC),
      "a refused batch must not mint a published version")
    // nulls pass, valid rows pass
    val vOk = Snapshots.commit(spark,
      Seq((4L, Some(7L)), (5L, None)).toDF("id", "amt"),
      tbl, append = true)
    assert(Snapshots.readAsOf(spark, tbl, vOk).count() == 4L)
    // drop lifts the gate for subsequent ingest
    Snapshots.dropConstraint(spark, tbl, "amt_pos")
    Snapshots.commit(spark,
      Seq((6L, Some(-1L))).toDF("id", "amt"), tbl, append = true)
    assert(Snapshots.latestVersion(spark, tbl).exists(v =>
      Snapshots.readAsOf(spark, tbl, v).count() == 5L))
  }

  test("CHECK constraints travel: rollback restores the target's " +
    "governing set; cloneTable transfers it; partitioned merges " +
    "enforce on their inserts") {
    val tbl = freshTable()
    val rows = Seq((1L, "x", 5L), (2L, "y", 6L)).toDF("id", "p", "amt")
    Snapshots.commitPartitioned(spark, rows, tbl, "p", append = false)
    val vC = Snapshots.addConstraint(spark, tbl, "amt_pos", "amt > 0")
    // merge inserts are gated
    intercept[Exception] {
      Snapshots.mergePartitioned(spark, tbl,
        Seq((3L, "x", -9L)).toDF("id", "p", "amt"), Seq("id"), "p")
    }
    // the clone starts life under the same invariants
    val clone = Files.createTempDirectory("snap_spec_").toString + "/fork"
    Snapshots.cloneTable(spark, tbl, vC, clone)
    assert(Snapshots.constraintsAsOf(spark, clone, 0L) ==
      Seq(("amt_pos", "amt > 0")))
    intercept[Exception] {
      Snapshots.commit(spark,
        Seq((9L, "z", -1L)).toDF("id", "p", "amt"), clone, append = true)
    }
    // rollback to the pre-constraint version lifts the gate on the
    // restored head (the target's EMPTY set masks the later add)
    val vBack = Snapshots.rollback(spark, tbl, 0L)
    assert(Snapshots.constraintsAsOf(spark, tbl, vBack).isEmpty)
    Snapshots.commitPartitioned(spark,
      Seq((4L, "x", -2L)).toDF("id", "p", "amt"), tbl, "p",
      append = true)
    assert(Snapshots.latestVersion(spark, tbl).exists(v =>
      Snapshots.readAsOf(spark, tbl, v).count() == 3L))
  }

  test("commitZordered/scanBoxAsOf: per-file rectangles prune on BOTH " +
    "dimensions; scanRangeAsOf prunes on either column alone; the box " +
    "answer is the exact filter") {
    val tbl = freshTable()
    // a 64x64 grid: Z-order packs each file into a compact rectangle
    val grid = spark.range(0, 4096L)
      .selectExpr("id % 64 AS x", "id DIV 64 AS y", "id AS v")
    val v0 = Snapshots.commitZordered(spark, grid, tbl, "x", "y",
      numFiles = 16, append = false)
    val box = Snapshots.scanBoxAsOf(spark, tbl, v0,
      "x", 0L, 7L, "y", 0L, 7L)
    assert(box.select($"v").collect().map(_.getLong(0)).sorted.toSeq ==
      (0L to 7L).flatMap(y => (0L to 7L).map(x => y * 64 + x)).sorted)
    val all = Snapshots.manifest(spark, tbl)
      .filter($"version" === v0).count()
    assert(box.inputFiles.length < all,
      s"an 1/64th box must prune: ${box.inputFiles.length} of $all files")
    // 1-D range scans prune on EITHER column of the same sidecar
    val byY = Snapshots.scanRangeAsOf(spark, tbl, v0, "y", 0L, 3L)
    assert(byY.count() == 4L * 64L)
    assert(byY.inputFiles.length < all,
      "a y-range over the z-layout must prune files too")
  }

  test("generated columns: materialized when absent, validated when " +
    "supplied (wrong values refuse), may feed constraints; drop stops " +
    "generating; rollback restores the target's set") {
    val tbl = freshTable()
    Snapshots.commit(spark, Seq((1L, 10L)).toDF("id", "amt"),
      tbl, append = false)
    Snapshots.addGeneratedColumn(spark, tbl, "bucket", "amt DIV 10")
    // constraints may reference the generated column (gen runs first)
    Snapshots.addConstraint(spark, tbl, "bucket_small", "bucket < 100")
    val vA = Snapshots.commit(spark, Seq((2L, 25L)).toDF("id", "amt"),
      tbl, append = true)
    val face = Snapshots.readAsOf(spark, tbl, vA)
      .select($"id", $"bucket").collect()
      .map(r => (r.getLong(0),
        if (r.isNullAt(1)) -1L else r.getLong(1))).sortBy(_._1).toSeq
    // the pre-declaration file null-fills; the new batch materialized
    assert(face == Seq((1L, -1L), (2L, 2L)))
    // writer-supplied CORRECT values pass, wrong values refuse
    Snapshots.commit(spark, Seq((3L, 31L, 3L)).toDF("id", "amt", "bucket"),
      tbl, append = true)
    val boom = intercept[Exception] {
      Snapshots.commit(spark,
        Seq((4L, 31L, 99L)).toDF("id", "amt", "bucket"),
        tbl, append = true)
    }
    def chain(t: Throwable): Seq[String] =
      Option(t).toSeq.flatMap(e => e.getMessage +: chain(e.getCause))
    assert(chain(boom).exists(m => m != null && m.contains("bucket")))
    // the constraint over the generated column also bites
    intercept[Exception] {
      Snapshots.commit(spark, Seq((5L, 5000L)).toDF("id", "amt"),
        tbl, append = true)
    }
    // drop stops generating
    Snapshots.dropGeneratedColumn(spark, tbl, "bucket")
    Snapshots.dropConstraint(spark, tbl, "bucket_small")
    val vPlain = Snapshots.commit(spark, Seq((6L, 70L)).toDF("id", "amt"),
      tbl, append = true)
    val b6 = Snapshots.readAsOf(spark, tbl, vPlain)
      .filter($"id" === 6L).select($"bucket").collect()
    assert(b6.head.isNullAt(0), "dropped generator must stop firing")
    // rollback to the generating era restores materialization
    Snapshots.rollback(spark, tbl, vA)
    val vR = Snapshots.commit(spark, Seq((7L, 42L)).toDF("id", "amt"),
      tbl, append = true)
    assert(Snapshots.readAsOf(spark, tbl, vR)
      .filter($"id" === 7L).select($"bucket")
      .collect().head.getLong(0) == 4L)
  }

  test("optimizeClustered: compaction that keeps range skipping — the " +
    "rewritten version prunes files by key interval, and DV deletes " +
    "compact away physically") {
    val tbl = freshTable()
    // 4 round-robin commits: every file spans the whole key domain, so
    // interval pruning on the ORIGINAL layout admits everything
    (0 until 4).foreach { i =>
      Snapshots.commit(spark,
        spark.range(i.toLong, 64L, 4L).selectExpr("id", "id * 2 AS v"),
        tbl, append = i > 0)
    }
    Snapshots.deleteWhere(spark, tbl, $"id" === 7L)
    val vOpt = Snapshots.optimizeClustered(spark, tbl, "id", 4)
    val scan = Snapshots.scanRangeAsOf(spark, tbl, vOpt, "id", 0L, 9L)
    assert(scan.select($"id").collect().map(_.getLong(0)).sorted.toSeq ==
      (0L to 9L).filterNot(_ == 7L),
      "the compacted face must drop the DV'd row physically")
    assert(scan.inputFiles.length < 4,
      s"clustered rewrite must let the range scan prune: " +
        s"${scan.inputFiles.length} files planned")
  }

  test("replacePartitions: exactly the batch's partitions are " +
    "overwritten, untouched files carry as pointers, and a re-run " +
    "converges (idempotent reload)") {
    val tbl = freshTable()
    Snapshots.commitPartitioned(spark,
      Seq((1L, "d1", "old"), (2L, "d1", "old"), (3L, "d2", "keep"))
        .toDF("id", "day", "v"),
      tbl, "day", append = false)
    val reload = Seq((9L, "d1", "new")).toDF("id", "day", "v")
    val v1 = Snapshots.replacePartitions(spark, tbl, reload, "day")
    def face(v: Long) = Snapshots.readAsOf(spark, tbl, v)
      .select($"id", $"v").collect()
      .map(r => (r.getLong(0), r.getString(1))).sortBy(_._1).toSeq
    // d1 is wholesale-replaced (the vanished row 2 is GONE — the
    // overwrite semantics a keyed merge cannot give), d2 untouched
    assert(face(v1) == Seq((3L, "keep"), (9L, "new")))
    // untouched partition's file is a pointer, not a rewrite
    val m = Snapshots.manifest(spark, tbl)
      .collect().map(r => (r.getLong(0), r.getString(1)))
    val d2v0 = m.filter(r => r._1 == 0L && r._2.contains("/day=d2/"))
      .map(_._2).toSet
    assert(d2v0.nonEmpty &&
      d2v0.subsetOf(m.filter(_._1 == v1).map(_._2).toSet))
    // idempotent: the same reload lands again, content identical
    val v2 = Snapshots.replacePartitions(spark, tbl, reload, "day")
    assert(face(v2) == face(v1))
    // history intact
    assert(face(0L) == Seq((1L, "old"), (2L, "old"), (3L, "keep")))
  }

  test("partition evolution: an append may change the partition key " +
    "without rewriting history; the evolved scan prunes same-key " +
    "fragments, data-filters old-layout files, and the naive scan " +
    "refuses the mixed layout") {
    val tbl = freshTable()
    // era 1: partitioned by k1 (k2 carried as DATA — the contract)
    Snapshots.commitPartitioned(spark,
      Seq((1L, "a", "x"), (2L, "a", "y"), (3L, "b", "x"))
        .toDF("id", "k1", "k2"),
      tbl, "k1", append = false)
    // era 2: the layout evolves to k2
    val v1 = Snapshots.commitPartitioned(spark,
      Seq((4L, "a", "x"), (5L, "b", "y")).toDF("id", "k1", "k2"),
      tbl, "k2", append = true)
    // scan by the NEW key: fragment-admits era-2 k2=x, data-filters
    // era 1 — ids 1, 3 (k2=x) and 4
    val byNew = Snapshots.scanPartitionEvolved(spark, tbl, v1, "k2", "x")
    assert(byNew.select($"id").collect().map(_.getLong(0)).sorted.toSeq ==
      Seq(1L, 3L, 4L))
    // pruning: era-2's k2=y file never enters the plan
    assert(!byNew.inputFiles.exists(_.contains("/k2=y/")),
      s"same-key other-value fragment must prune: ${byNew.inputFiles.toSeq}")
    // scan by the OLD key: fragment-admits era-1 k1=b, data-filters
    // era 2 — ids 3 and 5
    val byOld = Snapshots.scanPartitionEvolved(spark, tbl, v1, "k1", "b")
    assert(byOld.select($"id").collect().map(_.getLong(0)).sorted.toSeq ==
      Seq(3L, 5L))
    assert(!byOld.inputFiles.exists(_.contains("/k1=a/")))
    // the fragment-only verb refuses the mixed layout loudly
    val err = intercept[IllegalArgumentException] {
      Snapshots.scanPartitionAsOf(spark, tbl, v1, "k2", "x")
    }
    assert(err.getMessage.contains("scanPartitionEvolved"))
    // composes with deletion vectors
    val vDel = Snapshots.deleteWhere(spark, tbl, $"id" === 3L)
    assert(Snapshots.scanPartitionEvolved(spark, tbl, vDel, "k2", "x")
      .select($"id").collect().map(_.getLong(0)).sorted.toSeq ==
      Seq(1L, 4L))
  }

  test("file-level DV pushdown: the admitted file set splits into " +
    "clean and dirty at metadata time — one delete in one file leaves " +
    "the other files' subplan JOIN-FREE, and all-dead entries plan " +
    "zero joins") {
    import org.apache.spark.sql.catalyst.plans.logical.Join
    import org.apache.spark.sql.execution.datasources.LogicalRelation
    val tbl = freshTable()
    // four files, keys clustered so the delete hits EXACTLY one file
    Snapshots.commit(spark,
      (1L to 40L).map(i => (i, s"r$i")).toDF("id", "v")
        .repartitionByRange(4, $"id").sortWithinPartitions($"id"),
      tbl, append = false)
    assert(Snapshots.readAsOf(spark, tbl, 0L).inputFiles.length == 4)
    val vDel = Snapshots.deleteWhere(spark, tbl, $"id" === 5L)
    val face = Snapshots.readAsOf(spark, tbl, vDel)
    assert(face.count() == 39L)
    assert(face.filter($"id" === 5L).isEmpty)
    val plan = face.queryExecution.optimizedPlan
    val joins = plan.collect { case j: Join => j }
    assert(joins.size == 1, s"expected ONE anti-join (dirty leg): $plan")
    // the join's scan admits ONLY the dirty file; the clean leg scans
    // the other three with no join above it
    def dataFiles(p: org.apache.spark.sql.catalyst.plans.logical.LogicalPlan) =
      p.collect {
        case r: LogicalRelation => r.relation
          .asInstanceOf[org.apache.spark.sql.execution.datasources
            .HadoopFsRelation].location.inputFiles.toSeq
      }.flatten.filterNot(_.contains("/_dv/")) // the DV sidecar is a relation too
    val joinScan = dataFiles(joins.head)
    assert(joinScan.length == 1,
      s"the anti-join must scan only the DV-dirty file, got $joinScan")
    val allScans = dataFiles(plan)
    assert(allScans.length == 4,
      s"the union must still cover every admitted file: $allScans")

    // a replace buries the old files: the governing set's entries are
    // all DEAD, and the new face plans NO join at all
    Snapshots.commit(spark, Seq((99L, "z")).toDF("id", "v"),
      tbl, append = false)
    val head = Snapshots.latestVersion(spark, tbl).get
    val clean = Snapshots.readAsOf(spark, tbl, head)
    assert(clean.count() == 1L)
    assert(clean.queryExecution.optimizedPlan.collect {
      case j: Join => j
    }.isEmpty, "all-dead DV entries must plan zero joins")
  }

  test("deletion vectors: the governing set applies as a BROADCAST " +
    "anti-join — the fact scan never shuffles for its deletes") {
    // the DV sidecar is a file-backed relation with known size, so the
    // planner broadcast-sizes it statically; at 100 TB the refinement
    // is per-file bitmaps in the scan, but the plan shape here is the
    // contract: no exchange on the fact side for the delete
    val tbl = freshTable()
    Snapshots.commit(spark,
      spark.range(0, 1000L).selectExpr("id", "id * 3 AS v"),
      tbl, append = false)
    val v = Snapshots.deleteWhere(spark, tbl, $"id" % 97L === 0L)
    val face = Snapshots.readAsOf(spark, tbl, v)
    assert(face.count() == 1000L - 11L)
    val plan = face.queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin") && plan.contains("LeftAnti"),
      s"DV apply must be a broadcast anti-join:\n$plan")
    assert(!plan.contains("SortMergeJoin"),
      s"the fact side shuffled for its deletes:\n$plan")
  }

  test("readChangesBetween: O(delta) CDC — fresh rows '+', DV deletes " +
    "'-' on pre-existing rows only, an intra-interval add+delete nets " +
    "to zero, a rollback resurrection comes back as '+'") {
    val tbl = freshTable()
    Snapshots.commit(spark, Seq((1L, "a"), (2L, "b")).toDF("id", "v"),
      tbl, append = false)
    val v1 = Snapshots.commit(spark,
      Seq((3L, "c"), (4L, "d")).toDF("id", "v"), tbl, append = true)
    val v2 = Snapshots.deleteWhere(spark, tbl, $"id".isin(2L, 3L))
    def changes(a: Long, b: Long) =
      Snapshots.readChangesBetween(spark, tbl, a, b)
        .select($"change", $"id").collect()
        .map(r => (r.getString(0), r.getLong(1))).toSet
    // id 3 was added AND deleted inside [v0, v2] — nets to nothing;
    // id 2 existed at v0 — a real delete; id 4 a real add; id 1 silent
    assert(changes(0L, v2) == Set(("+", 4L), ("-", 2L)))
    // from v1 both deletes hit pre-existing rows
    assert(changes(v1, v2) == Set(("-", 2L), ("-", 3L)))
    // a rollback that resurrects emits the rows back
    val v3 = Snapshots.rollback(spark, tbl, v1)
    assert(changes(v2, v3) == Set(("+", 2L), ("+", 3L)))
    // the empty interval is the empty frame with the change column
    assert(Snapshots.readChangesBetween(spark, tbl, v2, v2).count() == 0L)
    // a replace in the interval refuses toward diff()
    Snapshots.commit(spark, Seq((9L, "z")).toDF("id", "v"),
      tbl, append = false)
    val err = intercept[IllegalArgumentException] {
      Snapshots.readChangesBetween(spark, tbl, v3,
        Snapshots.latestVersion(spark, tbl).get)
    }
    assert(err.getMessage.contains("diff()"))
  }

  test("renameColumn: pure metadata — files verbatim, new head reads " +
    "the new name over old bytes, past faces keep their names, appends " +
    "write the new logical name into the OLD physical column") {
    val tbl = freshTable()
    Snapshots.commit(spark,
      Seq((1L, 10L), (2L, 20L)).toDF("id", "amt"), tbl, append = false)
    val vR = Snapshots.renameColumn(spark, tbl, "amt", "amount")
    // zero data movement
    val m = Snapshots.manifest(spark, tbl)
      .collect().map(r => (r.getLong(0), r.getString(1)))
    assert(m.filter(_._1 == vR).map(_._2).toSet ==
      m.filter(_._1 == 0L).map(_._2).toSet)
    // the head face carries the new logical name with the old values
    val head = Snapshots.readAsOf(spark, tbl, vR)
    assert(head.columns.toSeq == Seq("id", "amount"))
    assert(head.select($"amount").collect().map(_.getLong(0)).sorted
      .toSeq == Seq(10L, 20L))
    // the past face is untouched
    assert(Snapshots.readAsOf(spark, tbl, 0L).columns.toSeq ==
      Seq("id", "amt"))
    // appends speak the new name; old and new files read back merged
    val vA = Snapshots.commit(spark,
      Seq((3L, 30L)).toDF("id", "amount"), tbl, append = true)
    assert(Snapshots.readAsOf(spark, tbl, vA)
      .select($"amount").collect().map(_.getLong(0)).sorted.toSeq ==
      Seq(10L, 20L, 30L))
    // chained rename collapses to one mapping entry
    val vC = Snapshots.renameColumn(spark, tbl, "amount", "cents")
    assert(Snapshots.readAsOf(spark, tbl, vC)
      .select($"cents").count() == 3L)
    assert(Snapshots.colMapAsOf(spark, tbl, vC)
      .collect { case (p, Some(l)) => (p, l) }.toSet ==
      Set(("amt", "cents")))
  }

  test("dropColumn tombstones the physical name: the head face prunes " +
    "it, history keeps it, re-adding the name refuses instead of " +
    "resurrecting old bytes; rollback and clone carry the mapping") {
    val tbl = freshTable()
    Snapshots.commit(spark,
      Seq((1L, 10L, "x"), (2L, 20L, "y")).toDF("id", "amt", "tag"),
      tbl, append = false)
    val vD = Snapshots.dropColumn(spark, tbl, "tag")
    assert(Snapshots.readAsOf(spark, tbl, vD).columns.toSeq ==
      Seq("id", "amt"))
    assert(Snapshots.readAsOf(spark, tbl, 0L).columns.toSeq ==
      Seq("id", "amt", "tag"))
    // a fresh batch re-adding the dropped logical name must refuse —
    // read-by-name would alias the old file bytes under it
    val boom = intercept[Exception] {
      Snapshots.commit(spark,
        Seq((3L, 30L, "z")).toDF("id", "amt", "tag"), tbl, append = true)
    }
    assert(boom.getMessage.contains("tombstoned") ||
      boom.getMessage.contains("physical"),
      s"unexpected: ${boom.getMessage}")
    // renaming another column INTO the tombstoned name also refuses
    intercept[Exception] {
      Snapshots.renameColumn(spark, tbl, "amt", "tag")
    }
    // rollback restores the pre-drop face (mapping re-materialized)
    val vBack = Snapshots.rollback(spark, tbl, 0L)
    assert(Snapshots.readAsOf(spark, tbl, vBack).columns.toSeq ==
      Seq("id", "amt", "tag"))
    // a clone of the dropped face starts under the same mapping
    val clone = Files.createTempDirectory("snap_spec_").toString + "/fork"
    Snapshots.cloneTable(spark, tbl, vD, clone)
    assert(Snapshots.readAsOf(spark, clone, 0L).columns.toSeq ==
      Seq("id", "amt"))
    intercept[Exception] {
      Snapshots.commit(spark,
        Seq((9L, 90L, "w")).toDF("id", "amt", "tag"), clone,
        append = true)
    }
  }

  test("column mapping composes with deletes, partitioned merges and " +
    "the audited commit; name-addressed sidecar verbs refuse loudly") {
    val tbl = freshTable()
    val rows = Seq((1L, "x", 5L), (2L, "x", 6L), (3L, "y", 7L))
      .toDF("id", "p", "amt")
    Snapshots.commitPartitioned(spark, rows, tbl, "p", append = false)
    Snapshots.renameColumn(spark, tbl, "amt", "amount")
    // partition columns cannot be renamed (path-encoded fragments)
    intercept[Exception] {
      Snapshots.renameColumn(spark, tbl, "p", "q")
    }
    // deleteWhere speaks the logical name
    val vDel = Snapshots.deleteWhere(spark, tbl, $"amount" === 6L)
    assert(Snapshots.readAsOf(spark, tbl, vDel)
      .select($"id").collect().map(_.getLong(0)).sorted.toSeq ==
      Seq(1L, 3L))
    // a partitioned merge reads survivors and writes under the mapping
    val vM = Snapshots.mergePartitioned(spark, tbl,
      Seq((4L, "x", 9L)).toDF("id", "p", "amount"), Seq("id"), "p")
    val face = Snapshots.readAsOf(spark, tbl, vM)
    assert(face.columns.sorted.toSeq == Seq("amount", "id", "p"))
    assert(face.select($"id", $"amount").collect()
      .map(r => (r.getLong(0), r.getLong(1))).sortBy(_._1).toSeq ==
      Seq((1L, 5L), (3L, 7L), (4L, 9L)))
    // purge still addresses physical file columns by name — refuses
    // (clustered stats and range/point/box scans are mapping-aware now)
    intercept[IllegalArgumentException] {
      Snapshots.purgeKeys(spark, tbl, Seq(Tuple1(1L)).toDF("id"),
        Seq("id"))
    }
  }

  test("mapping-aware data skipping: cluster on k, rename k→key — the " +
    "range/box scans on the LOGICAL name still prune files, a " +
    "post-rename clustered commit keeps pruning, and a bloom probe " +
    "refuses a key its sidecar does not index") {
    val tbl = freshTable()
    Snapshots.commitClustered(spark,
      (1L to 400L).map(i => (i, i * 2L)).toDF("k", "v"),
      tbl, "k", numFiles = 4, append = false)
    Snapshots.renameColumn(spark, tbl, "k", "key")
    val vR = Snapshots.latestVersion(spark, tbl).get
    val scan = Snapshots.scanRangeAsOf(spark, tbl, vR, "key", 10L, 50L)
    assert(scan.inputFiles.count(_.contains("/data/")) < 4,
      s"the rename must not cost the table its range skipping: " +
        s"${scan.inputFiles.toSeq}")
    assert(scan.select($"key").as[Long].collect().sorted.toSeq ==
      (10L to 50L), "the mapped range scan must answer logical rows")
    // the box scan translates each bound's column independently
    val box = Snapshots.scanBoxAsOfN(spark, tbl, vR,
      Seq(("key", 10L, 50L)))
    assert(box.inputFiles.count(_.contains("/data/")) < 4 &&
      box.select($"key").as[Long].collect().sorted.toSeq == (10L to 50L))
    // a clustered commit AFTER the rename records stats under the
    // PHYSICAL name; the logical-name scan keeps pruning
    val vC = Snapshots.commitClustered(spark,
      (1L to 400L).map(i => (i, i * 3L)).toDF("key", "v"),
      tbl, "key", numFiles = 4, append = false)
    val scan2 = Snapshots.scanRangeAsOf(spark, tbl, vC, "key", 10L, 50L)
    assert(scan2.inputFiles.count(_.contains("/data/")) < 4 &&
      scan2.select($"key").as[Long].collect().sorted.toSeq ==
        (10L to 50L))
    // a Z-ordered commit AFTER the rename: stats under physical names,
    // the box scan on the logical name still prunes
    val vZ = Snapshots.commitZorderedN(spark,
      (1L to 400L).map(i => (i, i * 5L)).toDF("key", "v"),
      tbl, Seq("key", "v"), numFiles = 4, append = false)
    val zbox = Snapshots.scanBoxAsOfN(spark, tbl, vZ,
      Seq(("key", 20L, 60L)))
    assert(zbox.inputFiles.count(_.contains("/data/")) < 4 &&
      zbox.select($"key").as[Long].collect().sorted.toSeq == (20L to 60L))

    // a bloom sidecar indexes ONE recorded key — probing another
    // column refuses loudly instead of falsely pruning
    val tblB = freshTable()
    Snapshots.commitBloom(spark,
      (1L to 100L).map(i => (i, i * 2L)).toDF("k", "v"),
      tblB, "k", append = false)
    val vB = Snapshots.latestVersion(spark, tblB).get
    val e = intercept[IllegalArgumentException](
      Snapshots.scanPointAsOf(spark, tblB, vB, "v", 10L))
    assert(e.getMessage.contains("indexes"), e.getMessage)
    assert(Snapshots.scanPointAsOf(spark, tblB, vB, "k", 7L)
      .select($"v").as[Long].collect().toSeq == Seq(14L))
    // renaming the bloom key translates the probe (recorded key stays
    // physical); a bloom committed AFTER the rename does too
    Snapshots.renameColumn(spark, tblB, "k", "kk")
    val vBR = Snapshots.latestVersion(spark, tblB).get
    assert(Snapshots.scanPointAsOf(spark, tblB, vBR, "kk", 7L)
      .select($"v").as[Long].collect().toSeq == Seq(14L),
      "the renamed bloom key must translate for the probe")
    val vB2 = Snapshots.commitBloom(spark,
      (1L to 100L).map(i => (i, i * 9L)).toDF("kk", "v"),
      tblB, "kk", append = false)
    assert(Snapshots.scanPointAsOf(spark, tblB, vB2, "kk", 7L)
      .select($"v").as[Long].collect().toSeq == Seq(63L),
      "a post-rename bloom commit must index the physical key")
  }

  test("deleteWhere on a partitioned lineage: scanPartitionAsOf " +
    "applies the governing set; mergePartitioned rewrites touched " +
    "partitions WITHOUT resurrecting DV-deleted rows") {
    val tbl = freshTable()
    val rows = Seq((1L, "x", "a"), (2L, "x", "b"), (3L, "y", "c"),
      (4L, "y", "d")).toDF("id", "p", "v")
    Snapshots.commitPartitioned(spark, rows, tbl, "p", append = false)
    val vDel = Snapshots.deleteWhere(spark, tbl, $"id" === 2L)
    assert(Snapshots.scanPartitionAsOf(spark, tbl, vDel, "p", "x")
      .select($"id").collect().map(_.getLong(0)).toSeq == Seq(1L))
    // merge an upsert into partition x: survivors of x = {1} (2 stays
    // dead), plus the update row
    val vM = Snapshots.mergePartitioned(spark, tbl,
      Seq((5L, "x", "e")).toDF("id", "p", "v"), Seq("id"), "p")
    assert(Snapshots.readAsOf(spark, tbl, vM)
      .select($"id").collect().map(_.getLong(0)).sorted.toSeq ==
      Seq(1L, 3L, 4L, 5L))
  }
}
