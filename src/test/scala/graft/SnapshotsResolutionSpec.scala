package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.operators.Snapshots

/** The read-path resolution BUDGET, pinned as counted facts (the
  * [[Snapshots.manifestReads]]/[[Snapshots.sidecarListings]]
  * instrumentation) rather than wall-clock: each read verb takes ONE
  * eager manifest read and ONE combined sidecar resolution — a single
  * listing of the table root to discover which families exist, plus
  * one listing per family actually present — instead of an
  * exists+list pair per family per verb, a constant that grew with
  * every sidecar family the engine accrued. At 100 TB these listings
  * are object-store round-trips on every query's critical path; the
  * budget is the contract that keeps new sidecar families from
  * silently taxing every read. */
class SnapshotsResolutionSpec extends SparkSuite {
  import spark.implicits._

  private def freshTable(): String = {
    val p = Files.createTempDirectory("snap_res_").toString + "/tbl"
    Snapshots.init(spark, p)
    p
  }

  /** (result, manifest reads, sidecar listings) around `body`. */
  private def counted[T](body: => T): (T, Long, Long) = {
    val m0 = Snapshots.manifestReads.get
    val l0 = Snapshots.sidecarListings.get
    val r = body
    (r, Snapshots.manifestReads.get - m0,
      Snapshots.sidecarListings.get - l0)
  }

  /** (result, manifest ROWS collected) around `body`. */
  private def rowsCounted[T](body: => T): (T, Long) = {
    val r0 = Snapshots.manifestRowsCollected.get
    val r = body
    (r, Snapshots.manifestRowsCollected.get - r0)
  }

  test("readAsOf budget: one manifest read, one combined resolution — " +
    "1 listing with no sidecars, 1 + families-present with them") {
    val tbl = freshTable()
    val v0 = Snapshots.commit(spark,
      Seq((1L, "a"), (2L, "b"), (3L, "c")).toDF("id", "v"),
      tbl, append = false)
    // plain table: no sidecar family exists — the root listing is the
    // resolution's ONLY listing I/O
    val (n0, m0, l0) = counted(Snapshots.readAsOf(spark, tbl, v0).count())
    assert(n0 == 3L)
    assert(m0 == 1L, s"plain readAsOf took $m0 manifest reads, budget 1")
    assert(l0 == 1L, s"plain readAsOf took $l0 sidecar listings, budget 1")

    // stack TWO governing families (a delete's _dv, a constraint's
    // _constraints): the budget grows to 1 root + 2 present families,
    // NOT to an exists+list pair per family per verb
    val vDel = Snapshots.deleteWhere(spark, tbl, col("id") === 1L)
    Snapshots.addConstraint(spark, tbl, "id_nn", "id IS NOT NULL")
    val head = Snapshots.latestVersion(spark, tbl).get
    val (n1, m1, l1) = counted(Snapshots.readAsOf(spark, tbl, head).count())
    assert(n1 == 2L && vDel > v0)
    assert(m1 == 1L, s"sidecarred readAsOf took $m1 manifest reads, budget 1")
    assert(l1 == 3L,
      s"sidecarred readAsOf took $l1 sidecar listings, budget 3 " +
        "(root + _dv + _constraints)")
  }

  test("countAsOf and scanRangeAsOf stay inside the same budget — the " +
    "stats scan's happy path reads the manifest ZERO times") {
    val tbl = freshTable()
    val v = Snapshots.commitClustered(spark,
      (1L to 100L).map(i => (i, s"r$i")).toDF("k", "v"),
      tbl, "k", numFiles = 4, append = false)
    val (c, mc, lc) = counted(Snapshots.countAsOf(spark, tbl, v))
    assert(c == 100L)
    assert(mc == 1L, s"countAsOf took $mc manifest reads, budget 1")
    assert(lc == 1L, s"countAsOf took $lc sidecar listings, budget 1")
    // the stats sidecar admits the files; the manifest never opens
    val (rows, mr, lr) = counted(
      Snapshots.scanRangeAsOf(spark, tbl, v, "k", 10L, 20L).count())
    assert(rows == 11L)
    assert(mr == 0L,
      s"scanRangeAsOf(non-empty) took $mr manifest reads, budget 0")
    assert(lr <= 2L,
      s"scanRangeAsOf took $lr sidecar listings, budget 2 (colmap guard " +
        "+ combined resolution root)")
  }

  test("manifest rows collected are bounded by the QUERIED generation, " +
    "not the history — the O(versions × files) full-history collect " +
    "is gone from every read verb") {
    val tbl = freshTable()
    // a deep history: 12 single-file append generations, so generation
    // v carries v+1 files and the WHOLE manifest holds Σ(v+1) = 78
    // rows — an unbounded reader would collect all 78 per verb
    var head = Snapshots.commit(spark,
      Seq((0L, "r0")).toDF("id", "v").coalesce(1), tbl,
      append = false, ts = Some(0L))
    (1L to 11L).foreach { i =>
      head = Snapshots.commit(spark,
        Seq((i, s"r$i")).toDF("id", "v").coalesce(1), tbl,
        append = true, ts = Some(i))
    }
    val headFiles = 12L
    val historyRows = (1L to 12L).sum // 78

    val ((), latestRows) = rowsCounted {
      assert(Snapshots.latestVersion(spark, tbl).contains(head)); ()
    }
    assert(latestRows == 0L,
      s"latestVersion collected $latestRows manifest rows — the head " +
        "must resolve from the directory listing alone")

    val (n, readRows) = rowsCounted(
      Snapshots.readAsOf(spark, tbl, head).count())
    assert(n == 12L)
    assert(readRows == headFiles,
      s"readAsOf(head) collected $readRows manifest rows over a " +
        s"$historyRows-row history — budget: the generation's own " +
        s"$headFiles")

    val (c, countRows) = rowsCounted(Snapshots.countAsOf(spark, tbl, head))
    assert(c == 12L)
    assert(countRows == headFiles,
      s"countAsOf(head) collected $countRows manifest rows, budget " +
        s"$headFiles")

    // an OLD generation's read is bounded by ITS file count, not the
    // head's and not the history's
    val (c3, oldRows) = rowsCounted(Snapshots.countAsOf(spark, tbl, 2L))
    assert(c3 == 3L)
    assert(oldRows == 3L,
      s"countAsOf(v2) collected $oldRows manifest rows, budget 3")

    // the timeline verb collects one row per GENERATION (the distinct
    // runs in the executors), never the per-file fan-out
    val (vAt, tsRows) = rowsCounted(Snapshots.versionAt(spark, tbl, 5L))
    assert(vAt == 5L)
    assert(tsRows == 12L,
      s"versionAt collected $tsRows manifest rows, budget 12 (one per " +
        "generation)")

    // an append COMMIT reads its rebase parent's generation (and the
    // stats-free publish tail), never the history
    val (_, commitRows) = rowsCounted(
      Snapshots.commit(spark, Seq((99L, "z")).toDF("id", "v").coalesce(1),
        tbl, append = true, ts = Some(99L)))
    assert(commitRows <= 2L * headFiles,
      s"an append commit collected $commitRows manifest rows over a " +
        s"$historyRows-row history — budget 2×${headFiles} (rebase " +
        "parent + publish tail)")
  }

  test("partition scans AS OF stay inside the per-generation rows " +
    "budget") {
    val tbl = freshTable()
    val df = (1L to 40L).map(i => (i, s"d${i % 4}")).toDF("id", "day")
    val v0 = Snapshots.commitPartitioned(spark, df, tbl, "day",
      append = false)
    (1 to 5).foreach { i =>
      Snapshots.commitPartitioned(spark,
        Seq((100L + i, "d1")).toDF("id", "day"), tbl, "day", append = true)
    }
    val head = Snapshots.latestVersion(spark, tbl).get
    val headFileCount =
      Snapshots.readAsOf(spark, tbl, head).inputFiles.length.toLong
    val (n, rows) = rowsCounted(
      Snapshots.scanPartitionAsOf(spark, tbl, head, "day", "d1").count())
    assert(n == 15L && v0 == 0L)
    assert(rows == headFileCount,
      s"scanPartitionAsOf collected $rows manifest rows, budget " +
        s"$headFileCount (the head generation's own files)")
  }

  test("the interval verbs resolve BOTH endpoints from one manifest " +
    "read and one DV family listing") {
    val tbl = freshTable()
    val v0 = Snapshots.commit(spark,
      Seq((1L, "a"), (2L, "b")).toDF("id", "v"), tbl, append = false)
    Snapshots.commit(spark, Seq((3L, "c")).toDF("id", "v"),
      tbl, append = true)
    val v2 = Snapshots.deleteWhere(spark, tbl, col("id") === 2L)
    val (changes, m, l) = counted(
      Snapshots.readChangesBetween(spark, tbl, v0, v2)
        .select(col("change"), col("id")).as[(String, Long)]
        .collect().toSet)
    assert(changes == Set(("+", 3L), ("-", 2L)))
    assert(m == 1L, s"readChangesBetween took $m manifest reads, budget 1")
    // one explicit DV-family listing + the combined resolution's
    // root + dv listings
    assert(l <= 3L,
      s"readChangesBetween took $l sidecar listings, budget 3")
  }
}
