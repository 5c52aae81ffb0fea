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
