package graft

import java.nio.file.Files

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

import graft.operators.Snapshots
import graft.streaming.SnapshotStream

/** Exactly-once streaming ingest ([[SnapshotStream]]): one append
  * generation per micro-batch stamped `commit_ts = batchId`, replayed
  * batches skipped by the manifest check alone (the atomic publish IS
  * the transaction marker), crashed-before-publish batches retried. */
class SnapshotStreamSpec extends SparkSuite {
  import spark.implicits._

  private def freshTable(): String = {
    val p = Files.createTempDirectory("snap_stream_").toString + "/tbl"
    Snapshots.init(spark, p)
    p
  }

  test("each micro-batch lands as one append generation; the version " +
    "history is the batch history; every prefix time-travels") {
    val tbl = freshTable()
    val stream = MemoryStream[(Long, String)](spark)
    val q = SnapshotStream.ingest(
      stream.toDF.toDF("id", "v"), tbl, "snap_ingest_spec")
    stream.addData(Seq((1L, "a"), (2L, "b")))
    q.processAllAvailable()
    stream.addData(Seq((3L, "c")))
    q.processAllAvailable()
    q.stop()
    def ids(ver: Long) = Snapshots.readAsOf(spark, tbl, ver)
      .select($"id").collect().map(_.getLong(0)).sorted.toSeq
    assert(Snapshots.latestVersion(spark, tbl).contains(1L))
    assert(ids(0L) == Seq(1L, 2L), "batch 0 = version 0")
    assert(ids(1L) == Seq(1L, 2L, 3L), "batch 1 appends onto batch 0")
    // the table's logical timeline is batch-id coordinates
    val stamps = Snapshots.tableHistory(spark, tbl)
      .select($"version", $"commit_ts").collect()
      .map(r => (r.getLong(0), r.getLong(1))).sorted.toSeq
    assert(stamps == Seq((0L, 0L), (1L, 1L)))
  }

  test("audited ingest with a dead-letter queue: clean batches publish, " +
    "a refused batch lands verbatim in the DLQ and never in the table, " +
    "and replays of BOTH kinds are exactly-once") {
    val root = Files.createTempDirectory("snap_stream_").toString
    val tbl = s"$root/tbl"; val dlq = s"$root/dlq"
    Snapshots.init(spark, tbl)
    val audit = (df: org.apache.spark.sql.DataFrame) =>
      graft.operators.Stats.expectRows(df,
        Seq(("neg_amt", $"amt" < 0L)))
    val b0 = Seq((1L, 10L), (2L, 20L)).toDF("id", "amt")
    val bad = Seq((3L, -5L), (4L, 30L)).toDF("id", "amt")
    assert(SnapshotStream.appendBatchAudited(
      spark, tbl, dlq, audit, 0L, b0).contains(0L))
    assert(SnapshotStream.appendBatchAudited(
      spark, tbl, dlq, audit, 1L, bad).isEmpty)
    // the table saw only the audited generation
    assert(Snapshots.latestVersion(spark, tbl).contains(0L))
    assert(Snapshots.readAsOf(spark, tbl, 0L).count() == 2L)
    // the refused batch is quarantined verbatim for triage
    assert(spark.read.parquet(s"$dlq/b1")
      .select($"id").collect().map(_.getLong(0)).sorted.toSeq ==
      Seq(3L, 4L))
    // replays: the published id skips via the manifest stamp, the
    // refused id skips via its DLQ directory — nothing doubles
    assert(SnapshotStream.appendBatchAudited(
      spark, tbl, dlq, audit, 0L, b0).isEmpty)
    assert(SnapshotStream.appendBatchAudited(
      spark, tbl, dlq, audit, 1L, bad).isEmpty)
    assert(Snapshots.latestVersion(spark, tbl).contains(0L))
    assert(spark.read.parquet(s"$dlq/b1").count() == 2L)
    // the stream keeps moving: a later clean batch publishes (as v2 —
    // the refused batch BURNED claim 1 before refusing, the documented
    // benign gap every crashed committer leaves)
    assert(SnapshotStream.appendBatchAudited(
      spark, tbl, dlq, audit, 2L, Seq((5L, 50L)).toDF("id", "amt"))
      .contains(2L))
  }

  test("replay semantics: a re-delivered batch id is skipped without " +
    "touching the table (crash-after-publish); an id the manifest " +
    "never saw commits (crash-before-publish retry)") {
    val tbl = freshTable()
    val b0 = Seq((1L, "a"), (2L, "b")).toDF("id", "v")
    assert(SnapshotStream.appendBatchExactlyOnce(spark, tbl, 0L, b0)
      .contains(0L))
    // crash-after-publish: the checkpoint never advanced, the engine
    // re-delivers batch 0 — the manifest stamp refuses the duplicate
    assert(SnapshotStream.appendBatchExactlyOnce(spark, tbl, 0L, b0)
      .isEmpty)
    assert(Snapshots.countAsOf(spark, tbl, 0L) == 2L)
    assert(Snapshots.latestVersion(spark, tbl).contains(0L),
      "the replay must not mint a version")
    // crash-before-publish: batch 1's first attempt died before its
    // manifest rename — nothing is stamped, so the retry commits
    assert(SnapshotStream.appendBatchExactlyOnce(spark, tbl, 1L,
      Seq((3L, "c")).toDF("id", "v")).contains(1L))
    assert(Snapshots.readAsOf(spark, tbl, 1L)
      .select($"id").collect().map(_.getLong(0)).sorted.toSeq ==
      Seq(1L, 2L, 3L))
  }

  test("downstream poll feeds are DV-aware: a delete landing BETWEEN " +
    "polls is never replayed as a live row — the inserts-only feed " +
    "drops it, the CDC feed retracts it") {
    val tbl = freshTable()
    assert(SnapshotStream.appendBatchExactlyOnce(spark, tbl, 0L,
      Seq((1L, "a"), (2L, "b")).toDF("id", "v")).contains(0L))
    // the consumer's first poll checkpoint
    val seen = Snapshots.latestVersion(spark, tbl).get
    // between polls: a batch lands AND a delete dooms one of its rows
    // plus one the consumer already saw live
    assert(SnapshotStream.appendBatchExactlyOnce(spark, tbl, 1L,
      Seq((3L, "c"), (4L, "d")).toDF("id", "v")).contains(1L))
    Snapshots.deleteWhere(spark, tbl,
      org.apache.spark.sql.functions.col("id").isin(2L, 3L))
    val head = Snapshots.latestVersion(spark, tbl).get

    // inserts-only feed: id 3 (ingested AND deleted inside the
    // interval) must NOT replay as live; id 4 arrives; id 2's delete
    // is invisible (it was delivered live by the previous poll — an
    // inserts-only feed cannot retract)
    val appends = Snapshots.readAppendsBetween(spark, tbl, seen, head)
      .select($"id").as[Long].collect().sorted.toSeq
    assert(appends == Seq(4L),
      s"a mid-interval delete replayed as live: $appends")

    // CDC feed: same add, plus the retraction of the already-seen row
    val changes = Snapshots.readChangesBetween(spark, tbl, seen, head)
      .select($"change", $"id").as[(String, Long)].collect().toSet
    assert(changes == Set(("+", 4L), ("-", 2L)),
      s"CDC feed wrong: $changes")
  }

  test("the ingest sink's maintenance hook: a 20-batch stream ends " +
    "bounded in versions AND files, content exact, feeds green across " +
    "the post-compaction append run") {
    val tbl = freshTable()
    val stream = MemoryStream[(Long, String)](spark)
    val q = SnapshotStream.ingest(stream.toDF.toDF("id", "v"), tbl,
      "snap_ingest_maint_spec",
      maintainEvery = 5, targetBytes = 1L << 30, retainVersions = 6)
    (0 until 20).foreach { i =>
      stream.addData(Seq((i.toLong, s"r$i")))
      q.processAllAvailable()
    }
    q.stop()
    // content: every batch's row, exactly once
    val head = Snapshots.latestVersion(spark, tbl).get
    assert(Snapshots.readAsOf(spark, tbl, head)
      .select($"id").as[Long].collect().sorted.toSeq ==
      (0L until 20L))
    // bounded: ≤ retainVersions + maintainEvery generations survive
    // (retention trims at each maintenance point, appends accumulate
    // between them), and the head carries the last compaction's ONE
    // file plus at most maintainEvery per-batch files — a maintained
    // stream, not 20 generations of 20 files
    val versions = Snapshots.listGenerations(spark, tbl)
    assert(versions.length <= 6 + 5,
      s"unmaintained version growth: ${versions.length} generations")
    val headFiles = Snapshots.readAsOf(spark, tbl, head).inputFiles.length
    assert(headFiles <= 1 + 5,
      s"unmaintained file growth: $headFiles files at the head")
    // the O(delta) feed serves the post-compaction append run: from
    // the last maintenance's replace generation to the head
    val sinceCompact = Snapshots.tableHistory(spark, tbl)
      .collect().map(r => (r.getLong(0),
        if (r.isNullAt(1)) None else Some(r.getLong(1))))
      .filter(_._2.isEmpty).map(_._1).max // compactions carry no stamp
    val delta = Snapshots.readAppendsBetween(spark, tbl, sinceCompact, head)
      .select($"id").as[Long].collect().sorted.toSeq
    assert(delta == (16L until 20L), // the compaction at batch 15 ran
      // AFTER its append, so 15's row is inside the compacted files
      s"post-compaction incremental feed wrong: $delta")
    // exactly-once replay survives maintenance: batch 19's stamp is in
    // a retained generation, so a crash-replay skips it
    assert(SnapshotStream.appendBatchExactlyOnce(spark, tbl, 19L,
      Seq((19L, "r19")).toDF("id", "v")).isEmpty,
      "a replayed batch id must skip — its stamp is retained")
  }
}
