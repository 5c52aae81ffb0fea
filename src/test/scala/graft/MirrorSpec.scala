package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.operators.{Mirror, Snapshots}

/** Incremental table mirroring ([[graft.operators.Mirror]]): the
  * replication offset rides the destination's own commit stamp, so a
  * poll is exactly-once by the same atomic-manifest-publish argument
  * as the streaming ingest sink — no side ledger, reruns no-op, and
  * the two feeds (appends-only / row-level CDC) replicate what their
  * lineage contracts promise. */
class MirrorSpec extends SparkSuite {
  import spark.implicits._

  private def freshPair(): (String, String) = {
    val root = Files.createTempDirectory("mirror_").toString
    val src = s"$root/src"; val dst = s"$root/dst"
    Snapshots.init(spark, src); Snapshots.init(spark, dst)
    (src, dst)
  }

  private def rowsOf(tbl: String): Seq[(Long, String)] = {
    val head = Snapshots.latestVersion(spark, tbl).get
    Snapshots.readAsOf(spark, tbl, head).as[(Long, String)]
      .collect().toSeq.sorted
  }

  test("appends mirror: seed, incremental delta, idempotent rerun — " +
    "the offset is the destination's own commit stamp") {
    val (src, dst) = freshPair()
    Snapshots.commit(spark, Seq((1L, "a"), (2L, "b")).toDF("id", "v"),
      src, append = false)
    // seed: the full v0 face, offset stamp = 0
    val d0 = Mirror.mirrorAppends(spark, src, dst)
    assert(d0.contains(0L))
    assert(rowsOf(dst) == Seq((1L, "a"), (2L, "b")))
    assert(Mirror.offsetOf(spark, dst).contains(0L))
    // already caught up: a rerun is a no-op — no version minted
    assert(Mirror.mirrorAppends(spark, src, dst).isEmpty)
    assert(Snapshots.latestVersion(spark, dst).contains(0L))

    // two source appends, ONE poll ships both as one delta commit
    Snapshots.commit(spark, Seq((3L, "c")).toDF("id", "v"),
      src, append = true)
    Snapshots.commit(spark, Seq((4L, "d")).toDF("id", "v"),
      src, append = true)
    val d1 = Mirror.mirrorAppends(spark, src, dst)
    assert(d1.contains(1L))
    assert(rowsOf(dst) ==
      Seq((1L, "a"), (2L, "b"), (3L, "c"), (4L, "d")))
    assert(Mirror.offsetOf(spark, dst).contains(2L),
      "the destination head's stamp must carry the source head version")
    // and again: caught up
    assert(Mirror.mirrorAppends(spark, src, dst).isEmpty)
  }

  test("a destination head without an offset stamp refuses — an " +
    "out-of-band commit must not be silently re-seeded over") {
    val (src, dst) = freshPair()
    Snapshots.commit(spark, Seq((1L, "a")).toDF("id", "v"),
      src, append = false)
    Snapshots.commit(spark, Seq((9L, "x")).toDF("id", "v"),
      dst, append = false) // no ts: not a mirror commit
    val e = intercept[IllegalArgumentException](
      Mirror.mirrorAppends(spark, src, dst))
    assert(e.getMessage.contains("offset stamp"))
  }

  test("a replace in the un-mirrored source interval refuses toward " +
    "reseed; reseed restores incremental polling") {
    val (src, dst) = freshPair()
    Snapshots.commit(spark, Seq((1L, "a"), (2L, "b")).toDF("id", "v"),
      src, append = false)
    assert(Mirror.mirrorAppends(spark, src, dst).contains(0L))
    // source compacts (replace lineage) — the appends feed cannot
    // express it
    Snapshots.optimize(spark, src, 1L << 30)
    val e = intercept[IllegalArgumentException](
      Mirror.mirrorAppends(spark, src, dst))
    assert(e.getMessage.contains("append lineage"))
    Mirror.reseed(spark, src, dst)
    assert(rowsOf(dst) == Seq((1L, "a"), (2L, "b")))
    // incremental polling resumes over the post-compaction lineage
    Snapshots.commit(spark, Seq((3L, "c")).toDF("id", "v"),
      src, append = true)
    assert(Mirror.mirrorAppends(spark, src, dst).nonEmpty)
    assert(rowsOf(dst) == Seq((1L, "a"), (2L, "b"), (3L, "c")))
  }

  test("CDC mirror replicates deletion-vector deletes the appends " +
    "feed cannot; an all-quiet interval mints nothing — never an " +
    "O(table) merge for zero net changes") {
    val (src, dst) = freshPair()
    Snapshots.commit(spark,
      (1L to 6L).map(i => (i, s"r$i")).toDF("id", "v"),
      src, append = false)
    assert(Mirror.mirrorChanges(spark, src, dst, Seq("id")).contains(0L))
    assert(rowsOf(dst) == (1L to 6L).map(i => (i, s"r$i")))

    // source deletes two rows (merge-on-read) and appends one
    Snapshots.deleteWhere(spark, src, col("id") <= 2L)
    Snapshots.commit(spark, Seq((7L, "r7")).toDF("id", "v"),
      src, append = true)
    assert(Mirror.mirrorChanges(spark, src, dst, Seq("id")).nonEmpty)
    assert(rowsOf(dst) == (3L to 7L).map(i => (i, s"r$i")),
      "the CDC mirror must replicate the deletes AND the insert")
    assert(Mirror.offsetOf(spark, dst) ==
      Snapshots.latestVersion(spark, src))

    // a metadata-only source commit (constraint add): zero net row
    // changes — the poll mints NOTHING (no stamp-only generation, no
    // empty data file); the offset re-resolves next poll
    val dstHead = Snapshots.latestVersion(spark, dst).get
    Snapshots.addConstraint(spark, src, "id_pos", "id > 0")
    assert(Mirror.mirrorChanges(spark, src, dst, Seq("id")).isEmpty,
      "an all-quiet poll must mint nothing")
    assert(Snapshots.latestVersion(spark, dst).contains(dstHead))
    assert(rowsOf(dst) == (3L to 7L).map(i => (i, s"r$i")))
    // real changes after the quiet gap ship normally — the interval
    // spans the metadata commit without tripping the lineage contract
    Snapshots.commit(spark, Seq((8L, "r8")).toDF("id", "v"),
      src, append = true)
    assert(Mirror.mirrorChanges(spark, src, dst, Seq("id")).nonEmpty)
    assert(rowsOf(dst) == (3L to 8L).map(i => (i, s"r$i")))
    assert(Mirror.offsetOf(spark, dst) ==
      Snapshots.latestVersion(spark, src))
  }

  test("a mirror poll's manifest cost is bounded by the generation, " +
    "not the history") {
    val (src, dst) = freshPair()
    Snapshots.commit(spark, Seq((1L, "r1")).toDF("id", "v"),
      src, append = false)
    (2L to 9L).foreach(i => Snapshots.commit(spark,
      Seq((i, s"r$i")).toDF("id", "v"), src, append = true))
    assert(Mirror.mirrorAppends(spark, src, dst).nonEmpty) // seed
    Snapshots.commit(spark, Seq((10L, "r10")).toDF("id", "v"),
      src, append = true)
    val m0 = Snapshots.manifestReads.get
    val r0 = Snapshots.manifestRowsCollected.get
    assert(Mirror.mirrorAppends(spark, src, dst).nonEmpty)
    val reads = Snapshots.manifestReads.get - m0
    // offset resolve (timeline meta: O(generations) ROWS but version+
    // stamp only), interval endpoints, the append commit's own
    // reconciliation — all version-bounded reads; the poll must never
    // mergeSchema-scan the whole per-file history
    assert(reads <= 8,
      s"a mirror poll took $reads manifest reads — expected a " +
        "constant-bounded resolution")
    val rows = Snapshots.manifestRowsCollected.get - r0
    assert(rows <= 60,
      s"a mirror poll collected $rows manifest rows over a 10-version/" +
        "10-file table — history-times-files resolution would dominate " +
        "at scale")
    assert(rowsOf(dst) == (1L to 10L).map(i => (i, s"r$i")))
  }

  test("crashed poll replays exactly-once: a claim burned between the " +
    "data write and the publish leaves the offset unmoved, and the " +
    "retry ships the same delta once") {
    val (src, dst) = freshPair()
    Snapshots.commit(spark, Seq((1L, "a")).toDF("id", "v"),
      src, append = false)
    assert(Mirror.mirrorAppends(spark, src, dst).contains(0L))
    Snapshots.commit(spark, Seq((2L, "b")).toDF("id", "v"),
      src, append = true)
    // simulate the crash window: burn the next claim marker the way a
    // committer that died between its data write and its publish would
    // (_commits/v1 exists, gen-v1 never published)
    val f = new org.apache.hadoop.fs.Path(dst)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    f.create(new org.apache.hadoop.fs.Path(s"$dst/_commits/v1"),
      false).close()
    val got = Mirror.mirrorAppends(spark, src, dst)
    assert(got.contains(2L),
      "the retry must claim ABOVE the burned number (benign gap)")
    assert(rowsOf(dst) == Seq((1L, "a"), (2L, "b")),
      "the delta must appear exactly once after the crashed claim")
    assert(Mirror.mirrorAppends(spark, src, dst).isEmpty)
  }
}
