package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.operators.{Catalog, Snapshots}

/** Branches — writable isolated lineages ([[Snapshots.createBranch]]):
  * main readers never see branch commits, the branch is a full
  * snapshot table, [[Snapshots.fastForward]] publishes atomically and
  * refuses when main diverged, and SQL travels to a branch head via
  * `VERSION AS OF '<name>'`. Write-audit-publish at lineage scope. */
class SnapshotBranchSpec extends SparkSuite {
  import spark.implicits._

  private def freshTable(): String = {
    val p = Files.createTempDirectory("snap_branch_").toString + "/tbl"
    Snapshots.init(spark, p)
    p
  }

  test("branch commits are INVISIBLE to main until fastForward; the " +
    "publish is one metadata generation carrying the branch's face") {
    val tbl = freshTable()
    Snapshots.commit(spark,
      Seq((1L, "a"), (2L, "b")).toDF("id", "v"), tbl, append = false)
    Snapshots.createBranch(spark, tbl, "dev")
    val bRoot = Snapshots.branchPath(tbl, "dev")
    // two staged commits on the branch — WAP at lineage scope
    Snapshots.commit(spark, Seq((3L, "c")).toDF("id", "v"),
      bRoot, append = true)
    Snapshots.commit(spark, Seq((4L, "d")).toDF("id", "v"),
      bRoot, append = true)
    assert(Snapshots.latestVersion(spark, tbl).contains(0L),
      "main's head must not move while the branch stages")
    assert(Snapshots.readAsOf(spark, tbl, 0L).count() == 2L)
    assert(Snapshots.readBranch(spark, tbl, "dev").count() == 4L,
      "the audit face is the branch head")
    assert(Snapshots.branches(spark, tbl).map(b => (b._1, b._2)) ==
      Seq(("dev", 0L)))
    val v = Snapshots.fastForward(spark, tbl, "dev")
    assert(v == 1L)
    assert(Snapshots.readAsOf(spark, tbl, v)
      .select("id").as[Long].collect().sorted.toSeq ==
      Seq(1L, 2L, 3L, 4L))
    assert(Snapshots.readAsOf(spark, tbl, 0L).count() == 2L,
      "history below the publish is untouched")
    // the fork marker advanced: the branch stays usable for the next
    // audit cycle
    Snapshots.commit(spark, Seq((5L, "e")).toDF("id", "v"),
      bRoot, append = true)
    val v2 = Snapshots.fastForward(spark, tbl, "dev")
    assert(v2 == 2L &&
      Snapshots.readAsOf(spark, tbl, v2).count() == 5L)
  }

  test("fastForward REFUSES when main moved past the fork; dropBranch " +
    "refuses while main references branch files, then succeeds after " +
    "optimize + vacuum") {
    val tbl = freshTable()
    Snapshots.commit(spark,
      Seq((1L, "a")).toDF("id", "v"), tbl, append = false)
    Snapshots.createBranch(spark, tbl, "risky")
    Snapshots.commit(spark, Seq((2L, "b")).toDF("id", "v"),
      Snapshots.branchPath(tbl, "risky"), append = true)
    // main moves independently → the branch's fast-forward must refuse
    Snapshots.commit(spark, Seq((9L, "z")).toDF("id", "v"),
      tbl, append = true)
    val e = intercept[IllegalArgumentException] {
      Snapshots.fastForward(spark, tbl, "risky")
    }
    assert(e.getMessage.contains("main moved"))
    // an unpublished branch drops cleanly
    assert(Snapshots.dropBranch(spark, tbl, "risky"))
    assert(!Snapshots.dropBranch(spark, tbl, "risky"))
    // published-branch files are pinned: dropBranch refuses
    Snapshots.createBranch(spark, tbl, "merged")
    Snapshots.commit(spark, Seq((3L, "c")).toDF("id", "v"),
      Snapshots.branchPath(tbl, "merged"), append = true)
    Snapshots.fastForward(spark, tbl, "merged")
    val pinned = intercept[IllegalArgumentException] {
      Snapshots.dropBranch(spark, tbl, "merged")
    }
    assert(pinned.getMessage.contains("fast-forwarded"))
    // rewrite main's head under its own data/, expire the pointers,
    // and the drop goes through
    Snapshots.optimize(spark, tbl, 128L << 20)
    Snapshots.vacuum(spark, tbl,
      Snapshots.latestVersion(spark, tbl).get)
    assert(Snapshots.dropBranch(spark, tbl, "merged"))
    assert(Snapshots.readAsOf(spark, tbl,
      Snapshots.latestVersion(spark, tbl).get)
      .select("id").as[Long].collect().sorted.toSeq == Seq(1L, 3L, 9L))
  }

  test("a branch carries the FULL snapshot contract: deletes on the " +
    "branch publish as the branch's DV face, constraints transfer") {
    val tbl = freshTable()
    Snapshots.commit(spark,
      Seq((1L, 10L), (2L, 20L), (3L, 30L)).toDF("id", "amt"),
      tbl, append = false)
    Snapshots.createBranch(spark, tbl, "dv")
    val bRoot = Snapshots.branchPath(tbl, "dv")
    Snapshots.deleteWhere(spark, bRoot, col("id") === 2L)
    Snapshots.addConstraint(spark, bRoot, "amt_pos", "amt >= 0")
    assert(Snapshots.readAsOf(spark, tbl, 0L).count() == 3L,
      "main must not see the branch's delete")
    val v = Snapshots.fastForward(spark, tbl, "dv")
    assert(Snapshots.readAsOf(spark, tbl, v)
      .select("id").as[Long].collect().sorted.toSeq == Seq(1L, 3L),
      "the published face carries the branch's deletion vectors")
    assert(Snapshots.constraintsAsOf(spark, tbl, v)
      .exists(_._1 == "amt_pos"),
      "the branch's constraints govern main after the publish")
    val bad = intercept[Exception] {
      Snapshots.commit(spark, Seq((4L, -1L)).toDF("id", "amt"),
        tbl, append = true)
    }
    assert(bad.getMessage.contains("amt_pos"))
  }

  test("SQL: VERSION AS OF '<branch>' serves the branch head; the " +
    "create_branch / fast_forward / drop_branch procedures run the " +
    "WAP loop from SQL") {
    val root = Files.createTempDirectory("graft_brsql_").toString
    val tbl = s"$root/storage/t"
    Snapshots.init(spark, tbl)
    Snapshots.commit(spark,
      Seq((1L, "a"), (2L, "b")).toDF("id", "v"), tbl, append = false)
    Catalog.register(spark, root, "t", tbl)
    val cat = "gbrspec"
    spark.conf.set(s"spark.sql.catalog.$cat", "graft.sources.v2.GraftCatalog")
    spark.conf.set(s"spark.sql.catalog.$cat.root", root)
    val created = spark.sql(s"CALL $cat.system.create_branch('t', 'wap')")
      .collect().head
    val bRoot = created.getString(2)
    // stage through the branch root (register it like any table for a
    // SQL write face, or commit via the library — both are the branch)
    Snapshots.commit(spark, Seq((3L, "c")).toDF("id", "v"),
      bRoot, append = true)
    assert(spark.sql(s"SELECT count(*) FROM $cat.t").head().getLong(0) == 2L)
    assert(spark.sql(s"SELECT count(*) FROM $cat.t VERSION AS OF 'wap'")
      .head().getLong(0) == 3L,
      "VERSION AS OF '<branch>' must serve the branch head")
    val ff = spark.sql(s"CALL $cat.system.fast_forward('t', 'wap')")
      .collect().head
    assert(ff.getLong(1) == 1L)
    assert(spark.sql(s"SELECT count(*) FROM $cat.t").head().getLong(0) == 3L)
    // drop refuses while pinned (from SQL too)
    val refused = scala.util.Try(
      spark.sql(s"CALL $cat.system.drop_branch('t', 'wap')").collect())
    assert(refused.isFailure &&
      refused.failed.get.getMessage.contains("fast-forwarded"))
    // the .branches metadata table serves the live listing: the fork
    // marker advanced to the published version
    assert(spark.sql(
      s"SELECT branch, fork_version, head_version FROM $cat.t.branches")
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
      .toSeq == Seq(("wap", 1L, 1L)))
  }

  test("the branch's WRITABLE SQL face (<t>.branch_<name>): INSERT, " +
    "UPDATE and SELECT hit the branch lineage; main stays put until " +
    "fast_forward") {
    val root = Files.createTempDirectory("graft_brw_").toString
    val tbl = s"$root/storage/w"
    Snapshots.init(spark, tbl)
    Snapshots.commit(spark,
      Seq((1L, 10L), (2L, 20L)).toDF("id", "amt"), tbl, append = false)
    Catalog.register(spark, root, "w", tbl)
    val cat = "gbrw"
    spark.conf.set(s"spark.sql.catalog.$cat", "graft.sources.v2.GraftCatalog")
    spark.conf.set(s"spark.sql.catalog.$cat.root", root)
    spark.sql(s"CALL $cat.system.create_branch('w', 'stage')")
    spark.sql(s"INSERT INTO $cat.w.branch_stage VALUES (3, 30)")
    spark.sql(s"UPDATE $cat.w.branch_stage SET amt = 99 WHERE id = 1")
    assert(spark.sql(s"SELECT count(*) FROM $cat.w").head().getLong(0) == 2L,
      "main must not see SQL writes to the branch face")
    assert(spark.sql(
      s"SELECT id, amt FROM $cat.w.branch_stage ORDER BY id")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq ==
      Seq((1L, 99L), (2L, 20L), (3L, 30L)),
      "the branch face serves the staged lineage")
    spark.sql(s"CALL $cat.system.fast_forward('w', 'stage')")
    assert(spark.sql(s"SELECT id, amt FROM $cat.w ORDER BY id")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq ==
      Seq((1L, 99L), (2L, 20L), (3L, 30L)),
      "fast_forward publishes the whole staged lineage")
  }

  test("branch vacuum/removeOrphans are PARENT-SAFE: files a " +
    "fast-forward published into main never die with the branch's " +
    "own generations") {
    val tbl = freshTable()
    Snapshots.commit(spark,
      Seq((1L, "a")).toDF("id", "v"), tbl, append = false)
    Snapshots.createBranch(spark, tbl, "pub")
    val bRoot = Snapshots.branchPath(tbl, "pub")
    Snapshots.commit(spark, Seq((2L, "b")).toDF("id", "v"),
      bRoot, append = true)
    val v = Snapshots.fastForward(spark, tbl, "pub")
    // the branch moves on: a replace drops its earlier generations'
    // claim on the published file
    Snapshots.commit(spark, Seq((9L, "z")).toDF("id", "v"),
      bRoot, append = false)
    Snapshots.vacuum(spark, bRoot,
      Snapshots.latestVersion(spark, bRoot).get)
    Snapshots.removeOrphans(spark, bRoot, 0L)
    // main's published face must still read back whole
    assert(Snapshots.readAsOf(spark, tbl, v)
      .select("id").as[Long].collect().sorted.toSeq == Seq(1L, 2L),
      "the fast-forwarded file must survive the branch's own " +
        "destructive verbs")
  }

  test("Catalog.maintain sweeps BRANCHES too: a DV-pressured staged " +
    "branch compacts under the table's own props") {
    val root = Files.createTempDirectory("graft_brmaint_").toString
    val tbl = s"$root/storage/m"
    Snapshots.init(spark, tbl)
    Snapshots.commit(spark,
      (1L to 10L).map(i => (i, s"r$i")).toDF("id", "v"),
      tbl, append = false)
    Catalog.register(spark, root, "m", tbl,
      Map("dv_compact_at" -> "0.1"))
    Snapshots.createBranch(spark, tbl, "hot")
    val bRoot = Snapshots.branchPath(tbl, "hot")
    // stage a delete on the branch: 30% DV pressure there, none on main
    Snapshots.deleteWhere(spark, bRoot, col("id") <= 3L)
    val did = Catalog.maintain(spark, root).collect()
      .map(r => (r.getString(0), r.getString(1))).toSeq
    assert(did.contains(("m@hot", "optimize")),
      s"the branch sweep must compact the pressured branch, got $did")
    assert(!did.exists(d => d._1 == "m" && d._2 == "optimize"),
      "main itself carries no pressure — only the branch compacts")
    assert(Snapshots.readBranch(spark, tbl, "hot")
      .select("id").as[Long].collect().sorted.toSeq == (4L to 10L),
      "the compacted branch face keeps the staged delete")
  }

  test("fleet maintenance BOUNDS branch histories under the table's " +
    "retention: after the sweep the branch carries ≤ retain_versions " +
    "generations with its face intact, while main's history is " +
    "untouched — the budget that keeps an unswept staging branch " +
    "from accumulating generations forever") {
    val root = Files.createTempDirectory("graft_brret_").toString
    val tbl = s"$root/storage/r"
    Snapshots.init(spark, tbl)
    Snapshots.commit(spark, Seq((0L, "m")).toDF("id", "v"),
      tbl, append = false)
    Catalog.register(spark, root, "r", tbl,
      Map("retain_versions" -> "3"))
    Snapshots.createBranch(spark, tbl, "stage")
    val bRoot = Snapshots.branchPath(tbl, "stage")
    (1L to 8L).foreach(i => Snapshots.commit(spark,
      Seq((i, s"b$i")).toDF("id", "v"), bRoot, append = true))
    assert(Snapshots.listGenerations(spark, bRoot).length == 9)
    val did = Catalog.maintain(spark, root).collect()
      .map(r => (r.getString(0), r.getString(1))).toSeq
    assert(did.contains(("r@stage", "vacuum")),
      s"the sweep must expire the branch's history, got $did")
    val gens = Snapshots.listGenerations(spark, bRoot)
    assert(gens.length <= 3,
      s"branch history must be bounded by retain_versions=3, got " +
        s"${gens.length} generations")
    assert(Snapshots.readBranch(spark, tbl, "stage")
      .select("id").as[Long].collect().sorted.toSeq == (0L to 8L),
      "retention expires history, never the branch's face")
    assert(Snapshots.listGenerations(spark, tbl) == Seq(0L),
      "main's own history is not the branch's to expire")
  }

  test("main's vacuum and removeOrphans SPARE files a live branch " +
    "still references; dropping the branch releases them to the next " +
    "sweep") {
    val tbl = freshTable()
    Snapshots.commit(spark,
      Seq((1L, "a"), (2L, "b")).toDF("id", "v"), tbl, append = false)
    Snapshots.createBranch(spark, tbl, "audit")
    // main moves on: a replace commit writes fresh files, then main's
    // retention expires v0 — the version the branch forked from
    Snapshots.commit(spark,
      Seq((9L, "z")).toDF("id", "v"), tbl, append = false)
    Snapshots.vacuum(spark, tbl, keepFrom = 1L)
    Snapshots.removeOrphans(spark, tbl, olderThanMs = 0L)
    assert(Snapshots.readBranch(spark, tbl, "audit")
      .select("id").as[Long].collect().sorted.toSeq == Seq(1L, 2L),
      "the branch must keep reading its forked-from files after " +
        "main's retention expired them")
    // the guard is scoped to LIVE branches: dropping releases the
    // files, and the next orphan sweep reclaims the storage
    assert(Snapshots.dropBranch(spark, tbl, "audit"))
    assert(Snapshots.removeOrphans(spark, tbl, olderThanMs = 0L) > 0L,
      "post-drop, the spared files are ordinary orphans and must die")
  }
}
