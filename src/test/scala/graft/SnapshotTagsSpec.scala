package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.operators.{Catalog, Snapshots}

/** Tags — named version pointers ([[Snapshots.tag]]): time-travel by
  * name (library + SQL `VERSION AS OF '<tag>'`), the retention pin
  * against vacuum/expireSnapshots, retagging, and the `.tags`
  * metadata table. */
class SnapshotTagsSpec extends SparkSuite {
  import spark.implicits._

  private def freshTable(): String = {
    val p = Files.createTempDirectory("snap_tags_").toString + "/tbl"
    Snapshots.init(spark, p)
    p
  }

  private def seed2(tbl: String): Unit = {
    Snapshots.commit(spark,
      Seq((1L, "a"), (2L, "b")).toDF("id", "v"), tbl, append = false)
    Snapshots.commit(spark,
      Seq((9L, "z")).toDF("id", "v"), tbl, append = false)
  }

  test("tag / tags / tagVersion / readTag / removeTag round-trip; " +
    "retag repoints; bad names and unknown versions refuse") {
    val tbl = freshTable()
    seed2(tbl)
    Snapshots.tag(spark, tbl, "baseline", 0L)
    Snapshots.tag(spark, tbl, "rc-1.0", 1L)
    assert(Snapshots.tags(spark, tbl) ==
      Seq("baseline" -> 0L, "rc-1.0" -> 1L))
    assert(Snapshots.tagVersion(spark, tbl, "baseline").contains(0L))
    assert(Snapshots.readTag(spark, tbl, "baseline")
      .select("id").as[Long].collect().sorted.toSeq == Seq(1L, 2L))
    Snapshots.tag(spark, tbl, "baseline", 1L) // retag repoints
    assert(Snapshots.tagVersion(spark, tbl, "baseline").contains(1L))
    assert(Snapshots.removeTag(spark, tbl, "baseline"))
    assert(!Snapshots.removeTag(spark, tbl, "baseline"))
    assert(Snapshots.tagVersion(spark, tbl, "baseline").isEmpty)
    intercept[IllegalArgumentException] {
      Snapshots.readTag(spark, tbl, "baseline")
    }
    intercept[IllegalArgumentException] {
      Snapshots.tag(spark, tbl, "nope", 99L) // unknown version
    }
    intercept[IllegalArgumentException] {
      Snapshots.tag(spark, tbl, "a/b", 1L) // path fragment
    }
    // all-digit names are reserved for version numbers: SQL
    // `VERSION AS OF '7'` resolves the NUMBER first, so such a tag
    // would be permanently shadowed — refused at creation
    intercept[IllegalArgumentException] {
      Snapshots.tag(spark, tbl, "7", 1L)
    }
    intercept[IllegalArgumentException] {
      Snapshots.createBranch(spark, tbl, "123")
    }
  }

  test("a tag PINS its version: vacuum refuses, removeTag releases; " +
    "expireSnapshots applies the retain-last policy") {
    val tbl = freshTable()
    seed2(tbl)
    Snapshots.commit(spark, Seq((7L, "q")).toDF("id", "v"),
      tbl, append = false)
    Snapshots.tag(spark, tbl, "pinned", 0L)
    val e = intercept[IllegalArgumentException] {
      Snapshots.vacuum(spark, tbl, 1L)
    }
    assert(e.getMessage.contains("tagged"))
    // within policy (retain 3 of 3): no-op even with the tag
    assert(Snapshots.expireSnapshots(spark, tbl, 3)._2 == 0L)
    Snapshots.removeTag(spark, tbl, "pinned")
    val (keepFrom, deleted) = Snapshots.expireSnapshots(spark, tbl, 1)
    assert(keepFrom == 2L && deleted >= 2L,
      s"two replace eras' files must die, got ($keepFrom, $deleted)")
    intercept[Exception] { Snapshots.readAsOf(spark, tbl, 0L) }
    assert(Snapshots.readAsOf(spark, tbl, 2L)
      .select("id").as[Long].head() == 7L)
  }

  test("SQL: VERSION AS OF '<tag>' travels, .tags lists, and the " +
    "tag/remove_tag/expire_snapshots procedures run the loop") {
    val root = Files.createTempDirectory("graft_tagsql_").toString
    val tbl = s"$root/storage/t"
    Snapshots.init(spark, tbl)
    seed2(tbl)
    Catalog.register(spark, root, "t", tbl)
    val cat = "gtagspec"
    spark.conf.set(s"spark.sql.catalog.$cat", "graft.sources.v2.GraftCatalog")
    spark.conf.set(s"spark.sql.catalog.$cat.root", root)
    // CALL tag with default version = head (v1)
    val tagged = spark.sql(s"CALL $cat.system.tag('t', 'release')")
      .collect().head
    assert(tagged.getLong(2) == 1L)
    spark.sql(s"CALL $cat.system.tag('t', 'old', 0)")
    assert(spark.sql(s"SELECT id FROM $cat.t VERSION AS OF 'old'")
      .as[Long].collect().sorted.toSeq == Seq(1L, 2L))
    assert(spark.sql(s"SELECT id FROM $cat.t VERSION AS OF 'release'")
      .as[Long].collect().toSeq == Seq(9L))
    assert(spark.sql(s"SELECT tag, version FROM $cat.t.tags ORDER BY tag")
      .as[(String, Long)].collect().toSeq ==
      Seq(("old", 0L), ("release", 1L)))
    val err = intercept[Exception] {
      spark.sql(s"SELECT * FROM $cat.t VERSION AS OF 'ghost'").collect()
    }
    assert(err.getMessage.contains("no such tag") ||
      err.getMessage.contains("not a"))
    // the pin refuses from SQL too
    val refused = scala.util.Try(
      spark.sql(s"CALL $cat.system.expire_snapshots('t', 1)").collect())
    assert(refused.isFailure &&
      refused.failed.get.getMessage.contains("tagged"))
    val rm = spark.sql(s"CALL $cat.system.remove_tag('t', 'old')")
      .collect().head
    assert(rm.getBoolean(1))
    val exp = spark.sql(s"CALL $cat.system.expire_snapshots('t', 1)")
      .collect().head
    assert(exp.getLong(1) == 1L && exp.getLong(2) >= 1L)
    assert(spark.sql(s"SELECT id FROM $cat.t").as[Long].collect()
      .toSeq == Seq(9L))
  }
}
