package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.operators.{Catalog, Snapshots}

/** The named catalog over snapshot tables: name→root resolution with
  * per-table properties, loud unknowns, O(1) metadata re-pointing, and
  * the fleet-wide maintenance sweep that closes the DV-growth-trigger
  * loop ([[Catalog.maintenance]] recommends, [[Catalog.maintain]]
  * executes). */
class CatalogSpec extends SparkSuite {
  import spark.implicits._

  private def freshRoot(): String =
    Files.createTempDirectory("catalog_").toString

  test("register/resolve/table: names resolve to roots, unknown names " +
    "refuse with the known set, re-pointing is metadata-only") {
    val cat = freshRoot()
    val t1 = s"$cat/storage/t1"; val t2 = s"$cat/storage/t2"
    Snapshots.init(spark, t1); Snapshots.init(spark, t2)
    Snapshots.commit(spark, Seq((1L, "a")).toDF("id", "v"),
      t1, append = false)
    Snapshots.commit(spark, Seq((2L, "b")).toDF("id", "v"),
      t2, append = false)
    Catalog.register(spark, cat, "events", t1,
      Map("owner" -> "pipeline-a"))
    Catalog.register(spark, cat, "users", t2)
    assert(Catalog.resolve(spark, cat, "events") == t1)
    assert(Catalog.table(spark, cat, "users")
      .select($"v").as[String].collect().toSeq == Seq("b"))
    val e = intercept[IllegalArgumentException](
      Catalog.resolve(spark, cat, "ghost"))
    assert(e.getMessage.contains("events") &&
      e.getMessage.contains("users"),
      "an unknown name must name the known set")
    // re-point the NAME; neither table's data moves
    Catalog.register(spark, cat, "events", t2)
    assert(Catalog.table(spark, cat, "events")
      .select($"v").as[String].collect().toSeq == Seq("b"))
    assert(Snapshots.readAsOf(spark, t1, 0L).count() == 1L,
      "re-pointing must not touch the old root")
    // drop removes the NAME only
    Catalog.dropTable(spark, cat, "events")
    intercept[IllegalArgumentException](
      Catalog.resolve(spark, cat, "events"))
    assert(Snapshots.readAsOf(spark, t2, 0L).count() == 1L)
    // properties merge, survive re-publication
    Catalog.alterProperties(spark, cat, "users",
      Map("retain_versions" -> "2"))
    assert(Catalog.entries(spark, cat)("users").props ==
      Map("retain_versions" -> "2"))
  }

  test("maintenance sweep: the DV gauge and retention surface per " +
    "table; maintain() compacts the pressured table and vacuums past " +
    "retention, leaving the healthy one untouched") {
    val cat = freshRoot()
    val hot = s"$cat/storage/hot"; val cold = s"$cat/storage/cold"
    Snapshots.init(spark, hot); Snapshots.init(spark, cold)
    Snapshots.commit(spark,
      (1L to 100L).map(i => (i, s"r$i")).toDF("id", "v"),
      hot, append = false)
    Snapshots.deleteWhere(spark, hot, col("id") <= 20L) // 20% pressure
    (0 until 4).foreach { i =>
      Snapshots.commit(spark, Seq((i.toLong, "x")).toDF("id", "v"),
        cold, append = if (i > 0) true else false)
    }
    Catalog.register(spark, cat, "hot", hot,
      Map("dv_compact_at" -> "0.1"))
    Catalog.register(spark, cat, "cold", cold,
      Map("retain_versions" -> "2"))
    val rec = Catalog.maintenance(spark, cat).collect()
      .map(r => r.getString(0) -> r).toMap
    assert(rec("hot").getBoolean(4), "20% DV pressure must flag compact")
    assert(rec("hot").isNullAt(5), "no retention set on hot")
    assert(!rec("cold").getBoolean(4))
    assert(rec("cold").getLong(5) == 2L,
      "retain 2 of versions 0..3 → vacuum keepFrom 2")
    val did = Catalog.maintain(spark, cat).collect()
      .map(r => (r.getString(0), r.getString(1))).toSet
    assert(did == Set(("hot", "optimize"), ("cold", "vacuum")),
      s"wrong actions: $did")
    // the loop is closed: a second sweep finds a healthy fleet
    val after = Catalog.maintenance(spark, cat).collect()
      .map(r => r.getString(0) -> r).toMap
    assert(!after("hot").getBoolean(4),
      "optimize must clear the deletion pressure")
    assert(after("cold").getLong(1) == 2L &&
      Snapshots.countAsOf(spark, cold,
        Snapshots.latestVersion(spark, cold).get) == 4L,
      "vacuum keeps the newest two versions and the head face intact")
    assert(Catalog.maintain(spark, cat).isEmpty,
      "a healthy fleet takes no actions")
    // the compacted table still answers correctly
    assert(Catalog.table(spark, cat, "hot").count() == 80L)
  }

  test("eq-tombstone pressure gauge + auto-fold: a 10-sync MOR table " +
    "crosses eq_fold_at, the sweep folds it (keys read off the " +
    "sidecar), a second sweep is quiet, and the folded face answers " +
    "the resolved rows") {
    val cat = freshRoot()
    val mor = s"$cat/storage/mor"
    Snapshots.init(spark, mor)
    Snapshots.commit(spark,
      (1L to 50L).map(i => (i, s"r$i")).toDF("id", "v"),
      mor, append = false)
    // 10 CDC syncs, each re-upserting two keys (tombstone + fresh row)
    (0 until 10).foreach { s =>
      val k1 = (s * 2 + 1).toLong; val k2 = (s * 2 + 2).toLong
      Snapshots.commitEqUpsert(spark, mor,
        upserts = Seq((k1, s"u$s-a"), (k2, s"u$s-b")).toDF("id", "v"),
        tombstones = Seq(k1, k2).toDF("id"), keyCols = Seq("id"))
    }
    Catalog.register(spark, cat, "mor", mor,
      Map("eq_fold_at" -> "0.1"))
    val rec = Catalog.maintenance(spark, cat).collect()
      .map(r => r.getString(0) -> r).toMap
    assert(rec("mor").getDouble(6) > 0.1 && rec("mor").getBoolean(7),
      s"20 tombstones / 70 physical rows must flag fold_due: " +
        s"${rec("mor").getDouble(6)}")
    assert(!rec("mor").getBoolean(4),
      "an eq-governed head must gauge EQ pressure, not the DV gauge")

    val did = Catalog.maintain(spark, cat).collect()
      .map(r => (r.getString(0), r.getString(1))).toSet
    assert(did.contains(("mor", "fold")), s"wrong actions: $did")
    // the loop is closed: pressure cleared, second sweep takes nothing
    val after = Catalog.maintenance(spark, cat).collect()
      .map(r => r.getString(0) -> r).toMap
    assert(after("mor").getDouble(6) == 0.0 && !after("mor").getBoolean(7),
      "the fold must clear the tombstone pressure")
    assert(!Catalog.maintain(spark, cat).collect()
      .exists(r => r.getString(0) == "mor"),
      "a folded table takes no further action")
    // the folded face = every key's LAST upsert, keys 21..50 untouched
    val face = Catalog.table(spark, cat, "mor")
    assert(face.count() == 50L)
    assert(face.filter(col("id") === 1L).select("v").as[String].head()
      == "u0-a", "the fold must materialize the resolved winners")
  }

  test("commitAtomic: N tables move together in ONE catalog publish — " +
    "a crash between the table commits leaves catalog readers on the " +
    "old consistent pair; a failed write pins nothing") {
    val cat = freshRoot()
    val fact = s"$cat/storage/fact"; val mv = s"$cat/storage/mv"
    Snapshots.init(spark, fact); Snapshots.init(spark, mv)
    Catalog.register(spark, cat, "fact", fact)
    Catalog.register(spark, cat, "mv", mv)
    // epoch 1: fact rows + their aggregate land as one atomic pair
    val v1 = Catalog.commitAtomic(spark, cat, Seq(
      ("fact", Seq((1L, 10L), (2L, 20L)).toDF("id", "x"), false),
      ("mv", Seq(("sum_x", 30L)).toDF("metric", "value"), false)))
    assert(v1 == Map("fact" -> 0L, "mv" -> 0L))
    assert(Catalog.table(spark, cat, "fact").count() == 2L)
    assert(Catalog.table(spark, cat, "mv")
      .select($"value").as[Long].head() == 30L)

    // the CRASH WINDOW: epoch 2's fact commit lands, the process dies
    // before the mv commit and the catalog publish — simulated by
    // doing exactly what commitAtomic does up to the crash point
    Snapshots.commit(spark, Seq((3L, 70L)).toDF("id", "x"),
      fact, append = true)
    // path-direct readers see the new fact generation…
    assert(Snapshots.readAsOf(spark, fact,
      Snapshots.latestVersion(spark, fact).get).count() == 3L)
    // …but CATALOG readers stay on the old CONSISTENT pair: fact still
    // answers epoch 1, matching the mv that was computed from it
    assert(Catalog.table(spark, cat, "fact").count() == 2L,
      "a torn cross-table commit must not surface through the catalog")
    assert(Catalog.table(spark, cat, "mv")
      .select($"value").as[Long].head() == 30L)
    assert(Catalog.tableVersion(spark, cat, "fact") == 0L)

    // the retry re-runs the whole epoch: the append BRANCHES OVER the
    // torn (never-pinned) generation — no double rows — and both pins
    // advance together
    val v2 = Catalog.commitAtomic(spark, cat, Seq(
      ("fact", Seq((3L, 70L)).toDF("id", "x"), true),
      ("mv", Seq(("sum_x", 100L)).toDF("metric", "value"), false)))
    assert(Catalog.table(spark, cat, "fact").count() == 3L,
      "the retry must not replay the torn generation's rows")
    assert(Catalog.table(spark, cat, "mv")
      .select($"value").as[Long].head() == 100L)
    assert(Catalog.tableVersion(spark, cat, "fact") == v2("fact"))

    // a REFUSED write inside the batch pins nothing: an illegal
    // schema retype aborts the fact commit — the mv table never
    // commits, the catalog view stays on epoch 2 whole
    intercept[Exception] {
      Catalog.commitAtomic(spark, cat, Seq(
        ("fact", Seq((4L, "oops")).toDF("id", "x"), true),
        ("mv", Seq(("sum_x", 99L)).toDF("metric", "value"), false)))
    }
    assert(Catalog.table(spark, cat, "fact").count() == 3L)
    assert(Catalog.table(spark, cat, "mv")
      .select($"value").as[Long].head() == 100L)
    // unknown names refuse BEFORE any table commits
    intercept[IllegalArgumentException] {
      Catalog.commitAtomic(spark, cat, Seq(
        ("ghost", Seq((1L, 1L)).toDF("id", "x"), false)))
    }
  }

  test("maintain survives a refusing table: the refusal is recorded " +
    "with its reason and the sweep continues to later tables") {
    val cat = freshRoot()
    val bad = s"$cat/storage/bad"; val cold = s"$cat/storage/cold"
    Snapshots.init(spark, bad); Snapshots.init(spark, cold)
    // bad: bloom-governed with a LEGACY keyless sidecar plus deletion
    // pressure — optimizePreserving cannot pick the rebuild key and
    // refuses
    Snapshots.commitBloom(spark,
      (1L to 100L).map(i => (i, s"r$i")).toDF("id", "v").repartition(4),
      bad, "id", append = false)
    Snapshots.deleteWhere(spark, bad, col("id") <= 20L)
    val f = new org.apache.hadoop.fs.Path(bad)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    val bloomDir = s"$bad/_bloom/v0"
    val keyless = spark.read.parquet(bloomDir).drop("key")
    keyless.coalesce(1).write.parquet(s"$bad/_bloom/tmp")
    assert(f.delete(new org.apache.hadoop.fs.Path(bloomDir), true))
    assert(f.rename(new org.apache.hadoop.fs.Path(s"$bad/_bloom/tmp"),
      new org.apache.hadoop.fs.Path(bloomDir)))
    // cold: healthy but past retention — it must still be vacuumed
    // AFTER bad's refusal ('bad' sorts first in the sweep)
    (0 until 4).foreach { i =>
      Snapshots.commit(spark, Seq((i.toLong, "x")).toDF("id", "v"),
        cold, append = i > 0)
    }
    Catalog.register(spark, cat, "bad", bad, Map("dv_compact_at" -> "0.1"))
    Catalog.register(spark, cat, "cold", cold,
      Map("retain_versions" -> "2"))
    val did = Catalog.maintain(spark, cat).collect()
      .map(r => (r.getString(0), r.getString(1), r.getString(2)))
    assert(did.map(d => (d._1, d._2)).toSet ==
      Set(("bad", "refused"), ("cold", "vacuum")),
      s"wrong sweep actions: ${did.toSeq}")
    assert(did.find(_._1 == "bad").get._3.contains("optimizeBloom"),
      "the refusal row must carry the reason")
    assert(Snapshots.listGenerations(spark, cold).length == 2,
      "the refusing table must not strand the rest of the fleet")
  }

  test("maintenance gauge isolation: ONE table whose eq gauge refuses " +
    "(legacy manifest without footer counts) reports NaN and the " +
    "sweep still serves every other table") {
    val cat = freshRoot()
    val mor = s"$cat/storage/mor"; val ok = s"$cat/storage/ok"
    Snapshots.init(spark, mor); Snapshots.init(spark, ok)
    Snapshots.commit(spark,
      (1L to 10L).map(i => (i, s"r$i")).toDF("id", "v"),
      mor, append = false)
    Snapshots.commitEqUpsert(spark, mor,
      upserts = Seq((1L, "u")).toDF("id", "v"),
      tombstones = Seq(1L).toDF("id"), keyCols = Seq("id"))
    Snapshots.commit(spark, Seq((1L, "a")).toDF("id", "v"),
      ok, append = false)
    // simulate a pre-row-count layout on the MOR table: rewrite each
    // live generation without the rows column, keeping the canonical
    // gen-v<N>.parquet names (eqStats then refuses 'recommit the
    // version' — exactly the per-table fault the sweep must isolate)
    val f = new org.apache.hadoop.fs.Path(mor)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    Snapshots.listGenerations(spark, mor).foreach { v =>
      val legacy = spark.read
        .parquet(s"$mor/_versions/gen-v$v.parquet").drop("rows")
      val tmp = s"$mor/_vtmp$v"
      legacy.coalesce(1).write.parquet(tmp)
      val part = new java.io.File(tmp).listFiles
        .filter(p => p.isFile && p.getName.endsWith(".parquet")).head
      assert(f.delete(new org.apache.hadoop.fs.Path(
        s"$mor/_versions/gen-v$v.parquet"), false))
      assert(f.rename(
        new org.apache.hadoop.fs.Path(part.getAbsolutePath),
        new org.apache.hadoop.fs.Path(
          s"$mor/_versions/gen-v$v.parquet")))
      assert(f.delete(new org.apache.hadoop.fs.Path(tmp), true))
    }
    Catalog.register(spark, cat, "mor", mor)
    Catalog.register(spark, cat, "ok", ok)
    intercept[IllegalArgumentException](Snapshots.eqStats(spark, mor))
    val rec = Catalog.maintenance(spark, cat).collect()
      .map(r => r.getString(0) -> r).toMap
    assert(rec.keySet == Set("mor", "ok"),
      "one refusing gauge must not take down the fleet poll surface")
    assert(rec("mor").getDouble(6).isNaN && !rec("mor").getBoolean(7),
      "the refusing table reports NaN, never a phantom fold_due")
    assert(rec("ok").getDouble(6) == 0.0 && !rec("ok").getBoolean(4),
      "the healthy table's row must be served as ever")
  }
}
