package graft

import java.nio.file.Files

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.Row

import graft.operators.Snapshots

/** The driver-side metadata writer ([[Snapshots.writeMetaParquet]]) —
  * the r21 optimization that took the per-commit manifest/sidecar/doc
  * writes off the Spark-job path. These pins hold it to the contract
  * the Spark-written files satisfied: same column names and Spark-read
  * types, null/Option round-trip, CREATE (errorifexists) semantics. */
class MetaWriteSpec extends SparkSuite {

  private def tmpDir(prefix: String): String =
    Files.createTempDirectory(prefix).toString

  test("writeMetaParquet round-trips manifest-shaped rows: longs, " +
    "strings, nulls and Options read back under Spark exactly") {
    val dir = tmpDir("graft_metawrite_")
    val dest = new Path(s"$dir/gen-v0.parquet")
    val cols = Seq("version" -> true, "file" -> false, "part" -> false,
      "schema_json" -> false, "rows" -> true, "commit_ts" -> true,
      "parent" -> true)
    val rows = Seq(
      Seq[Any](0L, "file:/a/p0.parquet", null, "{}", Some(10L),
        Some(1234L), None),
      Seq[Any](0L, "file:/a/p1.parquet", Some("k=1"), "{}", 7L, null,
        Some(5L)))
    Snapshots.writeMetaParquet(
      spark.sparkContext.hadoopConfiguration, dest, cols, rows)
    val df = spark.read.parquet(dest.toString)
    assert(df.columns.toSeq ===
      Seq("version", "file", "part", "schema_json", "rows", "commit_ts",
        "parent"))
    assert(df.schema.fields.map(_.dataType.typeName).toSeq ===
      Seq("long", "string", "string", "string", "long", "long", "long"))
    val got = df.orderBy("file").collect().toSeq
    assert(got === Seq(
      Row(0L, "file:/a/p0.parquet", null, "{}", 10L, 1234L, null),
      Row(0L, "file:/a/p1.parquet", "k=1", "{}", 7L, null, 5L)))
  }

  test("writeMetaParquet refuses an existing destination (the " +
    "errorifexists contract) and rejects non-long/string values loudly") {
    val dir = tmpDir("graft_metawrite_")
    val dest = new Path(s"$dir/doc.parquet")
    val cols = Seq("name" -> false, "root" -> false)
    Snapshots.writeMetaParquet(spark.sparkContext.hadoopConfiguration,
      dest, cols, Seq(Seq[Any]("t", "file:/r")))
    intercept[Exception] {
      Snapshots.writeMetaParquet(spark.sparkContext.hadoopConfiguration,
        dest, cols, Seq(Seq[Any]("t2", "file:/r2")))
    }
    intercept[IllegalArgumentException] {
      Snapshots.writeMetaParquet(spark.sparkContext.hadoopConfiguration,
        new Path(s"$dir/bad.parquet"), cols,
        Seq(Seq[Any]("t", java.math.BigDecimal.ONE)))
    }
  }

  test("a committed generation's manifest file is driver-written yet " +
    "reads back through the normal resolution path: commit, append, " +
    "read, time travel — and a checkpointed timeline still resolves") {
    val root = s"${tmpDir("graft_metawrite_tbl_")}/t"
    import spark.implicits._
    Snapshots.init(spark, root)
    val v0 = Snapshots.commit(spark,
      Seq((1L, "a"), (2L, "b")).toDF("id", "s"), root, append = false)
    val v1 = Snapshots.commit(spark,
      Seq((3L, "c")).toDF("id", "s"), root, append = true)
    assert(Snapshots.readAsOf(spark, root, v0).count() === 2)
    assert(Snapshots.readAsOf(spark, root, v1).count() === 3)
    // drive past the checkpoint interval so checkpointManifest's
    // driver-side write is exercised and the timeline read uses it
    spark.conf.set("graft.manifest.checkpointInterval", "4")
    try {
      (0 until 6).foreach { i =>
        Snapshots.commit(spark,
          Seq((100L + i, s"x$i")).toDF("id", "s"), root, append = true)
      }
      val head = Snapshots.latestVersion(spark, root).get
      assert(Snapshots.readAsOf(spark, root, head).count() === 9)
      // time travel below the checkpoint floor still answers
      assert(Snapshots.readAsOf(spark, root, v0).count() === 2)
    } finally spark.conf.unset("graft.manifest.checkpointInterval")
  }
}
