package graft.operators

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._

/** Snapshot versioning over plain parquet — the time-travel /
  * MVCC-lite layer that completes the lakehouse maintenance family
  * ([[IncrementalJoin]] delta maintenance, [[Compaction]] rewrites,
  * [[Skipping]] manifest pruning, [[graft.plans.MvRewrite]] MV
  * redirection): every commit is immutable data files plus a manifest
  * generation listing the FULL file set of that snapshot, so any past
  * version reads back byte-identically until vacuumed.
  *
  * Why a full file list per generation (Iceberg's manifest shape)
  * rather than a delta log (Delta's): reading version v needs no
  * replay — one small manifest filter answers "which files ARE
  * snapshot v", which is O(files of v) regardless of history length.
  * At 100 TB the manifest is metadata-scale (a row per data file per
  * generation, kilobytes per commit), and append-mode commits SHARE
  * the parent's files — only the new rows' files are written, the
  * manifest rows are duplicated pointers, not data.
  *
  * Concurrency contract: single-writer (commits read latest version
  * then write version+1; racing writers would mint the same version).
  * A production deployment serializes commits through a catalog swap —
  * the same boundary [[Compaction]]'s scaladoc draws. Readers never
  * block: snapshots are immutable and vacuum only deletes files no
  * retained generation references.
  */
object Snapshots {

  private val DataDir = "data"
  private val VersionsDir = "_versions"

  private def fs(spark: SparkSession, path: String) =
    new Path(path).getFileSystem(spark.sparkContext.hadoopConfiguration)

  /** Wipe the table root — a fresh snapshot lineage. (Harness queries
    * rebuild their fixture lineage per run; real tables call this
    * never.) */
  def init(spark: SparkSession, tablePath: String): Unit = {
    val f = fs(spark, tablePath)
    val p = new Path(tablePath)
    if (f.exists(p)) f.delete(p, true)
  }

  /** Data files (no `_*` markers) directly under `dir`, as URI
    * strings — the unit the manifest tracks. */
  private def listDataFiles(
      spark: SparkSession,
      dir: String): Seq[String] = {
    val f = fs(spark, dir)
    f.listStatus(new Path(dir))
      .filter(s => s.isFile && !s.getPath.getName.startsWith("_"))
      .map(_.getPath.toString)
      .toSeq
      .sorted
  }

  /** The manifest frame: one row per (version, file). Empty (with the
    * right schema) when the table has no commits yet. The `_`-prefixed
    * manifest dir hides it from any scan of the TABLE root (the
    * `_delta_log` convention), so it is read here by its listed part
    * files — passing the hidden dir itself as a read root trips
    * Spark's hidden-path filter (warning today, possibly an error in a
    * future release). */
  def manifest(spark: SparkSession, tablePath: String): DataFrame = {
    val dir = s"$tablePath/$VersionsDir"
    val parts =
      if (fs(spark, tablePath).exists(new Path(dir)))
        listDataFiles(spark, dir)
      else Seq.empty
    if (parts.nonEmpty)
      spark.read.parquet(parts: _*)
    else {
      import org.apache.spark.sql.types._
      spark.createDataFrame(spark.sparkContext.emptyRDD[Row],
        StructType(Seq(StructField("version", LongType, nullable = false),
          StructField("file", StringType, nullable = false))))
    }
  }

  /** Latest committed version, or None for an empty table. Driver-side
    * over the metadata-scale manifest. */
  def latestVersion(spark: SparkSession, tablePath: String): Option[Long] = {
    val m = manifest(spark, tablePath).agg(max(col("version"))).head()
    if (m.isNullAt(0)) None else Some(m.getLong(0))
  }

  private def manifestFiles(
      spark: SparkSession,
      tablePath: String,
      version: Long): Seq[String] =
    manifest(spark, tablePath)
      .filter(col("version") === version)
      .select(col("file")).collect().map(_.getString(0)).toSeq

  /** Commit `df` as the next version. `append = true` makes the new
    * snapshot the parent's files PLUS the newly written ones (no data
    * rewritten — the O(delta) fast path); `append = false` makes it
    * exactly the newly written files (replace: corrections, deletes,
    * compactions). Returns the minted version. */
  def commit(
      spark: SparkSession,
      df: DataFrame,
      tablePath: String,
      append: Boolean): Long = {
    val version = latestVersion(spark, tablePath).map(_ + 1L).getOrElse(0L)
    val dataPath = s"$tablePath/$DataDir/v$version"
    df.write.mode("errorifexists").parquet(dataPath)
    val fresh = listDataFiles(spark, dataPath)
    val parent =
      if (append && version > 0L)
        manifestFiles(spark, tablePath, version - 1L)
      else Seq.empty
    val rows = (parent ++ fresh).map(f => (version, f))
    spark.createDataFrame(rows).toDF("version", "file")
      .coalesce(1)
      .write.mode("append").parquet(s"$tablePath/$VersionsDir")
    version
  }

  /** Read snapshot `version` — exactly the files its manifest
    * generation lists. Loud when the version is unknown (never
    * committed, or vacuumed away). */
  def readAsOf(
      spark: SparkSession,
      tablePath: String,
      version: Long): DataFrame = {
    val files = manifestFiles(spark, tablePath, version)
    require(files.nonEmpty,
      s"snapshot version $version of $tablePath is not in the manifest " +
        "(never committed, or expired by vacuum)")
    spark.read.parquet(files: _*)
  }

  /** Expire every version below `keepFrom`: drop their manifest
    * generations, then delete the data files no retained generation
    * references. Returns the number of files deleted. The manifest
    * rewrite stages through a sibling directory and swaps by rename so
    * a crash leaves either the old or the new manifest, never a
    * half-written one. */
  def vacuum(
      spark: SparkSession,
      tablePath: String,
      keepFrom: Long): Long = {
    val m = manifest(spark, tablePath)
    val keptRows = m.filter(col("version") >= keepFrom)
      .select(col("version"), col("file")).collect()
    require(keptRows.nonEmpty,
      s"vacuum(keepFrom=$keepFrom) would retain no versions of $tablePath")
    val kept = keptRows.map(_.getString(1)).toSet
    val all = m.select(col("file")).distinct().collect()
      .map(_.getString(0))
    val doomed = all.filterNot(kept)
    // resolved BEFORE the manifest swap below — `m` reads the live
    // manifest lazily, and post-swap the dropped generations are gone
    val droppedVersions =
      m.select(col("version")).distinct().collect().map(_.getLong(0))
        .filter(_ < keepFrom)

    val f = fs(spark, tablePath)
    val live = new Path(s"$tablePath/$VersionsDir")
    val staged = new Path(s"$tablePath/${VersionsDir}_staged")
    if (f.exists(staged)) f.delete(staged, true)
    spark.createDataFrame(
      keptRows.toSeq.map(r => (r.getLong(0), r.getString(1))))
      .toDF("version", "file")
      .coalesce(1)
      .write.parquet(staged.toString)
    f.delete(live, true)
    require(f.rename(staged, live),
      s"manifest swap failed for $tablePath — staged manifest left at " +
        s"$staged, data files untouched")

    doomed.foreach(file => f.delete(new Path(file), false))

    // stats manifests ride their version: expired generations' stats
    // dirs go with their data (retained versions keep theirs)
    droppedVersions.foreach { v =>
      val sd = new Path(statsDir(tablePath, v))
      if (f.exists(sd)) f.delete(sd, true)
    }
    doomed.length.toLong
  }

  private def statsDir(tablePath: String, version: Long): String =
    s"$tablePath/_stats/v$version"

  /** [[commit]] with the physical layout that makes snapshots CHEAP to
    * query selectively — the Iceberg read path over plain parquet:
    * the batch is range-clustered on `keyCol` into `numFiles` tight-
    * interval files ([[Skipping.writeClustered]]'s layout), and a
    * per-file min/max stats manifest for the WHOLE snapshot is
    * persisted beside the version (append commits reuse the parent's
    * stats rows — only the new files are ever re-scanned for stats).
    * [[scanRangeAsOf]] then plans a key-range read AS OF any version
    * over only the admitted files: time travel × data skipping
    * multiply. */
  def commitClustered(
      spark: SparkSession,
      df: DataFrame,
      tablePath: String,
      keyCol: String,
      numFiles: Int,
      append: Boolean): Long = {
    require(numFiles >= 1, "numFiles must be positive")
    val clustered = df
      .repartitionByRange(numFiles, col(keyCol))
      .sortWithinPartitions(col(keyCol))
    val version = commit(spark, clustered, tablePath, append)
    val fresh = manifest(spark, tablePath)
      .filter(col("version") === version)
      .select(col("file")).collect().map(_.getString(0))
      .filter(_.contains(s"/$DataDir/v$version/"))
    val freshStats = spark.read.parquet(fresh.toIndexedSeq: _*)
      .groupBy(input_file_name().as("file"))
      .agg(count(lit(1)).as("n_rows"),
        min(col(keyCol)).as(s"min_$keyCol"),
        max(col(keyCol)).as(s"max_$keyCol"))
    val stats =
      if (append && version > 0L)
        spark.read.parquet(statsDir(tablePath, version - 1L))
          .unionByName(freshStats)
      else freshStats
    stats.coalesce(1).write.mode("errorifexists")
      .parquet(statsDir(tablePath, version))
    version
  }

  /** Stats-pruned key-range scan AS OF `version`: the version's stats
    * manifest admits only the files whose [min, max] interval meets
    * [lo, hi]; the exact row filter clears file-level false positives
    * (stats are necessary, not sufficient). Zero admitted files is an
    * answer (empty frame with the snapshot's schema), a missing stats
    * manifest (version unknown, vacuumed, or committed without
    * clustering) is an error. */
  def scanRangeAsOf(
      spark: SparkSession,
      tablePath: String,
      version: Long,
      keyCol: String,
      lo: Any,
      hi: Any): DataFrame = {
    val sd = statsDir(tablePath, version)
    require(fs(spark, tablePath).exists(new Path(sd)),
      s"no stats manifest for version $version of $tablePath — not " +
        "committed via commitClustered, or expired by vacuum")
    val admitted = spark.read.parquet(sd)
      .filter(col(s"max_$keyCol") >= lit(lo) && col(s"min_$keyCol") <= lit(hi))
      .select(col("file")).collect().map(_.getString(0)).toIndexedSeq
    val base =
      if (admitted.isEmpty)
        spark.createDataFrame(spark.sparkContext.emptyRDD[Row],
          readAsOf(spark, tablePath, version).schema)
      else spark.read.parquet(admitted: _*)
    base.filter(col(keyCol) >= lit(lo) && col(keyCol) <= lit(hi))
  }

  /** OPTIMIZE: rewrite the latest snapshot's many small files into
    * `ceil(bytes / targetBytes)` uniform ones and commit the result as
    * a REPLACE version — [[Compaction]]'s rewrite inside the snapshot
    * lineage, which is how a versioned table compacts safely: readers
    * of older versions keep their immutable files, the new version
    * carries identical rows in scan-efficient files, and the small
    * files die later via [[vacuum]] once no retained generation
    * references them (never in place). Returns the minted version. */
  def optimize(
      spark: SparkSession,
      tablePath: String,
      targetBytes: Long): Long = {
    require(targetBytes > 0, "targetBytes must be positive")
    val latest = latestVersion(spark, tablePath).getOrElse(
      throw new IllegalArgumentException(
        s"optimize: $tablePath has no committed versions"))
    val files = manifestFiles(spark, tablePath, latest)
    val f = fs(spark, tablePath)
    val bytes = files.map(p => f.getFileStatus(new Path(p)).getLen).sum
    val n = math.max(1L, (bytes + targetBytes - 1) / targetBytes).toInt
    commit(spark, spark.read.parquet(files: _*).repartition(n),
      tablePath, append = false)
  }

  /** Multiset diff between two snapshots: rows only in `newVersion`
    * tagged `'+'`, rows only in `oldVersion` tagged `'-'` — the audit
    * frame for "what did this commit change". `exceptAll` keeps
    * duplicate multiplicity (a row appearing 3× old / 1× new yields
    * two `'-'` rows), matching SQL `EXCEPT ALL`. */
  def diff(
      spark: SparkSession,
      tablePath: String,
      oldVersion: Long,
      newVersion: Long): DataFrame = {
    val o = readAsOf(spark, tablePath, oldVersion)
    val n = readAsOf(spark, tablePath, newVersion)
    n.exceptAll(o).withColumn("change", lit("+"))
      .unionByName(o.exceptAll(n).withColumn("change", lit("-")))
  }
}
