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
  * Concurrency contract: version numbers are minted by an ATOMIC
  * create-fails-if-exists claim on a per-version marker file
  * (`_commits/v<N>` via `FileSystem.create(path, overwrite=false)`).
  * That create is a true CAS on filesystems with atomic
  * create-if-absent — HDFS and the local FS, the deployments this
  * layer targets; on object stores (S3A) it degrades to
  * check-then-create, so object-store deployments must serialize
  * commits through a catalog or lock service instead. The claim is
  * retried upward on collision, so two racing committers always mint
  * DISTINCT versions and both survive. On top of the claim, the
  * publish tail RECONCILES lineage by commit class:
  *
  *  - APPEND commits rebase: at publish time the actual latest
  *    published head is re-read and becomes the new generation's
  *    parent file set (appends commute with anything that leaves the
  *    head current — racing appends stack, an append over a racing
  *    replace lands its rows in the post-replace table), verified by a
  *    post-publish check that publishes a corrective generation if a
  *    racer landed inside the check-to-publish window. The one rebase
  *    precondition is WRITE GOVERNANCE: the batch was generated,
  *    constraint-checked and physically translated under the observed
  *    head's constraint/column-mapping/generated-column sidecars, so
  *    if the moved head changed any of those, the append is refused
  *    with a retry-able [[ConcurrentCommitException]] (the retry
  *    re-prepares under the new governance).
  *  - Blind REPLACE commits ([[commit]] with `append = false`) carry
  *    content independent of the head, so last-writer-wins is their
  *    contract: no conflict check, racing replaces both publish and
  *    the higher version is the head.
  *  - DERIVED commits — verbs whose content is COMPUTED FROM the
  *    observed head ([[merge]], [[optimize]], [[rollback]],
  *    [[deleteWhere]], [[replacePartitions]], constraint /
  *    generated-column / column-mapping changes) — refuse with a
  *    retry-able [[ConcurrentCommitException]] when the head moved
  *    past the version they derived from, checked immediately before
  *    publish and verified again after it (a racer landing inside the
  *    narrow check-to-publish window is reported loudly rather than
  *    silently losing its commit).
  *
  * Whole-manifest maintenance ([[vacuum]], [[purgeKeys]]) remains
  * single-maintenance-writer: it refuses when the head moved before
  * its swap, but must not race data commits. A refused or crashed
  * commit leaves orphaned data files and a burned version number — a
  * benign gap ([[removeOrphans]]' territory) which [[readAsOf]]
  * reports loudly. Readers never block: snapshots are immutable and
  * vacuum only deletes files no retained generation references.
  */

/** Optimistic-concurrency refusal: a commit observed one published head
  * but the table's head moved before (or while) the commit published —
  * see the commit-class contract on [[Snapshots]]. Always RETRY-ABLE:
  * re-read the head, re-derive (or re-prepare) the content against it,
  * commit again. The refused attempt's data files and version claim are
  * left behind as a benign numeric gap ([[Snapshots.removeOrphans]]'
  * territory); nothing half-visible is ever published. */
class ConcurrentCommitException(message: String)
  extends RuntimeException(message)

object Snapshots {

  private val DataDir = "data"
  private val VersionsDir = "_versions"
  private val CommitsDir = "_commits"

  /** Scheme-free normalized path — `file:/x`, `file:///x` and `/x`
    * all compare equal. */
  private def normPath(p: String): String = new Path(p).toUri.getPath

  /** Does `file` live under this table's own directory tree? False for
    * EXTERNAL files — pointers into another table left by
    * [[cloneTable]] — which destructive verbs must never delete: the
    * source table still references them. */
  private def ownsFile(tablePath: String, file: String): Boolean =
    normPath(file).startsWith(normPath(tablePath) + "/")

  private def fs(spark: SparkSession, path: String) =
    new Path(path).getFileSystem(spark.sparkContext.hadoopConfiguration)

  /** JVM-wide memo for PATH-ADDRESSED metadata artifacts — one
    * manifest generation file, one published sidecar dir, one catalog
    * doc dir. Entries are keyed by the artifact's `FileStatus`
    * (modificationTime, length) ALONGSIDE the path, so the memo
    * self-invalidates whenever the path is rewritten — including the
    * drop-table-and-recreate-the-same-path loop, where version
    * numbers restart and `v0` names a DIFFERENT artifact (the r20
    * advice against path-only cache keys, which could let a stale
    * bloom key silently false-prune). Artifacts are immutable once
    * published (`errorifexists` writes, rename publishes), so a
    * matching status can only describe the same bytes; a hit costs
    * one getFileStatus RPC where the computed read costs a driver
    * Spark job — the difference that makes per-STATEMENT SQL
    * resolution (loadTable + governed-read substitution, the r20
    * q73–q80 regression cluster) O(RPC) instead of O(jobs). Cached
    * values must be immutable; callers never mutate them.
    *
    * Bounded by LRU EVICTION (access-ordered LinkedHashMap behind a
    * synchronized wrapper), not the former wholesale `clear()` at the
    * cap: a long-lived driver serving many tables crossed the cap
    * periodically and every crossing forced a full re-read storm over
    * EVERY live artifact; evicting only the least-recently-used entry
    * keeps the hot working set warm at any table count. The lock is a
    * driver-side metadata map guarding O(1) operations — never on a
    * per-row path. */
  private val MetaMemoMax = 8192
  private val metaMemo: java.util.Map[(String, Long, Long), AnyRef] =
    java.util.Collections.synchronizedMap(
      new java.util.LinkedHashMap[(String, Long, Long), AnyRef](
        1024, 0.75f, true) {
        override def removeEldestEntry(
            e: java.util.Map.Entry[(String, Long, Long), AnyRef])
            : Boolean = size() > MetaMemoMax
      })

  private[graft] def memoizedMeta[T <: AnyRef](
      f: org.apache.hadoop.fs.FileSystem,
      path: Path,
      tag: String)(compute: => T): T = {
    val st =
      try f.getFileStatus(path)
      catch { case _: java.io.FileNotFoundException => null }
    if (st == null) return compute // absent: nothing stable to key on
    // `tag` namespaces DIFFERENT derivations of the same artifact
    // (e.g. a stats dir's described-file set vs its key columns)
    val key = (tag + ":" + path.toString, st.getModificationTime,
      st.getLen)
    val hit = metaMemo.get(key)
    if (hit != null) hit.asInstanceOf[T]
    else {
      val v = compute
      metaMemo.put(key, v.asInstanceOf[AnyRef])
      v
    }
  }

  /** Driver-side single-file parquet write for TINY, DRIVER-HELD
    * metadata rows — manifest generations, checkpoints, catalog docs,
    * constraint/mapping sidecars. The metadata plane must not pay a
    * Spark job (scheduler round + task launch + job-commit staging —
    * measured ~170 ms local per write, a multipart commit dance on an
    * object store) to persist rows the driver already holds in a Seq;
    * Delta writes its JSON actions and Iceberg its avro manifests
    * driver-side for exactly this reason. Columns are the nullable
    * long/string shapes every graft metadata schema uses; the written
    * types (optional int64 / optional binary UTF8) read back under
    * Spark as the same long/string columns the Spark-written files
    * carried, and every reader goes through an explicit schema or
    * [[normalizeManifest]] anyway. CREATE mode refuses an existing
    * destination — the `errorifexists` the Spark writes used. */
  private[graft] def writeMetaParquet(
      conf: org.apache.hadoop.conf.Configuration,
      dest: Path,
      cols: Seq[(String, Boolean)], // (name, isLong); false = string
      rows: Iterable[Seq[Any]]): Unit = {
    import org.apache.parquet.schema.{MessageType, Types}
    import org.apache.parquet.schema.LogicalTypeAnnotation.stringType
    import org.apache.parquet.schema.PrimitiveType.PrimitiveTypeName._
    val fields = cols.map { case (n, isLong) =>
      if (isLong) Types.optional(INT64).named(n)
      else Types.optional(BINARY).as(stringType()).named(n)
    }
    val schema = new MessageType("meta",
      fields.toArray[org.apache.parquet.schema.Type]: _*)
    val w = org.apache.parquet.hadoop.example.ExampleParquetWriter
      .builder(org.apache.parquet.hadoop.util.HadoopOutputFile
        .fromPath(dest, conf))
      .withConf(conf).withType(schema).build()
    try rows.foreach { r =>
      val g = new org.apache.parquet.example.data.simple.SimpleGroup(schema)
      r.zip(cols).foreach { case (v, (n, _)) =>
        v match {
          case null | None => ()
          case Some(x: Long) => g.add(n, x)
          case Some(s: String) => g.add(n, s)
          case x: Long => g.add(n, x)
          case x: java.lang.Long => g.add(n, x.longValue)
          case s: String => g.add(n, s)
          case other => throw new IllegalArgumentException(
            s"writeMetaParquet: column $n got unsupported value " +
              s"$other (${other.getClass}) — long/string metadata only")
        }
      }
      w.write(g)
    } finally w.close()
  }

  /** [[writeMetaParquet]] into a DIRECTORY-shaped destination (the
    * sidecar layout Spark's own writer produced: a dir holding one
    * part file), refusing an existing dir — the `errorifexists`
    * contract the Spark writes had. The version-unique dir names are
    * CAS-claimed, so the check-then-write is as race-free as the
    * job-commit rename was. */
  private def writeMetaDir(
      spark: SparkSession,
      dir: String,
      cols: Seq[(String, Boolean)],
      rows: Iterable[Seq[Any]]): Unit = {
    val f = fs(spark, dir)
    val d = new Path(dir)
    if (f.exists(d)) throw new IllegalStateException(
      s"metadata sidecar $dir already exists — refusing to overwrite")
    writeMetaParquet(spark.sparkContext.hadoopConfiguration,
      new Path(d, "part-00000.parquet"), cols, rows)
  }

  /** The manifest generation file's column layout for
    * [[writeMetaParquet]] — matches [[normalizeManifest]]'s order. */
  private val ManifestCols: Seq[(String, Boolean)] = Seq(
    "version" -> true, "file" -> false, "part" -> false,
    "schema_json" -> false, "rows" -> true, "commit_ts" -> true,
    "parent" -> true)

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

  /** Crash recovery for [[vacuum]]'s manifest swap: the swap sequence
    * is staged-write → rename live aside to `_versions_prev` → rename
    * staged in → delete prev, so SOME complete manifest exists at every
    * instant. If a crash lands between the two renames, the live dir is
    * missing but the staged one is complete (live is only moved aside
    * AFTER the staged write finishes) — roll it forward. A leftover
    * prev beside a live manifest (crash after the second rename) is
    * inert and cleared at the next vacuum. */
  private def recoverManifestSwap(spark: SparkSession, tablePath: String): Unit = {
    val f = fs(spark, tablePath)
    val live = new Path(s"$tablePath/$VersionsDir")
    val staged = new Path(s"$tablePath/${VersionsDir}_staged")
    if (!f.exists(live) && f.exists(staged))
      require(f.rename(staged, live),
        s"manifest swap recovery failed for $tablePath — complete staged " +
          s"manifest at $staged could not be installed")
  }

  /** The manifest frame: one row per (version, file, part,
    * schema_json, rows, commit_ts, parent) — `part` is the hive-style partition path
    * fragment (`"event_date=2024-01-03"`) for files written by
    * [[commitPartitioned]], null for flat commits; `schema_json` is
    * the SNAPSHOT's full read schema (identical on every row of a
    * generation — kilobytes of metadata, the Iceberg move), so
    * [[readAsOf]] plans from the manifest alone instead of
    * footer-merging O(files) parquet footers per time-travel read;
    * `rows` is the file's record count captured from its parquet
    * footer at commit time, so COUNT-shaped questions ([[countAsOf]],
    * [[tableStats]]) answer from metadata without opening a data file;
    * `commit_ts` is the caller-supplied LOGICAL commit timestamp
    * (event-time watermark — e.g. the batch's max event ts — never
    * wall clock, so every read replays deterministically), constant
    * per generation, which [[versionAt]]/[[readAsOfTimestamp]] resolve
    * AS OF TIMESTAMP queries against; `parent` is the version this
    * generation's content BUILT ON (the rebased append parent or the
    * version a derived verb computed from — null for blind replaces,
    * first commits, and pre-lineage layouts), constant per generation,
    * which the publish-time reconciliation walks to tell a successor
    * that SAW a commit from a racer that did not.
    * Empty (with the right schema) when the table has no commits yet.
    * The `_`-prefixed manifest dir hides it from any scan of the TABLE
    * root (the `_delta_log` convention), so it is read here by its
    * listed part files — passing the hidden dir itself as a read root
    * trips Spark's hidden-path filter (warning today, possibly an error
    * in a future release). */
  def manifest(spark: SparkSession, tablePath: String): DataFrame = {
    manifestReads.incrementAndGet()
    recoverManifestSwap(spark, tablePath)
    // Assembled from PER-GENERATION reads, each served by the same
    // status-keyed memo [[manifestFor]] uses: a repeated full-history
    // read (meta tables, maintenance verbs) costs the directory listing
    // plus zero file opens once warm, and history growth re-reads only
    // the new generations — where the former whole-directory
    // mergeSchema read paid one driver job over O(versions) footers on
    // EVERY call. Still materialized EAGERLY (metadata-scale by
    // design): the frame is built from collected rows, so a read is a
    // point-in-time snapshot of the manifest, never a torn one. A
    // generation retracted between the listing and its read answers
    // empty rows ([[manifestFor]]'s contract) — the same outcome the
    // old retry-against-a-fresh-listing loop converged to. Row order
    // is generation-ascending; consumers filter/aggregate and never
    // depend on order (a DataFrame promises none).
    val gens = listGenerations(spark, tablePath)
    if (gens.isEmpty) return emptyManifest(spark)
    val rows = gens.flatMap(v => manifestFor(spark, tablePath, v))
    spark.createDataFrame(
      java.util.Arrays.asList(rows: _*), emptyManifest(spark).schema)
  }

  /** Manifests written by earlier layouts may lack the partition,
    * schema, row-count, lineage and/or commit-ts columns; normalize so
    * every consumer sees seven, in one fixed order: version(0),
    * file(1), part(2), schema_json(3), rows(4), commit_ts(5),
    * parent(6) — the positions every `Array[Row]` consumer below
    * indexes by. */
  private def normalizeManifest(m: DataFrame): DataFrame =
    Seq("part" -> "string", "schema_json" -> "string",
      "rows" -> "long", "commit_ts" -> "long", "parent" -> "long")
      .foldLeft(m) { case (df, (c, tpe)) =>
        if (df.columns.contains(c)) df
        else df.withColumn(c, lit(null).cast(tpe))
      }
      .select(col("version"), col("file"), col("part"),
        col("schema_json"), col("rows"), col("commit_ts"),
        col("parent"))

  private def emptyManifest(spark: SparkSession): DataFrame = {
    import org.apache.spark.sql.types._
    spark.createDataFrame(spark.sparkContext.emptyRDD[Row],
      StructType(Seq(StructField("version", LongType, nullable = false),
        StructField("file", StringType, nullable = true),
        StructField("part", StringType, nullable = true),
        StructField("schema_json", StringType, nullable = true),
        StructField("rows", LongType, nullable = true),
        StructField("commit_ts", LongType, nullable = true),
        StructField("parent", LongType, nullable = true))))
  }

  private def isFileGone(e: Throwable): Boolean = {
    var c = e
    while (c != null) {
      if (c.isInstanceOf[java.io.FileNotFoundException] ||
        (c.getMessage != null &&
          (c.getMessage.contains("FileNotFoundException") ||
            c.getMessage.contains("does not exist"))))
        return true
      c = if (c.getCause eq c) null else c.getCause
    }
    false
  }

  /** One manifest generation = one file, its version IN THE NAME —
    * the index that lets every per-version verb read O(files of v)
    * manifest rows instead of the whole history ([[publishRows]]
    * mints the name; [[swapManifest]] preserves it through
    * vacuum/purge rewrites). */
  private val GenFileName = "gen-v(\\d+)\\.parquet".r

  private def genFilePath(tablePath: String, version: Long): String =
    s"$tablePath/$VersionsDir/gen-v$version.parquet"

  /** Every committed generation number, ascending, from ONE listing of
    * the manifest directory — no parquet footer opened, no row
    * collected. The head-resolution primitive: at a year of hourly
    * commits this is one directory listing, where a manifest READ
    * would materialize O(versions × files) rows to the driver. */
  private[graft] def listGenerations(
      spark: SparkSession,
      tablePath: String): Seq[Long] = {
    recoverManifestSwap(spark, tablePath)
    manifestDirListings.incrementAndGet()
    val dir = s"$tablePath/$VersionsDir"
    if (!fs(spark, tablePath).exists(new Path(dir))) Seq.empty
    else genFilesOf(listDataFiles(spark, dir))
      .map(p => new Path(p).getName).map {
      case GenFileName(v) => v.toLong
      case other => throw new IllegalStateException(
        s"manifest file '$other' in $dir does not carry its generation " +
          "number (gen-v<N>.parquet) — written by a foreign tool? The " +
          "version-bounded reads cannot resolve it")
    }.sorted
  }

  /** The manifest rows of ONE generation, read from that generation's
    * own file alone — the version-bounded read every per-version verb
    * plans from: O(files of the version) rows collected, however long
    * the history (normalized column positions per
    * [[normalizeManifest]]). EMPTY when the generation does not exist —
    * never committed, retracted by a racing rebase between a listing
    * and this read, or expired by vacuum — callers turn that into
    * their own loud error (or a corrective lap). */
  private def manifestFor(
      spark: SparkSession,
      tablePath: String,
      version: Long): Array[Row] = {
    manifestReads.incrementAndGet()
    recoverManifestSwap(spark, tablePath)
    val path = genFilePath(tablePath, version)
    val f = fs(spark, tablePath)
    if (!f.exists(new Path(path)))
      return Array.empty[Row]
    // memoized per (path, FileStatus): a generation file is immutable
    // once published (vacuum/purge REPLACE it via swapManifest — new
    // status, fresh read), so repeated per-version resolution (every
    // SQL statement's loadTable + governed-read substitution) pays the
    // driver Spark job once, not per statement
    memoizedMeta(f, new Path(path), "gen") {
      try {
        manifestFilesOpened.incrementAndGet()
        val rows = normalizeManifest(spark.read.parquet(path)).collect()
        manifestRowsCollected.addAndGet(rows.length.toLong)
        rows
      } catch {
        // the generation vanished between the exists check and the read
        // (a racer's retraction) — gone is gone, same answer as above;
        // the stale status key can never be consulted again
        case e: Throwable if isFileGone(e) => Array.empty[Row]
      }
    }
  }

  // ------------------------------------------------------------------
  // MANIFEST CHECKPOINT — the Delta `_last_checkpoint` shape: every
  // [[CheckpointIntervalConf]] commits, (version, commit_ts, parent)
  // for ALL generations rolls into ONE `_checkpoint-v<N>.parquet`, so
  // timeline reads ([[manifestMeta]]: versionAt, contested
  // reconciliation laps, the streaming sink's replay check) open
  // 1 + O(commits since the checkpoint) manifest files instead of
  // O(versions) footers. The `_` prefix hides checkpoint artifacts
  // from [[listDataFiles]], so generation listings and full-history
  // reads never confuse them with gen files. Correct under vacuum
  // WITHOUT a rewrite: readers filter checkpoint rows to the LIVE
  // generation set (one listing they already hold), and a generation's
  // meta is immutable once committed, so stale checkpoints can only
  // over-cover, never lie. A missing/corrupt checkpoint falls back to
  // the full per-file scan — the checkpoint is an accelerator, never a
  // correctness dependency ([[swapManifest]]'s whole-dir swap drops it;
  // the next Nth commit re-rolls).
  //
  // WHY [[listGenerations]] still lists the WHOLE directory (the one
  // O(versions) surface left — pagination cost on an object store at
  // 10k+ generations, nothing more): a `startAfter`-bounded listing
  // that takes liveness-below-the-floor from the checkpoint is NOT
  // sound against this layer's own concurrency model, on three
  // independent grounds. (1) A checkpoint captures the listing AT ROLL
  // TIME, which can include a racer's published-but-unsettled
  // generation that its publisher retracts moments later — the
  // live-listing filter in [[manifestMeta]] exists precisely because
  // checkpoint rows may be RETRACTED rows, and a listing that trusted
  // them would resurrect a generation whose content was deliberately
  // withdrawn (the lost-append class of bug the r19 race work closed).
  // (2) The settled lineage CHAIN cannot stand in for liveness either:
  // blind replaces and [[commitOntoParent]] branch-overs are
  // deliberate chain breaks, so chain-walk liveness would truncate
  // legitimate time-travel history at every replace. (3) gen-v<N>
  // names are not zero-padded, so object-store lexicographic
  // `startAfter` does not even order them numerically — a bounded
  // tail listing needs a layout migration (padded names) plus
  // retraction tombstones that survive the checkpoint floor. The
  // honest fix is that THREE-part change (padded names, retraction
  // tombstones ordered after the floor, settled-only checkpoint
  // capture) — deferred as a deliberate decision rather than
  // half-shipped against the reconciliation protocol's guarantees.
  // ------------------------------------------------------------------

  /** Auto-checkpoint period in COMMITTED VERSIONS (0 disables). The
    * session conf knob lets the soak spec shrink it; 16 keeps the
    * amortized commit cost negligible while bounding every timeline
    * read to ≤ 17 manifest file opens at any history length. */
  private val CheckpointIntervalConf = "graft.manifest.checkpointInterval"
  private val CheckpointIntervalDefault = 16

  private def checkpointInterval(spark: SparkSession): Int =
    spark.conf.getOption(CheckpointIntervalConf)
      .map(_.toInt).getOrElse(CheckpointIntervalDefault)

  /** NOT `_`-prefixed: Spark's hidden-path filter would refuse to read
    * it back; [[genFilesOf]] excludes it from generation listings by
    * name instead. */
  private def ckptFilePath(tablePath: String, version: Long): String =
    s"$tablePath/$VersionsDir/checkpoint-v$version.parquet"

  private def isCkptFile(name: String): Boolean =
    name.startsWith("checkpoint-v")

  /** The generation files of a manifest directory listing — checkpoint
    * artifacts excluded. */
  private def genFilesOf(parts: Seq[String]): Seq[String] =
    parts.filterNot(p => isCkptFile(new Path(p).getName))

  private def ckptPointerPath(tablePath: String): Path =
    new Path(s"$tablePath/$VersionsDir/_last_checkpoint")

  /** The `_last_checkpoint` pointer's target version, if a readable
    * pointer exists — a dangling or corrupt pointer answers None (the
    * reader falls back to the full scan, never fails). */
  private[graft] def lastCheckpointVersion(
      spark: SparkSession,
      tablePath: String): Option[Long] = {
    val f = fs(spark, tablePath)
    val p = ckptPointerPath(tablePath)
    try {
      if (!f.exists(p)) None
      else {
        val in = f.open(p)
        try {
          val buf = new Array[Byte](64)
          val n = in.read(buf)
          new String(buf, 0, math.max(n, 0), "UTF-8").trim.toLongOption
        } finally in.close()
      }
    } catch {
      case e: Throwable if isFileGone(e) => None
    }
  }

  /** Roll the whole timeline's (version, commit_ts, parent) into one
    * checkpoint file at the current head and repoint
    * `_last_checkpoint` — idempotent, and itself accelerated by the
    * previous checkpoint (reads 1 + O(since) files, not the history).
    * Superseded checkpoint files are dropped best-effort after the new
    * pointer lands. Returns the checkpointed head, None on an empty
    * table. */
  private[graft] def checkpointManifest(
      spark: SparkSession,
      tablePath: String): Option[Long] = {
    val meta = manifestMeta(spark, tablePath)
    if (meta.isEmpty) return None
    val cv = meta.map(_.getLong(0)).max
    val f = fs(spark, tablePath)
    val tmp = new Path(s"$tablePath/${VersionsDir}_ckpt_tmp_v$cv")
    f.delete(tmp, true) // overwrite semantics: a crashed stage re-stages
    writeMetaParquet(spark.sparkContext.hadoopConfiguration, tmp,
      Seq("version" -> true, "commit_ts" -> true, "parent" -> true),
      meta.map(r => Seq[Any](r.getLong(0),
        if (r.isNullAt(1)) null else r.getLong(1),
        if (r.isNullAt(2)) null else r.getLong(2))).toSeq)
    val dest = new Path(ckptFilePath(tablePath, cv))
    f.delete(dest, false) // re-checkpointing the same head is idempotent
    require(f.rename(tmp, dest),
      s"manifest checkpoint publish failed for $tablePath at v$cv")
    val out = f.create(ckptPointerPath(tablePath), true)
    try out.write(cv.toString.getBytes("UTF-8"))
    finally out.close()
    val dir = new Path(s"$tablePath/$VersionsDir")
    f.listStatus(dir)
      .filter(s => s.isFile && isCkptFile(s.getPath.getName) &&
        s.getPath.getName != dest.getName)
      .foreach(s => f.delete(s.getPath, false))
    Some(cv)
  }

  /** One row PER GENERATION — (version, commit_ts, parent). With a
    * checkpoint present this opens ONE checkpoint file plus the gen
    * files NEWER than it (≤ the checkpoint interval, however long the
    * history) — checkpoint rows are filtered to the generations the
    * directory listing still carries, so vacuum/retraction need no
    * checkpoint rewrite. Without one (young table, post-vacuum), the
    * full per-file scan with the fan-out dropped in the EXECUTORS.
    * The timeline / lineage-chain read ([[versionAt]], the
    * reconciliation tails' contested laps, the streaming sink's
    * replay check). */
  private[graft] def manifestMeta(
      spark: SparkSession,
      tablePath: String): Array[Row] = {
    manifestReads.incrementAndGet()
    recoverManifestSwap(spark, tablePath)
    val dir = s"$tablePath/$VersionsDir"
    var lastErr: Throwable = null
    var attempt = 0
    while (attempt < 4) {
      attempt += 1
      manifestDirListings.incrementAndGet()
      val parts =
        if (fs(spark, tablePath).exists(new Path(dir)))
          genFilesOf(listDataFiles(spark, dir))
        else Seq.empty
      if (parts.isEmpty) return Array.empty[Row]
      val byVersion: Map[Long, String] = parts.map { p =>
        new Path(p).getName match {
          case GenFileName(v) => v.toLong -> p
          case other => throw new IllegalStateException(
            s"manifest file '$other' in $dir does not carry its " +
              "generation number (gen-v<N>.parquet) — written by a " +
              "foreign tool? The version-bounded reads cannot resolve it")
        }
      }.toMap
      try {
        val ckpt: Option[(Long, Array[Row])] =
          lastCheckpointVersion(spark, tablePath).flatMap { cv =>
            val cp = ckptFilePath(tablePath, cv)
            try {
              if (!fs(spark, tablePath).exists(new Path(cp))) None
              else {
                manifestFilesOpened.incrementAndGet()
                val r = spark.read.parquet(cp)
                  .select(col("version"), col("commit_ts"), col("parent"))
                  .collect()
                manifestRowsCollected.addAndGet(r.length.toLong)
                Some((cv, r))
              }
            } catch {
              // a vanished, torn or unreadable checkpoint falls back
              // to the full per-file scan — never a read failure
              case scala.util.control.NonFatal(_) => None
            }
          }
        val (base, newerPaths) = ckpt match {
          case Some((cv, rows)) =>
            (rows.filter(r => byVersion.contains(r.getLong(0))),
              byVersion.view.filterKeys(_ > cv).values.toSeq.sorted)
          case None => (Array.empty[Row], parts)
        }
        val newer =
          if (newerPaths.isEmpty) Array.empty[Row]
          else {
            manifestFilesOpened.addAndGet(newerPaths.length.toLong)
            val r = normalizeManifest(spark.read
              .option("mergeSchema", "true").parquet(newerPaths: _*))
              .select(col("version"), col("commit_ts"), col("parent"))
              .distinct().collect()
            manifestRowsCollected.addAndGet(r.length.toLong)
            r
          }
        return base ++ newer
      } catch {
        case e: Throwable if isFileGone(e) => lastErr = e
      }
    }
    throw lastErr
  }

  /** version → recorded lineage parent for every generation, from
    * [[manifestMeta]] — what [[inLineage]] walks. Read only on
    * CONTESTED reconciliation laps; the settled common case resolves
    * from the listing alone. */
  private def manifestChain(
      spark: SparkSession,
      tablePath: String): Map[Long, Option[Long]] =
    manifestMeta(spark, tablePath).map(r => r.getLong(0) ->
      (if (r.isNullAt(2)) None else Some(r.getLong(2)))).toMap

  /** Latest committed version, or None for an empty table — resolved
    * from the manifest directory LISTING alone (the generation numbers
    * live in the filenames), zero rows read. */
  def latestVersion(spark: SparkSession, tablePath: String): Option[Long] =
    listGenerations(spark, tablePath).lastOption

  private def manifestFiles(
      spark: SparkSession,
      tablePath: String,
      version: Long): Seq[String] =
    manifestFor(spark, tablePath, version).map(_.getString(1)).toSeq

  /** The recorded lineage parent of an already-read generation
    * (constant per generation by construction). */
  private def parentOf(gen: Array[Row]): Option[Long] =
    gen.headOption.flatMap(r =>
      if (r.isNullAt(6)) None else Some(r.getLong(6)))

  /** The stored schema JSON of an already-read generation, if any. */
  private def schemaJsonOf(gen: Array[Row]): Option[String] =
    gen.find(!_.isNullAt(3)).map(_.getString(3))

  /** (file, part, rows) triples of an already-read generation. */
  private def fileRowsOf(
      gen: Array[Row]): Seq[(String, String, Option[Long])] =
    gen.map(r => (r.getString(1),
      if (r.isNullAt(2)) null else r.getString(2),
      if (r.isNullAt(4)) None else Some(r.getLong(4)))).toSeq

  /** The files generation `version` ADDED relative to its recorded
    * lineage parent — the reconciliation-safe "fresh files of this
    * commit" (a `data/v<N>/` path filter breaks when [[publishAppend]]
    * publishes a corrective lap under a higher version than the dir
    * the batch was written to). A parent-less generation (first
    * commit, blind replace) is wholly fresh; a derived replace's
    * parent files left the lineage, so subtracting them is a no-op.
    * Two single-generation reads (the version's, its parent's) — never
    * the history. */
  private def freshFilesOf(
      spark: SparkSession,
      tablePath: String,
      version: Long): Seq[String] = {
    val gen = manifestFor(spark, tablePath, version)
    val parentFiles = parentOf(gen)
      .map(p => manifestFor(spark, tablePath, p).map(_.getString(1)).toSet)
      .getOrElse(Set.empty[String])
    gen.map(_.getString(1)).filterNot(parentFiles).toSeq
  }

  /** Atomically claim the next free version number at or above `from`:
    * `create(marker, overwrite = false)` either creates the marker —
    * the claim — or throws because a racing (or crashed) committer owns
    * that number, in which case the next number is tried. This is the
    * CAS that makes concurrent commits mint DISTINCT versions instead
    * of silently merging their file sets under one number. */
  private[graft] def claimVersion(
      spark: SparkSession,
      tablePath: String,
      from: Long): Long = {
    val f = fs(spark, tablePath)
    var v = from
    while (true) {
      if (tryCreateExclusive(f, new Path(s"$tablePath/$CommitsDir/v$v")))
        return v
      v += 1L
    }
    v // unreachable
  }

  /** Atomically create the claim marker, false on a benign collision.
    * HDFS `create(overwrite = false)` IS atomic, but the LOCAL
    * FileSystem's is check-then-create — two racing claimants can BOTH
    * "succeed" on one marker and mint the SAME version (surfacing
    * later as a spurious errorifexists collision on the staging dirs)
    * — so `file://` routes through POSIX O_CREAT|O_EXCL
    * (`File.createNewFile`), which is atomic. Object stores without
    * atomic create serialize commits through a catalog or lock service
    * (the standing note on [[Snapshots]]). */
  private def tryCreateExclusive(
      f: org.apache.hadoop.fs.FileSystem,
      p: Path): Boolean =
    if ("file" == f.getUri.getScheme) {
      val local = new java.io.File(p.toUri.getPath)
      val dir = local.getParentFile
      if (dir != null) dir.mkdirs()
      local.createNewFile() // atomic; false = a racer owns the number
    } else {
      try { f.create(p, false).close(); true }
      catch {
        case e: java.io.IOException =>
          // only an existing marker is a benign collision; a real IO
          // failure must not spin the claim loop forever
          if (f.exists(p)) false else throw e
      }
    }

  /** Shared commit tail: the observed parent generation's rows (for
    * append) plus fresh rows under one claimed version, published as
    * one manifest generation. `parent` is the latest PUBLISHED version
    * observed BEFORE the claim — never `version - 1`, which after a
    * crashed claim (or beside a racer's still-unpublished lower
    * number) is a numeric gap with no manifest rows, and an append
    * resolved through it would publish only the fresh files, silently
    * truncating the table. The manifest append is the PUBLISH point —
    * a crash before it leaves an orphaned marker and unreferenced data
    * files (a version gap that [[readAsOf]] reports loudly), never a
    * half-visible snapshot. */
  private def publish(
      spark: SparkSession,
      tablePath: String,
      version: Long,
      fresh: Seq[(String, String, Option[Long])],
      parent: Option[Long],
      freshSchema: org.apache.spark.sql.types.StructType,
      commitTs: Option[Long] = None): Long = {
    // ONE single-generation read answers the parent's file rows AND
    // its stored schema
    val parentGen =
      parent.map(v => manifestFor(spark, tablePath, v))
        .getOrElse(Array.empty[Row])
    val parentRows = fileRowsOf(parentGen)
    // the generation's read schema: an append's is the parent schema
    // merged with the fresh batch's (schema evolution — new columns
    // join the table, parent rows null-fill), a replace's is the fresh
    // batch's alone. Persisted per generation so readers never
    // footer-merge.
    val schema = schemaJsonOf(parentGen)
      .map(j => org.apache.spark.sql.types.DataType.fromJson(j)
        .asInstanceOf[org.apache.spark.sql.types.StructType])
      .map(ps => mergeSchemas(ps, nullableTop(freshSchema)))
      .getOrElse(nullableTop(freshSchema))
    publishRows(spark, tablePath, version, parentRows ++ fresh,
      schema.json, commitTs, parent)
  }

  /** The sanctioned retry loop of the optimistic-concurrency contract:
    * run `body` — a commit attempt that RE-READS the head and
    * RE-DERIVES its content on every call, which is what makes a
    * [[ConcurrentCommitException]] retry-able at all — until it
    * publishes or `maxAttempts` conflicts burn (then the LAST conflict
    * rethrows). Appends rarely need it ([[publishAppend]] rebases
    * internally); it exists for the DERIVED verbs (merge, optimize,
    * deleteWhere, replacePartitions, metadata changes) whose content
    * must be recomputed against the moved head, and for the
    * maintenance verbs' pre-swap refusals. Every refused attempt
    * already retracted its staged generation and sidecars, so a retry
    * never sees half-published state — pass the WHOLE derive-and-commit
    * step as `body`, never a pre-derived frame captured outside it. */
  def retryOnConflict[T](maxAttempts: Int = 5)(body: => T): T = {
    require(maxAttempts >= 1, "maxAttempts must be positive")
    var attempt = 0
    while (true) {
      attempt += 1
      try return body
      catch {
        case e: ConcurrentCommitException =>
          if (attempt >= maxAttempts) throw e
      }
    }
    throw new IllegalStateException("unreachable")
  }

  /** Is `anc` on the recorded parent lineage of `from` (inclusive)?
    * A chain break — a retracted, vacuumed, blind-replace, or
    * pre-lineage generation — answers false: reconciliation treats an
    * unprovable ancestry as a conflict, never as consent. */
  private def inLineage(
      chain: Map[Long, Option[Long]],
      anc: Long,
      from: Long): Boolean = {
    var v = from
    while (true) {
      if (v == anc) return true
      chain.get(v).flatten match {
        case Some(p) if p < v => v = p
        case _ => return false
      }
    }
    false // unreachable; p < v bounds the walk
  }

  /** Presence-only marker naming generation `version` a DELIBERATE
    * [[commitOntoParent]] branch-over: the generations between its
    * recorded parent and it were skipped on purpose and are permanent
    * (unpinned-dead by the atomic-commit contract), NOT a racing
    * publish about to retract. Readers that find interior generations
    * classify by this marker DETERMINISTICALLY instead of by a bounded
    * wait — the wait survives only as the liveness fallback for the
    * genuinely ambiguous case (a crashed publisher's unmarked doomed
    * head). `_`-prefixed so generation listings never see it; written
    * BEFORE the branch-over's manifest rename so any reader that sees
    * the generation also sees the marker. */
  private def branchOverMarker(tablePath: String, version: Long): Path =
    new Path(s"$tablePath/$VersionsDir/_branchover-v$version")

  private[graft] def isBranchOver(
      spark: SparkSession,
      tablePath: String,
      version: Long): Boolean =
    fs(spark, tablePath).exists(branchOverMarker(tablePath, version))

  /** Withdraw a generation attempt: its manifest file (if it
    * published) and every version-keyed sidecar dir its verb may have
    * written before the refusal — without this, a refused
    * [[deleteWhere]]'s `_dv/v<N>` sidecar would keep GOVERNING later
    * reads through latest-at-or-below resolution, applying deletes
    * that were never committed. Data files stay ([[removeOrphans]]'
    * territory) and the claim marker stays burned (a benign numeric
    * gap — claims must never be re-mintable). */
  private def retractVersion(
      spark: SparkSession,
      tablePath: String,
      version: Long): Unit = {
    val f = fs(spark, tablePath)
    f.delete(new Path(s"$tablePath/$VersionsDir/gen-v$version.parquet"),
      false)
    f.delete(branchOverMarker(tablePath, version), false)
    Seq(dvDir(tablePath, version), constraintsDir(tablePath, version),
      colMapDir(tablePath, version), genColsDir(tablePath, version),
      statsDir(tablePath, version), bloomDir(tablePath, version),
      eqDir(tablePath, version))
      .foreach(d => f.delete(new Path(d), true))
  }

  /** The write-governance fingerprint of `version`: the sidecar
    * generations whose content [[prepareBatch]]/[[toPhysical]] bake
    * into a batch (CHECK constraints, column mapping, generated
    * columns — deletion vectors govern reads, not batch preparation).
    * An append may rebase onto a moved head exactly when this
    * fingerprint is unchanged; otherwise its already-written files
    * were prepared under governance the new head revoked. */
  private def prepGovernanceAt(
      spark: SparkSession,
      tablePath: String,
      version: Option[Long]): Seq[Option[Long]] =
    version match {
      case None => Seq(None, None, None)
      case Some(v) =>
        Seq(constraintsRoot(tablePath), colMapRoot(tablePath),
          genColsRoot(tablePath))
          .map(r => sidecarResolve(spark, r, v).map(_._1))
    }

  /** The APPEND commit tail with publish-time reconciliation (see the
    * commit-class contract in the object scaladoc). Each lap's
    * point-in-time view is ONE listing of the manifest directory (the
    * version numbers) plus ONE single-generation read (the head's own
    * file) — O(files of the head) rows, never the history. A racer's
    * publish or retraction landing between the listing and the head
    * read surfaces as an EMPTY head read, which costs one corrective
    * lap instead of a torn union (a publish rebased on a vanished head
    * would silently truncate the table — the guard below). A publish
    * SETTLES when the head descends from it AND no racer's generation
    * sits strictly between its recorded parent and it; that contiguity
    * check is what catches the claims-inverted window (a racer with a
    * LOWER claim publishing after our head-read lands below us,
    * invisible to any head-only check) — and it reads NOTHING on the
    * common uncontested lap (head == published settles from the
    * listing alone; the lineage chain is consulted only when
    * contested). An unsettled publish is RETRACTED and the next lap
    * rebases the same fresh files onto the then-current head, so no
    * generation ever unions content it cannot see whole. Converges
    * because each publish is a filesystem-serialized rename and the
    * racer population is finite; the lap bound is a loud backstop, not
    * a correctness device. */
  private[graft] def publishAppend(
      spark: SparkSession,
      tablePath: String,
      version: Long,
      fresh: Seq[(String, String, Option[Long])],
      observed: Option[Long],
      freshSchema: org.apache.spark.sql.types.StructType,
      ts: Option[Long]): Long = {
    val freshFiles = fresh.map(_._1).toSet
    val prepGov = prepGovernanceAt(spark, tablePath, observed)
    var claimed = version
    var published = -1L
    var parentUsed: Option[Long] = None
    var parentOfParent: Option[Long] = None
    // interior generations KNOWN at rebase time — a commitOntoParent
    // branch-over's permanent skipped generations, accepted after the
    // bounded wait below; only interiors that appear AFTER the rebase
    // read are genuine shadows
    var parentInterior: Set[Long] = Set.empty
    var shadowWait: Option[(Long, Int)] = None
    var laps = 0
    while (laps < 16) {
      laps += 1
      val versions = listGenerations(spark, tablePath)
      val head = versions.lastOption
      val retractedThisLap =
        if (published < 0) false
        else {
          val shadowed = versions.exists(v =>
            v > parentUsed.getOrElse(-1L) && v < published)
          // the PARENT we rebased on may itself have been shadowed by a
          // racer whose lower-claimed generation renamed in after our
          // rebase read — its publisher will retract it, and our
          // generation would carry a file set missing the shadow's
          // settled rows. Settling anyway is exactly how a committed
          // row gets lost; withdraw and rebase onto the post-retraction
          // head instead.
          // (a PARENTLESS rebase parent — first commit or blind
          // replace — cannot be shadowed: blind is last-writer-wins
          // by contract, so lower generations are superseded, not
          // shadows; interiors already known at rebase time are a
          // branch-over's deliberate skips, not shadows)
          val parentShadowed = parentUsed.exists(p =>
            versions.contains(p) && parentOfParent.exists(pp =>
              versions.exists(v => v > pp && v < p &&
                !parentInterior.contains(v))))
          if (!shadowed && !parentShadowed && head.exists { h =>
            h == published ||
              inLineage(manifestChain(spark, tablePath), published, h) ||
              freshFiles.subsetOf(
                manifestFor(spark, tablePath, h).map(_.getString(1)).toSet)
          }) {
            maybeCheckpointManifest(spark, tablePath, published)
            return published
          }
          // shadowed, or superseded without our rows: withdraw and
          // rebase next lap (the retracted number stays burned; the
          // next lap's listing sees the retraction)
          retractVersion(spark, tablePath, published)
          published = -1L
          true
        }
      if (!retractedThisLap) {
        if (head != observed &&
          prepGovernanceAt(spark, tablePath, head) != prepGov) {
          throw new ConcurrentCommitException(
            s"append to $tablePath was prepared under the constraint/" +
              s"column-mapping/generated-column governance of version " +
              s"${observed.fold("<empty>")(_.toString)}, but the " +
              s"published head moved to " +
              s"${head.fold("<empty>")(_.toString)} under different " +
              "governance — re-prepare and retry")
        }
        // a head at or above our claimed number would leave this
        // generation below the maximum and invisible — re-claim above
        // it (the superseded claim burns as a benign gap)
        if (head.exists(_ >= claimed))
          claimed = claimVersion(spark, tablePath, head.get + 1L)
        val headRows = head.map(h => manifestFor(spark, tablePath, h))
          .getOrElse(Array.empty[Row])
        val headParent = parentOf(headRows)
        val interior: Set[Long] = headParent.map(p =>
          versions.filter(v => v > p && v < head.get).toSet)
          .getOrElse(Set.empty)
        if (head.isDefined && headRows.isEmpty) {
          // the listed head was retracted between the listing and its
          // read — rebasing on it would publish only the fresh files,
          // silently truncating the table; take a fresh lap instead
          shadowWait = None
          Thread.sleep(20L)
        } else if (head.isDefined && interior.nonEmpty &&
          !isBranchOver(spark, tablePath, head.get) && {
          // the listed head LOOKS shadowed — a generation sits between
          // it and its recorded parent. Either a lower-claimed racer's
          // publish just landed and the head's publisher is about to
          // retract it (rebasing would inherit a file set missing the
          // shadow's settled rows — the lost-append hole), or this is
          // commitOntoParent's DELIBERATE branch-over, whose interior
          // generations are permanent and unpinned-dead by contract.
          // A marked branch-over classifies instantly above; the
          // bounded wait below survives only for UNMARKED heads — a
          // doomed head retracts within its publisher's settle lap,
          // and one still standing after the wait is treated as
          // permanent (the liveness fallback for a publisher that
          // crashed between its publish and its retraction).
          val waited = shadowWait match {
            case Some((h, n)) if head.contains(h) => n + 1
            case _ => 1
          }
          shadowWait = Some((head.get, waited))
          waited < 8
        }) {
          Thread.sleep(50L)
        } else {
          parentUsed = head
          parentOfParent = headParent
          parentInterior = interior
          shadowWait = None
          val schema = schemaJsonOf(headRows)
            .map(j => org.apache.spark.sql.types.DataType.fromJson(j)
              .asInstanceOf[org.apache.spark.sql.types.StructType])
            .map(ps => mergeSchemas(ps, nullableTop(freshSchema)))
            .getOrElse(nullableTop(freshSchema))
          // a relap after someone built on our retracted generation
          // could find our fresh paths already in the head — filter
          // them so a manifest row never duplicates (belt-and-braces;
          // the rebase guard above prevents the cause)
          published = publishRows(spark, tablePath, claimed,
            fileRowsOf(headRows).filterNot(r =>
              freshFiles.contains(r._1)) ++ fresh,
            schema.json, ts, head)
        }
      }
    }
    throw new ConcurrentCommitException(
      s"append to $tablePath did not reconcile — 16 corrective laps " +
        "lost to racing commits; retry")
  }

  /** The DERIVED commit tail (see the commit-class contract in the
    * object scaladoc): content computed FROM `derivedFrom` may publish
    * only while `derivedFrom` is still the head — checked immediately
    * before the publish rename, and verified again after it by looking
    * for a racer's generation strictly between `derivedFrom` and
    * `version` (a lower claim landing inside the check-to-publish
    * window). Either refusal retracts this attempt's manifest
    * generation and sidecars and throws the retry-able
    * [[ConcurrentCommitException]] — the loser is told loudly, never
    * silently shadowed. */
  private[graft] def publishDerived(
      spark: SparkSession,
      tablePath: String,
      version: Long,
      fileRows: Seq[(String, String, Option[Long])],
      schemaJson: String,
      ts: Option[Long],
      derivedFrom: Long,
      verb: String): Long = {
    val pre = latestVersion(spark, tablePath)
    if (!pre.contains(derivedFrom)) {
      retractVersion(spark, tablePath, version)
      throw new ConcurrentCommitException(
        s"$verb derived its content from version $derivedFrom of " +
          s"$tablePath, but the published head is now " +
          s"${pre.fold("<empty>")(_.toString)} — re-read and retry")
    }
    // content computed from a SHADOWED head bakes its doomed file set
    // (missing the shadow's settled rows) into the replace — the same
    // lost-append hole the rebase guard closes; checked against the
    // recorded parent both before and after the publish rename. An
    // interior generation that SURVIVES a bounded wait is
    // commitOntoParent's deliberate branch-over (permanent, its rows
    // unpinned-dead by contract) — accepted, and only interiors that
    // appear AFTER it refuse.
    val dfParent = parentOf(manifestFor(spark, tablePath, derivedFrom))
    def interiorOf(versions: Seq[Long]): Set[Long] =
      dfParent.map(p =>
        versions.filter(v => v > p && v < derivedFrom).toSet)
        .getOrElse(Set.empty)
    var preInterior = interiorOf(listGenerations(spark, tablePath))
    var waitLaps = 0
    // a MARKED derivedFrom is a deliberate branch-over: its interiors
    // are permanent by contract — classify instantly, no wait lap paid
    if (preInterior.nonEmpty && isBranchOver(spark, tablePath, derivedFrom))
      waitLaps = 8
    while (preInterior.nonEmpty && waitLaps < 8) {
      waitLaps += 1
      Thread.sleep(50L)
      val vs = listGenerations(spark, tablePath)
      if (!vs.contains(derivedFrom)) {
        retractVersion(spark, tablePath, version)
        throw new ConcurrentCommitException(
          s"$verb derived its content from version $derivedFrom of " +
            s"$tablePath, which a racing commit shadowed and its " +
            "publisher retracted — re-read and retry")
      }
      preInterior = interiorOf(vs)
    }
    publishRows(spark, tablePath, version, fileRows, schemaJson, ts,
      Some(derivedFrom))
    // ONE post-publish LISTING answers both window checks on the
    // uncontested path (version numbers alone); the lineage chain — a
    // per-generation projection, O(generations) rows — is read only
    // when the head moved past us
    val versions = listGenerations(spark, tablePath)
    val shadowed = versions.find(v => v > derivedFrom && v < version)
      .orElse(
        if (versions.contains(derivedFrom))
          (interiorOf(versions) -- preInterior).headOption
        else None)
    if (shadowed.isDefined) {
      retractVersion(spark, tablePath, version)
      throw new ConcurrentCommitException(
        s"$verb published version $version of $tablePath derived from " +
          s"$derivedFrom, but version ${shadowed.get} " +
          "landed concurrently in between or below it — retracted; " +
          "re-read and retry")
    }
    // the symmetric window: a racer with a HIGHER claim whose whole
    // check-publish-check sequence ran between our pre-check and our
    // publish settles without ever seeing us (we were unpublished at
    // its between-check) — if the head does not descend from us, we
    // are the shadowed one and must withdraw
    val after = versions.lastOption
    if (!after.contains(version) &&
      !after.exists(h =>
        inLineage(manifestChain(spark, tablePath), version, h))) {
      retractVersion(spark, tablePath, version)
      throw new ConcurrentCommitException(
        s"$verb published version $version of $tablePath derived from " +
          s"$derivedFrom, but the head moved to " +
          s"${after.fold("<empty>")(_.toString)} without descending " +
          "from it — retracted; re-read and retry")
    }
    maybeCheckpointManifest(spark, tablePath, version)
    version
  }

  /** The stored read schema of one generation, if its manifest carries
    * one (generations written by earlier layouts don't — their reads
    * fall back to footer-merging). */
  def storedSchema(
      spark: SparkSession,
      tablePath: String,
      version: Long): Option[org.apache.spark.sql.types.StructType] =
    schemaJsonOf(manifestFor(spark, tablePath, version))
      .map(j => org.apache.spark.sql.types.DataType.fromJson(j)
        .asInstanceOf[org.apache.spark.sql.types.StructType])

  /** Top-level nullable copy (parquet reads surface every column as
    * nullable; storing the schema that way keeps the manifest's word
    * identical to what a reader observes). */
  private def nullableTop(
      s: org.apache.spark.sql.types.StructType)
      : org.apache.spark.sql.types.StructType =
    org.apache.spark.sql.types.StructType(
      s.fields.map(_.copy(nullable = true)))

  /** Append-evolution schema merge: parent columns keep their position,
    * fresh-only columns join at the end. A shared column's type must
    * match OR be a SAFE WIDENING pair — int→long, float→double, in
    * EITHER direction (the merged schema carries the wide type; the
    * Spark 4 vectorized parquet reader up-casts the narrow files at
    * scan time, so history is read through the widened schema with
    * zero rewrite — the Iceberg/Delta type-promotion rule, metadata
    * only). Past generations keep their own stored schema, so time
    * travel below the widening commit still answers the narrow type.
    * Any other retype is refused loudly — rewriting history's types is
    * a replace commit's job, not an append's. */
  private def mergeSchemas(
      parent: org.apache.spark.sql.types.StructType,
      fresh: org.apache.spark.sql.types.StructType)
      : org.apache.spark.sql.types.StructType = {
    import org.apache.spark.sql.types._
    def widened(a: DataType, b: DataType): Option[DataType] = (a, b) match {
      case _ if a == b => Some(a)
      case (IntegerType, LongType) | (LongType, IntegerType) =>
        Some(LongType)
      case (FloatType, DoubleType) | (DoubleType, FloatType) =>
        Some(DoubleType)
      case _ => None
    }
    val merged = parent.fields.map { pf =>
      fresh.fields.find(_.name == pf.name) match {
        case None => pf
        case Some(ff) =>
          val w = widened(pf.dataType, ff.dataType)
          require(w.isDefined,
            s"append cannot change column '${pf.name}' from " +
              s"${pf.dataType.simpleString} to ${ff.dataType.simpleString} " +
              "— only int→long and float→double widen as metadata; " +
              "commit a replace version to retype")
          pf.copy(dataType = w.get)
      }
    }
    val known = parent.fieldNames.toSet
    org.apache.spark.sql.types.StructType(
      merged ++ fresh.fields.filterNot(f => known.contains(f.name)))
  }

  /** (file, part, rows) rows of one manifest generation — `rows` is
    * None only for generations written by pre-row-count layouts. One
    * single-generation read. */
  private def manifestRows(
      spark: SparkSession,
      tablePath: String,
      version: Long): Seq[(String, String, Option[Long])] =
    fileRowsOf(manifestFor(spark, tablePath, version))

  /** Per-file record counts read from the parquet FOOTERS of freshly
    * committed files — O(new files) metadata reads at commit time,
    * never a data scan (the Iceberg writer-stats retrofit: a writer
    * that gathered counts from its tasks would skip even the footer
    * read, but a commit already pays O(new files) listing, so the
    * footer pass rides the same budget). Small batches read serially
    * on the driver; past [[FooterFanoutThreshold]] files the footer
    * opens fan out as one executor job — a 10⁵-file commit must not
    * serialize 10⁵ round-trips through one thread (executors rebuild
    * the Hadoop conf from their own classpath site files, the same
    * config every task-side reader uses). */
  private val FooterFanoutThreshold = 16

  /** [[swapManifest]] stages ≤ this many retained generations
    * driver-side; past it the partitioned write job's executor fan-out
    * beats a sequential driver loop. */
  private val SwapManifestFanoutThreshold = 64

  private def footerCounts(
      spark: SparkSession,
      files: Seq[(String, String)]): Seq[(String, String, Option[Long])] = {
    def readOne(conf: org.apache.hadoop.conf.Configuration)(
        f: String): Long = {
      val in = org.apache.parquet.hadoop.util.HadoopInputFile
        .fromPath(new Path(f), conf)
      val r = org.apache.parquet.hadoop.ParquetFileReader.open(in)
      try r.getRecordCount
      finally r.close()
    }
    if (files.size <= FooterFanoutThreshold) {
      val conf = spark.sparkContext.hadoopConfiguration
      files.map { case (f, p) => (f, p, Some(readOne(conf)(f))) }
    } else {
      val counts = spark.sparkContext
        .parallelize(files.map(_._1), math.min(files.size, 64))
        .map { f =>
          f -> readOne(new org.apache.hadoop.conf.Configuration())(f)
        }
        .collect().toMap
      files.map { case (f, p) => (f, p, Some(counts(f))) }
    }
  }

  private def publishRows(
      spark: SparkSession,
      tablePath: String,
      version: Long,
      fileRows: Seq[(String, String, Option[Long])],
      schemaJson: String,
      commitTs: Option[Long],
      parent: Option[Long]): Long = {
    // one generation = one manifest file, staged at a version-unique
    // temp name and RENAMED in — never `mode("append")` into the shared
    // manifest dir, whose job-commit staging (`_temporary/0`) is a
    // single name that concurrent committers would clobber. The rename
    // is the atomic publish: a racing reader sees the generation
    // entirely or not at all. Written DRIVER-SIDE ([[writeMetaParquet]]):
    // the rows are already a driver Seq, and a Spark job per commit
    // put ~170 ms of scheduler+commit-protocol overhead on every
    // statement's critical path.
    val f = fs(spark, tablePath)
    val tmp = new Path(s"$tablePath/${VersionsDir}_tmp_v$version")
    writeMetaParquet(spark.sparkContext.hadoopConfiguration, tmp,
      ManifestCols, fileRows.map { case (file, p, n) =>
        Seq[Any](version, file, p, schemaJson, n, commitTs, parent) })
    val live = new Path(s"$tablePath/$VersionsDir")
    if (!f.exists(live)) f.mkdirs(live)
    require(f.rename(tmp,
      new Path(s"$tablePath/$VersionsDir/gen-v$version.parquet")),
      s"manifest publish failed for version $version of $tablePath")
    version
  }

  /** Every Nth version rolls the timeline into a fresh checkpoint — an
    * accelerator only (a failure must never fail the commit that
    * already published; the stale checkpoint stays valid). Called at
    * SETTLE points, never inside [[publishRows]]: a checkpoint write
    * inside the publish-to-settle window widens the doomed-head race
    * the reconciliation guards from microseconds to a full Spark job
    * (found by the checkpoint race spec). */
  private def maybeCheckpointManifest(
      spark: SparkSession,
      tablePath: String,
      version: Long): Unit = {
    val interval = checkpointInterval(spark)
    if (interval > 0 && version > 0 && version % interval == 0)
      try checkpointManifest(spark, tablePath)
      catch { case scala.util.control.NonFatal(_) => () }
  }

  /** Commit `df` as the next version. `append = true` makes the new
    * snapshot the parent's files PLUS the newly written ones (no data
    * rewritten — the O(delta) fast path), reconciled against racing
    * commits by [[publishAppend]]; `append = false` makes it exactly
    * the newly written files (replace: corrections, deletes,
    * compactions) — blind last-writer-wins, unless `derivedFrom` names
    * the head version the replacement content was COMPUTED from, which
    * makes it a derived commit ([[publishDerived]]): refused with a
    * retry-able [[ConcurrentCommitException]] if the head moved. The
    * version number comes from [[claimVersion]]'s CAS, so racing
    * committers always mint distinct versions. Returns the minted
    * version. */
  def commit(
      spark: SparkSession,
      df: DataFrame,
      tablePath: String,
      append: Boolean,
      ts: Option[Long] = None,
      derivedFrom: Option[Long] = None,
      verb: String = "commit"): Long = {
    val observed = latestVersion(spark, tablePath)
    val version = claimVersion(spark, tablePath,
      observed.map(_ + 1L).getOrElse(0L))
    val dataPath = s"$tablePath/$DataDir/v$version"
    val prepared = prepareBatch(spark, tablePath, observed, df)
    toPhysical(spark, tablePath, observed, prepared)
      .write.mode("errorifexists").parquet(dataPath)
    val fresh = footerCounts(spark,
      listDataFiles(spark, dataPath).map((_, null: String)))
    if (append)
      publishAppend(spark, tablePath, version, fresh, observed,
        prepared.schema, ts)
    else derivedFrom match {
      case Some(d) =>
        publishDerived(spark, tablePath, version, fresh,
          nullableTop(prepared.schema).json, ts, d, verb)
      case None =>
        publish(spark, tablePath, version, fresh, None, prepared.schema,
          ts)
    }
  }

  /** Append `df` onto an EXPLICIT parent generation rather than the
    * physical head — the cross-table atomic commit's convergence verb
    * ([[graft.operators.Catalog.commitAtomic]]): after a torn
    * multi-table commit, a table's physical head may be a generation
    * NO catalog reader ever saw (committed, never pinned), and a
    * plain append-retry would double its rows into the table. This
    * verb BRANCHES OVER such generations: the new generation's
    * manifest rows are the stated parent's plus the fresh files', its
    * recorded lineage parent is the stated one, and the batch is
    * prepared under the PARENT's governance (the pinned lineage's
    * constraints/mapping/generated columns — a governance change
    * committed outside the pinned lineage is branched over with the
    * data, the same boundary). The version still claims above the
    * physical head so the generation is the new maximum. The
    * branched-over generation's rows stay unpinned and die by
    * retention. Single-logical-writer per table (the catalog commit's
    * own contract); racing path-direct appends may interleave their
    * rows out of the branch, which is exactly what pinning readers to
    * catalog generations is for. */
  def commitOntoParent(
      spark: SparkSession,
      df: DataFrame,
      tablePath: String,
      parent: Option[Long],
      ts: Option[Long] = None): Long = {
    parent.foreach { p =>
      require(manifestFor(spark, tablePath, p).nonEmpty,
        s"commitOntoParent: parent version $p of $tablePath is not in " +
          "the manifest (never committed, or expired by vacuum)")
    }
    val head = latestVersion(spark, tablePath)
    val version = claimVersion(spark, tablePath,
      head.map(_ + 1L).getOrElse(0L))
    val dataPath = s"$tablePath/$DataDir/v$version"
    val prepared = prepareBatch(spark, tablePath, parent, df)
    toPhysical(spark, tablePath, parent, prepared)
      .write.mode("errorifexists").parquet(dataPath)
    val fresh = footerCounts(spark,
      listDataFiles(spark, dataPath).map((_, null: String)))
    // branching over the physical head (parent != head) skips interior
    // generations PERMANENTLY — mark the generation BEFORE its manifest
    // publishes, so any reader that sees it classifies its interiors as
    // deliberate instead of waiting out the doomed-racer heuristic
    if (head != parent) {
      val f = fs(spark, tablePath)
      val live = new Path(s"$tablePath/$VersionsDir")
      if (!f.exists(live)) f.mkdirs(live)
      f.create(branchOverMarker(tablePath, version), true).close()
    }
    publish(spark, tablePath, version, fresh, parent, prepared.schema, ts)
  }

  /** [[commit]] over a HIVE-PARTITIONED layout: the batch is written
    * `partitionBy(partCol)` (one `partCol=value/` directory per value),
    * and every manifest row carries its partition fragment — so
    * [[scanPartitionAsOf]] can answer "partition P as of version V"
    * from the manifest alone, touching no other partition's directory,
    * and [[readAsOf]] rebuilds the partition column from the paths.
    * Time travel × partition skip is the standard lakehouse
    * composition (an IVF cell store or a by-date event table can now
    * be versioned); append commits still share the parent's files,
    * partition fragments and all. */
  def commitPartitioned(
      spark: SparkSession,
      df: DataFrame,
      tablePath: String,
      partCol: String,
      append: Boolean,
      ts: Option[Long] = None,
      derivedFrom: Option[Long] = None,
      verb: String = "commitPartitioned"): Long = {
    require(df.columns.contains(partCol),
      s"commitPartitioned: frame has no column '$partCol'")
    val observed = latestVersion(spark, tablePath)
    val version = claimVersion(spark, tablePath,
      observed.map(_ + 1L).getOrElse(0L))
    val dataPath = s"$tablePath/$DataDir/v$version"
    val prepared = prepareBatch(spark, tablePath, observed, df)
    toPhysical(spark, tablePath, observed, prepared)
      .write.mode("errorifexists").partitionBy(partCol).parquet(dataPath)
    val fresh = footerCounts(spark, listPartitionedFiles(spark, dataPath))
    if (append)
      publishAppend(spark, tablePath, version, fresh, observed,
        prepared.schema, ts)
    else derivedFrom match {
      case Some(d) =>
        publishDerived(spark, tablePath, version, fresh,
          nullableTop(prepared.schema).json, ts, d, verb)
      case None =>
        publish(spark, tablePath, version, fresh, None, prepared.schema,
          ts)
    }
  }

  /** (file, fragment) rows of a freshly written partitioned batch. */
  private def listPartitionedFiles(
      spark: SparkSession,
      dataPath: String): Seq[(String, String)] =
    fs(spark, dataPath).listStatus(new Path(dataPath))
      .filter(s => s.isDirectory && s.getPath.getName.contains("="))
      .toSeq
      .flatMap { d =>
        listDataFiles(spark, d.getPath.toString)
          .map((_, d.getPath.getName))
      }
      .sortBy(_._1)

  /** Read a set of partitioned manifest rows, partition column rebuilt
    * via per-version basePath groups. With a manifest-carried `schema`
    * the read plans entirely from metadata — files missing an evolved
    * column null-fill it, no footer is opened for schema; without one
    * (legacy generations) each group footer-merges. */
  private def readPartedFiles(
      spark: SparkSession,
      rows: Seq[(String, String)],
      schema: Option[org.apache.spark.sql.types.StructType],
      withMeta: Boolean = false): DataFrame =
    rows
      .groupBy { case (f, _) => new Path(f).getParent.getParent.toString }
      .toSeq.sortBy(_._1)
      .map { case (root, fs) =>
        val rd = spark.read.option("basePath", root)
        val scan = schema.fold(rd.option("mergeSchema", "true"))(rd.schema)
          .parquet(fs.map(_._1).toIndexedSeq: _*)
        if (withMeta) attachRowMeta(scan) else scan
      }
      .reduceLeft((a, b) => a.unionByName(b, allowMissingColumns = true))

  /** Attach the per-row identity a DV apply joins on — must run
    * directly on a parquet scan, where the `_metadata` struct
    * resolves. */
  private def attachRowMeta(scan: DataFrame): DataFrame =
    scan.withColumn(DvFileCol, col("_metadata.file_path"))
      .withColumn(DvPosCol, col("_metadata.row_index"))

  /** MERGE (keyed upsert) into the latest snapshot of a PARTITIONED
    * table, copy-on-write at PARTITION scope — the lakehouse verb that
    * makes daily corrections affordable: only the partitions the
    * update batch touches are rewritten (their surviving rows
    * anti-joined on `keyCols`, unioned with the updates); every
    * untouched partition's files carry over into the new manifest
    * generation as POINTERS, byte-identical and never read. A
    * whole-table rewrite per merge — the naive copy-on-write — is
    * O(table) daily; this is O(touched partitions), which is the whole
    * point of partitioning the snapshot.
    *
    * Contract: `keyCols` identify rows globally and a key never moves
    * partitions (the standard date-partitioned layout); an update row
    * both deletes its key's old row (if its partition is touched) and
    * inserts itself. Readers of older versions are untouched; the
    * rewritten partitions' old files die later via [[vacuum]].
    *
    * `opCol` (optional) carries per-row verbs — `"upsert"` (replace or
    * insert, the default behavior) or `"delete"` (remove the key
    * without re-inserting, the CDC-correction shape
    * [[Changes.applyCdc]] produces). Deletes touch their partition
    * like upserts do (its survivors are rewritten minus the key); a
    * partition emptied entirely simply has no files in the new
    * generation. Any other verb is refused loudly. */
  def mergePartitioned(
      spark: SparkSession,
      tablePath: String,
      updates: DataFrame,
      keyCols: Seq[String],
      partCol: String,
      opCol: Option[String] = None): Long = {
    require(keyCols.nonEmpty, "mergePartitioned needs key columns")
    require(updates.columns.contains(partCol),
      s"mergePartitioned: updates frame has no column '$partCol'")
    requireValidOps(updates, opCol)
    val latest = latestVersion(spark, tablePath).getOrElse(
      throw new IllegalArgumentException(
        s"mergePartitioned: $tablePath has no committed versions"))
    val parentRows = manifestRows(spark, tablePath, latest)
    require(parentRows.forall(_._2 != null),
      s"mergePartitioned needs a partitioned table (commitPartitioned); " +
        s"version $latest of $tablePath carries flat files")
    val touched = updates
      .select(col(partCol).cast("string")).distinct()
      .collect().map(r => partFragment(partCol, r.getString(0))).toSet
    val (touchedFiles, untouched) =
      parentRows.partition(r => touched.contains(r._2))
    val version = claimVersion(spark, tablePath, latest + 1L)
    val dataPath = s"$tablePath/$DataDir/v$version"
    val parentSchema = storedSchema(spark, tablePath, latest)
    // every update row — upsert AND delete — evicts its key from the
    // touched survivors; only upserts re-insert
    val inserts = opCol.fold(updates)(op =>
      updates.filter(col(op) === "upsert").drop(op))
    // the governing deletion vectors apply to the touched-partition
    // scan too — a rewrite that read the raw files would resurrect
    // DV-deleted rows into the new generation's fresh files
    val dv = dvSet(spark, tablePath, latest)
    val l2p = logicalToPhysical(colMapAsOf(spark, tablePath, latest))
    val survivors =
      if (touchedFiles.isEmpty) inserts.limit(0)
      else
        readWithDv(spark,
          touchedFiles.map { case (f, p, _) => (f, p) },
          parentSchema, dv, l2p)
          .join(updates.select(keyCols.map(col): _*).distinct(),
            keyCols, "left_anti")
    val prepared = prepareBatch(spark, tablePath, Some(latest),
      survivors.unionByName(inserts))
    toPhysical(spark, tablePath, Some(latest), prepared)
      .write.mode("errorifexists").partitionBy(partCol).parquet(dataPath)
    val schema = parentSchema
      .map(ps => mergeSchemas(ps, nullableTop(prepared.schema)))
      .getOrElse(nullableTop(prepared.schema))
    publishDerived(spark, tablePath, version,
      untouched ++
        footerCounts(spark, listPartitionedFiles(spark, dataPath)),
      schema.json, None, latest, "mergePartitioned")
  }

  /** DYNAMIC PARTITION OVERWRITE into a partitioned snapshot table —
    * the idempotent daily-reload verb (Delta's `replaceWhere` /
    * Hive's `INSERT OVERWRITE ... PARTITION` dynamic mode): exactly
    * the partitions PRESENT IN the batch are replaced wholesale by its
    * rows; every untouched partition's files carry into the new
    * generation as pointers. Re-running a corrected reload for one day
    * converges to the same table no matter how many times it lands —
    * the property an append-based reload lacks (duplicates) and a
    * keyed MERGE only approximates when the source can DROP rows
    * (a vanished row survives a merge; an overwrite removes it).
    * O(touched partitions) like [[mergePartitioned]], no keys needed.
    * Constraints, the column mapping and deletion vectors compose: the
    * batch is guard-checked and physically translated, and untouched
    * partitions' DV entries keep governing (replaced files leave the
    * lineage, their entries go dead). Returns the minted version. */
  def replacePartitions(
      spark: SparkSession,
      tablePath: String,
      df: DataFrame,
      partCol: String): Long = {
    require(df.columns.contains(partCol),
      s"replacePartitions: frame has no column '$partCol'")
    val latest = latestVersion(spark, tablePath).getOrElse(
      throw new IllegalArgumentException(
        s"replacePartitions: $tablePath has no committed versions"))
    val parentRows = manifestRows(spark, tablePath, latest)
    require(parentRows.forall(_._2 != null),
      s"replacePartitions needs a partitioned table (commitPartitioned); " +
        s"version $latest of $tablePath carries flat files")
    val touched = df
      .select(col(partCol).cast("string")).distinct()
      .collect().map(r => partFragment(partCol, r.getString(0))).toSet
    val untouched = parentRows.filterNot(r => touched.contains(r._2))
    val version = claimVersion(spark, tablePath, latest + 1L)
    val dataPath = s"$tablePath/$DataDir/v$version"
    val prepared = prepareBatch(spark, tablePath, Some(latest), df)
    toPhysical(spark, tablePath, Some(latest), prepared)
      .write.mode("errorifexists").partitionBy(partCol).parquet(dataPath)
    val parentSchema = storedSchema(spark, tablePath, latest)
    val schema = parentSchema
      .map(ps => mergeSchemas(ps, nullableTop(prepared.schema)))
      .getOrElse(nullableTop(prepared.schema))
    publishDerived(spark, tablePath, version,
      untouched ++
        footerCounts(spark, listPartitionedFiles(spark, dataPath)),
      schema.json, None, latest, "replacePartitions")
  }

  /** Reject unknown verbs in an op column before any data moves — a
    * typo'd `"detele"` must not silently upsert or silently vanish.
    * One bounded job over the delta-sized updates frame. */
  private def requireValidOps(updates: DataFrame, opCol: Option[String]): Unit =
    opCol.foreach { op =>
      require(updates.columns.contains(op),
        s"merge: updates frame has no op column '$op'")
      val bad = updates.filter(!col(op).isin("upsert", "delete"))
        .select(col(op)).limit(1).collect()
      require(bad.isEmpty,
        s"merge: op column '$op' carries unknown verb " +
          s"'${bad.head.get(0)}' — only upsert/delete are defined")
    }

  /** MERGE into an UNPARTITIONED snapshot table: same key semantics as
    * [[mergePartitioned]] (upserts replace-or-insert, deletes evict)
    * committed as a REPLACE version. This is an O(table) rewrite — the
    * whole latest snapshot is scanned and rewritten — which is the
    * honest cost for a table with no partition to scope the rewrite
    * to: the right verb for dimension/config tables that fit a few
    * files. Fact-scale tables should be committed via
    * [[commitPartitioned]] and merged at partition scope. Applied to a
    * PARTITIONED table it behaves like [[optimize]]: rows and columns
    * are preserved (the partition column becomes a data column) but
    * the new version's layout is flat — re-partitioning afterwards is
    * [[commitPartitioned]]'s job if wanted. */
  def merge(
      spark: SparkSession,
      tablePath: String,
      updates: DataFrame,
      keyCols: Seq[String],
      opCol: Option[String] = None,
      ts: Option[Long] = None): Long = {
    require(keyCols.nonEmpty, "merge needs key columns")
    requireValidOps(updates, opCol)
    val latest = latestVersion(spark, tablePath).getOrElse(
      throw new IllegalArgumentException(
        s"merge: $tablePath has no committed versions"))
    val inserts = opCol.fold(updates)(op =>
      updates.filter(col(op) === "upsert").drop(op))
    val survivors = readAsOf(spark, tablePath, latest)
      .join(updates.select(keyCols.map(col): _*).distinct(),
        keyCols, "left_anti")
    commit(spark, survivors.unionByName(inserts), tablePath,
      append = false, ts = ts, derivedFrom = Some(latest), verb = "merge")
  }

  /** Read snapshot `version` — exactly the files its manifest
    * generation lists. Loud when the version is unknown (never
    * committed, or vacuumed away). Files carrying a partition fragment
    * are read per `data/v<K>` root with `basePath` set there, so Spark
    * rebuilds the partition column from the paths with a consistent
    * relative structure in every group; flat files read directly. */
  def readAsOf(
      spark: SparkSession,
      tablePath: String,
      version: Long): DataFrame = {
    val (rows, stored) = generationOf(spark, tablePath, version)
    val gens = resolveSidecars(spark, tablePath, version)
    val dv = dvSetOf(spark, gens)
    val l2p = logicalToPhysical(colMapOf(spark, gens))
    readWithDv(spark, rows, stored, dv, l2p)
  }

  /** Plan a read over (file, fragment) manifest rows: flat files read
    * directly, partitioned ones via [[readPartedFiles]]' basePath
    * groups. With a manifest-carried `stored` schema the plan is built
    * from metadata alone — an append that evolved the schema (columns
    * its parent's files lack) null-fills the missing columns per file,
    * no footer is opened to discover the schema; legacy generations
    * without one footer-merge, O(files), which the stored path exists
    * to avoid. For flat files the stored schema applies as-is: a mixed
    * generation's partition column (from OTHER, parted rows) simply
    * reads as a null-filled data column by name. */
  private def readFileRows(
      spark: SparkSession,
      rows: Seq[(String, String)],
      stored: Option[org.apache.spark.sql.types.StructType],
      withMeta: Boolean = false): DataFrame = {
    val (parted, flat) = rows.partition(_._2 != null)
    val reads =
      (if (flat.nonEmpty) {
        val rd = spark.read
        val scan = stored.fold(rd.option("mergeSchema", "true"))(rd.schema)
          .parquet(flat.map(_._1).toIndexedSeq: _*)
        Seq(if (withMeta) attachRowMeta(scan) else scan)
      } else Seq.empty) ++
        (if (parted.nonEmpty)
          Seq(readPartedFiles(spark, parted, stored, withMeta))
        else Seq.empty)
    reads.reduceLeft((a, b) =>
      a.unionByName(b, allowMissingColumns = true))
  }

  /** Partition-pruned read AS OF `version`: the manifest admits only
    * the files whose fragment is `partCol=value` — no other partition's
    * DIRECTORY is listed or opened, the skip is decided entirely in
    * metadata (the composition of time travel and hive partition
    * pruning). A version with no such partition is an empty answer
    * (with the snapshot's schema); an unknown version is an error.
    * `value` is rendered with `toString` then hive path-escaped
    * ([[partFragment]]), matching the writer's fragment encoding even
    * for values carrying '=', ':', '%' or '/'. */
  def scanPartitionAsOf(
      spark: SparkSession,
      tablePath: String,
      version: Long,
      partCol: String,
      value: Any): DataFrame = {
    val (all, stored) = generationOf(spark, tablePath, version)
    // under PARTITION EVOLUTION a generation mixes layouts: files not
    // keyed on partCol (another key, or flat) may still CONTAIN the
    // requested rows, and a fragment-only answer would silently drop
    // them — refuse toward the evolution-aware verb
    require(all.forall(r => r._2 != null && r._2.startsWith(s"$partCol=")),
      s"scanPartitionAsOf: version $version of $tablePath carries " +
        s"files not partitioned on '$partCol' (mixed layout) — their " +
        "rows are invisible to fragment pruning; use " +
        "scanPartitionEvolved, which scans them with a data filter")
    val frag = partFragment(partCol, String.valueOf(value))
    val hit = all.filter(_._2 == frag)
    if (hit.isEmpty) {
      // the stored schema answers "what would this scan's columns be"
      // without opening a single data file
      val schema = stored.getOrElse(readAsOf(spark, tablePath, version).schema)
      spark.createDataFrame(spark.sparkContext.emptyRDD[Row], schema)
    } else {
      val gens = resolveSidecars(spark, tablePath, version)
      val dv = dvSetOf(spark, gens)
      val l2p = logicalToPhysical(colMapOf(spark, gens))
      readWithDv(spark, hit.toSeq, stored, dv, l2p)
    }
  }

  /** Partition-pruned scan under PARTITION EVOLUTION — the Iceberg
    * mixed-spec read: a table may change its partition layout for
    * FUTURE commits without rewriting a byte of history (append a
    * differently-`partitionBy`'d batch; the manifest carries each
    * file's own fragment). A scan for `partCol = value` then
    * decomposes the generation's files three ways, all decided in
    * metadata: fragment-MATCHING files are read as the partition
    * (full skip of the directory walk); files keyed on the SAME
    * column with a different value are pruned outright; files keyed
    * on another column (or flat) fall back to a data-predicate scan —
    * partial pruning, exactly what an old-spec Iceberg partition
    * contributes, and the filter pushes to those files' row groups.
    * The evolved key must exist as a DATA column in the old files
    * (commit it as data from day one — the evolution contract);
    * composes with deletion vectors and the column mapping. */
  def scanPartitionEvolved(
      spark: SparkSession,
      tablePath: String,
      version: Long,
      partCol: String,
      value: Any): DataFrame = {
    val (all, stored) = generationOf(spark, tablePath, version)
    val frag = partFragment(partCol, String.valueOf(value))
    val hit = all.filter(_._2 == frag)
    val fallback = all.filter(r =>
      r._2 == null || !r._2.startsWith(s"$partCol="))
    val gens = resolveSidecars(spark, tablePath, version)
    val dv = dvSetOf(spark, gens)
    val l2p = logicalToPhysical(colMapOf(spark, gens))
    // each leg plans its own file-level DV split (clean files join
    // nothing); the exact-value filter commutes with the anti-join
    val legs =
      (if (hit.nonEmpty)
        Seq(readWithDv(spark, hit, stored, dv, l2p))
      else Seq.empty) ++
        (if (fallback.nonEmpty)
          Seq(readWithDv(spark, fallback, stored, dv, l2p)
            .filter(col(partCol) === lit(value)))
        else Seq.empty)
    if (legs.isEmpty) {
      val schema = stored.getOrElse(readAsOf(spark, tablePath, version).schema)
      spark.createDataFrame(spark.sparkContext.emptyRDD[Row], schema)
    } else
      legs.reduceLeft((a, b) =>
        a.unionByName(b, allowMissingColumns = true))
  }

  /** Expire every version below `keepFrom`: drop their manifest
    * generations, then delete the data files no retained generation
    * references. Returns the number of files deleted. The manifest
    * rewrite stages through a sibling directory, moves the live
    * manifest ASIDE (`_versions_prev`), renames the staged one in, and
    * only then deletes the aside copy — so a COMPLETE manifest exists
    * on disk at every instant. A crash between the renames (live
    * missing, staged complete) is rolled forward by
    * [[recoverManifestSwap]] on the next read; a crash before them
    * leaves the live manifest untouched. */
  /** Replace the ENTIRE live manifest with `rows` via the crash-safe
    * staged swap ([[recoverManifestSwap]]'s contract): staged write →
    * live moved aside → staged renamed in → aside deleted, so a
    * COMPLETE manifest exists on disk at every instant. */
  /** Maintenance guard: the whole-manifest swap verbs ([[vacuum]],
    * [[purgeKeys]]) rewrite EVERY generation's rows from a
    * point-in-time snapshot — a commit racing past that snapshot would
    * be silently ERASED by the swap. Checked immediately before the
    * swap, refusing retry-ably; the residual check-to-swap window is
    * the single-maintenance-writer contract (maintenance must not race
    * data commits), which this guard narrows from the whole
    * rewrite job to one rename. */
  private[graft] def requireHeadUnmoved(
      spark: SparkSession,
      tablePath: String,
      observed: Option[Long],
      verb: String): Unit = {
    val now = latestVersion(spark, tablePath)
    if (now != observed)
      throw new ConcurrentCommitException(
        s"$verb took its manifest snapshot at head " +
          s"${observed.fold("<empty>")(_.toString)} of $tablePath, but " +
          s"the published head is now ${now.fold("<empty>")(_.toString)}" +
          " — a commit raced the maintenance rewrite and would be " +
          "erased by the swap; re-read and retry")
  }

  private def swapManifest(
      spark: SparkSession,
      tablePath: String,
      rows: Seq[(Long, String, String, String, Option[Long], Option[Long],
        Option[Long])])
      : Unit = {
    val f = fs(spark, tablePath)
    val live = new Path(s"$tablePath/$VersionsDir")
    val staged = new Path(s"$tablePath/${VersionsDir}_staged")
    val prev = new Path(s"$tablePath/${VersionsDir}_prev")
    val raw = new Path(s"$tablePath/${VersionsDir}_staging_raw")
    if (f.exists(staged)) f.delete(staged, true)
    if (f.exists(prev)) f.delete(prev, true) // inert leftover of a crash
    if (f.exists(raw)) f.delete(raw, true)
    // the rewritten manifest keeps ONE FILE PER GENERATION under the
    // canonical gen-v<N>.parquet name — the invariant every
    // version-bounded read ([[manifestFor]], [[listGenerations]])
    // indexes by, which a single coalesced file would destroy for the
    // whole retained history. Small retained histories stage each
    // generation DRIVER-SIDE ([[writeMetaParquet]] — the rows are a
    // driver Seq already, and the partitioned write job costs a
    // shuffle plus job-commit staging per vacuum); past the fan-out
    // threshold one partitioned write job stages every generation
    // (`gen` duplicates `version` because partitionBy consumes its
    // column) and each part renames to its canonical name. Either way
    // the staged dir is complete and correctly named BEFORE the live
    // swap ([[recoverManifestSwap]]'s contract).
    val byGen = rows.groupBy(_._1)
    if (byGen.size <= SwapManifestFanoutThreshold) {
      f.mkdirs(staged)
      val conf = spark.sparkContext.hadoopConfiguration
      byGen.toSeq.sortBy(_._1).foreach { case (v, genRows) =>
        writeMetaParquet(conf, new Path(s"$staged/gen-v$v.parquet"),
          ManifestCols, genRows.map { case (ver, file, p, sj, n, ts, par) =>
            Seq[Any](ver, file, p, sj, n, ts, par) })
      }
    } else {
      spark.createDataFrame(rows)
        .toDF("version", "file", "part", "schema_json", "rows", "commit_ts",
          "parent")
        .withColumn("gen", col("version"))
        .repartition(col("gen"))
        .write.partitionBy("gen").parquet(raw.toString)
      f.mkdirs(staged)
      f.listStatus(raw).filter(s => s.isDirectory &&
        s.getPath.getName.startsWith("gen=")).foreach { d =>
        val v = d.getPath.getName.stripPrefix("gen=").toLong
        val parts = listDataFiles(spark, d.getPath.toString)
        require(parts.length == 1,
          s"manifest rewrite staged ${parts.length} files for generation " +
            s"$v of $tablePath — expected exactly one")
        require(f.rename(new Path(parts.head),
          new Path(s"$staged/gen-v$v.parquet")),
          s"manifest rewrite could not stage generation $v of $tablePath")
      }
      f.delete(raw, true)
    }
    // branch-over markers are presence-only — stage copies for the
    // RETAINED generations so the swap doesn't silently demote their
    // readers to the timing fallback (a crash mid-swap loses them,
    // which degrades to that same safe fallback, never to a wrong
    // classification)
    val kept = rows.map(_._1).toSet
    f.listStatus(live).map(_.getPath.getName)
      .filter(_.startsWith("_branchover-v"))
      .flatMap(n => n.stripPrefix("_branchover-v").toLongOption)
      .filter(kept.contains)
      .foreach(v => f.create(new Path(s"$staged/_branchover-v$v"),
        true).close())
    require(f.rename(live, prev),
      s"manifest swap failed for $tablePath — live manifest could not " +
        s"be moved aside; staged manifest left at $staged, data intact")
    require(f.rename(staged, live),
      s"manifest swap failed for $tablePath — live manifest moved to " +
        s"$prev, staged left at $staged; recovery rolls $staged forward")
    f.delete(prev, true)
  }

  def vacuum(
      spark: SparkSession,
      tablePath: String,
      keepFrom: Long): Long = {
    // retained MOR versions resolve tombstone sidecars CUMULATIVELY
    // below themselves — expiring any part of that chain would
    // silently resurrect deletes; fold first
    latestVersion(spark, tablePath).foreach(h =>
      requireNotEqGoverned(spark, tablePath, h, "vacuum"))
    val m = manifest(spark, tablePath)
    val keptRows = m.filter(col("version") >= keepFrom)
      .select(col("version"), col("file"), col("part"), col("schema_json"),
        col("rows"), col("commit_ts"), col("parent"))
      .collect()
    require(keptRows.nonEmpty,
      s"vacuum(keepFrom=$keepFrom) would retain no versions of $tablePath")
    val kept = keptRows.map(_.getString(1)).toSet
    // a TAG is a retention pin (the Iceberg contract): expiring a
    // tagged version would turn its name into a dangling pointer —
    // refuse loudly; drop the tag or raise keepFrom
    val pinnedBelow = tags(spark, tablePath).filter(_._2 < keepFrom)
    require(pinnedBelow.isEmpty,
      s"vacuum(keepFrom=$keepFrom) would expire tagged version(s) " +
        pinnedBelow.map { case (n, v) => s"'$n'→$v" }.mkString(", ") +
        s" of $tablePath — removeTag first, or keep from lower")
    val all = m.select(col("file")).distinct().collect()
      .map(_.getString(0))
    val doomed = all.filterNot(kept)
    // resolved BEFORE the manifest swap below — `m` reads the live
    // manifest lazily, and post-swap the dropped generations are gone
    val droppedVersions =
      m.select(col("version")).distinct().collect().map(_.getLong(0))
        .filter(_ < keepFrom)

    val f = fs(spark, tablePath)
    requireHeadUnmoved(spark, tablePath,
      Some(m.select(col("version")).collect().map(_.getLong(0)).max),
      "vacuum")
    swapManifest(spark, tablePath,
      keptRows.toSeq.map(r => (r.getLong(0), r.getString(1),
        if (r.isNullAt(2)) null else r.getString(2),
        if (r.isNullAt(3)) null else r.getString(3),
        if (r.isNullAt(4)) None else Some(r.getLong(4)),
        if (r.isNullAt(5)) None else Some(r.getLong(5)),
        // a parent expired by this vacuum keeps its number: lineage
        // below keepFrom is historical fact, and inLineage treats the
        // resulting chain break as a conflict, which is the safe side
        if (r.isNullAt(6)) None else Some(r.getLong(6)))))

    // EXTERNAL files (a clone's pointers into its source) only drop
    // from the manifest — the source table still owns and references
    // them; deleting would corrupt it. A BRANCH root's vacuum
    // additionally spares files its PARENT table's manifest references
    // (a fast-forward published them into main's history): the branch
    // dropped them, but main now owns their lifecycle. Symmetrically,
    // MAIN's vacuum spares files a LIVE branch's manifest still
    // references — a branch forked below keepFrom (or fast-forwarded
    // files under the branch's own data dir) must survive main's
    // retention until the branch is dropped.
    val parentRef = parentTableRefs(spark, tablePath)
    val branchRef = liveBranchRefs(spark, tablePath)
    val deleted = doomed.count { file =>
      ownsFile(tablePath, file) && !parentRef.contains(normPath(file)) &&
        !branchRef.contains(normPath(file)) &&
        { f.delete(new Path(file), false); true }
    }

    // deletion-vector sidecars do NOT simply ride their version: a
    // delete committed below keepFrom still GOVERNS every retained
    // read (resolveDvDir walks downward). Materialize the oldest
    // retained version's governing set AT keepFrom first — pruned to
    // files a retained generation still references (DV compaction) —
    // then the dropped dirs are safe to expire: every retained
    // version's resolution lands on its own dir or this one,
    // unchanged in content.
    resolveDvDir(spark, tablePath, keepFrom).foreach { case (dvV, dir) =>
      if (dvV < keepFrom) {
        val keptFiles = spark.createDataFrame(
          kept.toSeq.map(Tuple1(_))).toDF("file")
        val pruned = spark.read.schema(dvSchema).parquet(dir)
          .join(keptFiles, Seq("file"), "left_semi")
        writeDvSet(spark, tablePath, keepFrom, pruned)
      }
    }
    // the CHECK-constraint sidecar follows the same rule (no file
    // pruning — constraints reference columns, not files)
    sidecarResolve(spark, constraintsRoot(tablePath), keepFrom)
      .foreach { case (cV, _) =>
        if (cV < keepFrom)
          writeConstraints(spark, tablePath, keepFrom,
            constraintsAsOf(spark, tablePath, keepFrom))
      }
    // and the column mapping
    sidecarResolve(spark, colMapRoot(tablePath), keepFrom)
      .foreach { case (cV, _) =>
        if (cV < keepFrom)
          writeColMap(spark, tablePath, keepFrom,
            colMapAsOf(spark, tablePath, keepFrom))
      }
    // and generated columns
    sidecarResolve(spark, genColsRoot(tablePath), keepFrom)
      .foreach { case (cV, _) =>
        if (cV < keepFrom)
          writeGenCols(spark, tablePath, keepFrom,
            generatedColumnsAsOf(spark, tablePath, keepFrom))
      }

    // per-version sidecars ride their version: expired generations'
    // stats dirs and commit markers go with their data (retained
    // versions keep theirs; claims only ever move upward, so dropping
    // an old marker can never free a number for re-minting)
    droppedVersions.foreach { v =>
      Seq(statsDir(tablePath, v), bloomDir(tablePath, v),
        dvDir(tablePath, v), constraintsDir(tablePath, v),
        colMapDir(tablePath, v), genColsDir(tablePath, v)).foreach { d =>
        val sd = new Path(d)
        if (f.exists(sd)) f.delete(sd, true)
      }
      val mk = new Path(s"$tablePath/$CommitsDir/v$v")
      if (f.exists(mk)) f.delete(mk, false)
    }
    deleted.toLong
  }

  /** When `tablePath` is a BRANCH root (`<parent>/_branches/<name>`),
    * the normalized files the parent table's manifest references — a
    * fast-forward publishes branch files into main's history, so the
    * branch's own destructive verbs must never delete them. Empty for
    * ordinary roots; metadata-scale for branches (one parent manifest
    * file-list read, the price of a destructive verb). */
  private def parentTableRefs(
      spark: SparkSession,
      tablePath: String): Set[String] = {
    val p = new Path(tablePath)
    if (p.getParent == null || p.getParent.getName != "_branches")
      Set.empty
    else {
      val parentRoot = p.getParent.getParent.toString
      manifest(spark, parentRoot).select(col("file")).distinct()
        .collect().map(r => normPath(r.getString(0))).toSet
    }
  }

  /** The mirror guard of [[parentTableRefs]]: every normalized file a
    * LIVE branch's manifest still references. Main's destructive verbs
    * (vacuum, removeOrphans) must spare these — a branch forked at v5
    * keeps reading v5's files after main expires v5, and a
    * fast-forward repoints main at files physically under the branch's
    * own data dir that the branch history also still needs. Recursive
    * so nested branches are covered; metadata-scale (one manifest
    * file-list read per live branch, only on destructive verbs). */
  private def liveBranchRefs(
      spark: SparkSession,
      tablePath: String): Set[String] =
    branches(spark, tablePath).flatMap { case (name, _, _) =>
      val root = branchPath(tablePath, name)
      manifest(spark, root).select(col("file")).distinct()
        .collect().map(r => normPath(r.getString(0))) ++
        liveBranchRefs(spark, root)
    }.toSet

  // ------------------------------------------------------------------
  // TAGS — named version pointers (the Iceberg tag shape)
  // ------------------------------------------------------------------

  private def tagsRoot(tablePath: String): String = s"$tablePath/_tags"

  private def requireTagName(name: String): Unit = {
    require(name.nonEmpty && name.forall(c =>
      c.isLetterOrDigit || c == '.' || c == '_' || c == '-'),
      s"tag name '$name': letters, digits, '.', '_', '-' only — the " +
        "name is a filesystem path fragment")
    // SQL `VERSION AS OF '<ref>'` resolves a numeric ref as a snapshot
    // number FIRST, so an all-digit tag/branch name would be accepted
    // here yet permanently shadowed from SQL travel — refuse it
    require(!name.forall(_.isDigit),
      s"tag name '$name': all-digit names are reserved for snapshot " +
        "version numbers (VERSION AS OF would never resolve the tag)")
  }

  /** Name `version` — a human-stable address for time travel
    * (`readTag`, SQL `VERSION AS OF '<name>'`) and a RETENTION PIN
    * ([[vacuum]] refuses to expire a tagged version). Re-tagging an
    * existing name repoints it (single-maintenance-writer, like every
    * metadata sweep verb). The version must be committed and
    * unexpired. */
  def tag(
      spark: SparkSession,
      tablePath: String,
      name: String,
      version: Long): Unit = {
    requireTagName(name)
    require(manifestFor(spark, tablePath, version).nonEmpty,
      s"tag '$name': version $version of $tablePath is not in the " +
        "manifest (never committed, or expired by vacuum)")
    val f = fs(spark, tablePath)
    val dir = new Path(tagsRoot(tablePath))
    if (!f.exists(dir)) f.mkdirs(dir)
    val out = f.create(new Path(s"${tagsRoot(tablePath)}/$name"), true)
    try out.write(version.toString.getBytes("UTF-8"))
    finally out.close()
  }

  /** All (name, version) tags of the table — one directory listing
    * plus one tiny read per tag; metadata-scale by construction. */
  def tags(spark: SparkSession, tablePath: String): Seq[(String, Long)] = {
    val f = fs(spark, tablePath)
    val dir = new Path(tagsRoot(tablePath))
    if (!f.exists(dir)) Seq.empty
    else f.listStatus(dir).filter(_.isFile).toSeq.map { st =>
      val in = f.open(st.getPath)
      val body =
        try {
          val buf = new Array[Byte](32)
          val n = in.read(buf)
          new String(buf, 0, math.max(n, 0), "UTF-8").trim
        } finally in.close()
      st.getPath.getName -> body.toLong
    }.sortBy(_._1)
  }

  /** The version a tag names, if the tag exists. */
  def tagVersion(
      spark: SparkSession,
      tablePath: String,
      name: String): Option[Long] = {
    requireTagName(name)
    tags(spark, tablePath).collectFirst { case (`name`, v) => v }
  }

  /** Drop a tag (the version stays readable by number; its retention
    * pin is gone). True when the tag existed. */
  def removeTag(
      spark: SparkSession,
      tablePath: String,
      name: String): Boolean = {
    requireTagName(name)
    val f = fs(spark, tablePath)
    val p = new Path(s"${tagsRoot(tablePath)}/$name")
    f.exists(p) && f.delete(p, false)
  }

  /** [[readAsOf]] addressed by tag name. */
  def readTag(
      spark: SparkSession,
      tablePath: String,
      name: String): DataFrame =
    readAsOf(spark, tablePath,
      tagVersion(spark, tablePath, name).getOrElse(
        throw new IllegalArgumentException(
          s"no tag '$name' on $tablePath — known: " +
            tags(spark, tablePath).map(_._1).mkString(", "))))

  /** Retention-policy sugar over [[vacuum]]: keep exactly the LAST
    * `retainLast` versions (tags still pin — vacuum's own guard
    * refuses to expire a tagged version, loudly). Already within
    * policy is a no-op. Returns (keepFrom, deletedFiles). */
  def expireSnapshots(
      spark: SparkSession,
      tablePath: String,
      retainLast: Int): (Long, Long) = {
    require(retainLast >= 1,
      s"expireSnapshots: retainLast must be >= 1, got $retainLast")
    val versions = listGenerations(spark, tablePath)
    if (versions.length <= retainLast)
      (versions.headOption.getOrElse(0L), 0L)
    else {
      val keepFrom = versions.takeRight(retainLast).head
      (keepFrom, vacuum(spark, tablePath, keepFrom))
    }
  }

  private def statsDir(tablePath: String, version: Long): String =
    s"$tablePath/_stats/v$version"

  private def bloomDir(tablePath: String, version: Long): String =
    s"$tablePath/_bloom/v$version"

  // ------------------------------------------------------------------
  // Deletion vectors — row-level DELETE without rewriting data files
  // ------------------------------------------------------------------

  private def dvRoot(tablePath: String): String = s"$tablePath/_dv"

  private def dvDir(tablePath: String, version: Long): String =
    s"${dvRoot(tablePath)}/v$version"

  /** Internal column names for the row identity a DV apply needs —
    * captured from the parquet scan's `_metadata` struct, rendered by
    * the same scan machinery on both the delete and the read side, so
    * equality is exact without any path normalization. */
  private val DvFileCol = "__dv_file"
  private val DvPosCol = "__dv_pos"
  private val MergeSrcSentinel = "__merge_src"

  private def dvSchema = org.apache.spark.sql.types.StructType(Seq(
    org.apache.spark.sql.types.StructField("file",
      org.apache.spark.sql.types.StringType),
    org.apache.spark.sql.types.StructField("row_index",
      org.apache.spark.sql.types.LongType)))

  /** Latest-at-or-below resolution over a `_<root>/v<N>` sidecar
    * family — the shared lookup for versioned table metadata that
    * GOVERNS all later versions until superseded (deletion vectors,
    * CHECK constraints): each dir holds the FULL applicable set of its
    * version (not a delta), so append commits inherit their ancestor's
    * set without copying anything, while [[rollback]]/[[cloneTable]]
    * re-materialize their target's set so restored content never
    * inherits metadata committed after the target. Returns
    * (sidecarVersion, dir); None when nothing governs `version`. */
  private def sidecarResolve(
      spark: SparkSession,
      rootDir: String,
      version: Long): Option[(Long, String)] = {
    val f = fs(spark, rootDir)
    if (!f.exists(new Path(rootDir))) None
    else pickAtOrBelow(sidecarFamilyListed(f, rootDir), version)
  }

  /** One LISTING of a sidecar family root: every `v<N>` generation dir,
    * sorted by version — the shared I/O both [[sidecarResolve]] and the
    * combined [[resolveSidecars]] pass pick from (and count, for the
    * listing-budget spec). */
  private def sidecarFamilyListed(
      f: org.apache.hadoop.fs.FileSystem,
      rootDir: String): Seq[(Long, String)] = {
    sidecarListings.incrementAndGet()
    f.listStatus(new Path(rootDir)).filter(_.isDirectory).map(_.getPath)
      .flatMap { p =>
        val n = p.getName
        if (n.startsWith("v"))
          scala.util.Try(n.drop(1).toLong).toOption.map(_ -> p.toString)
        else None
      }
      .sortBy(_._1).toSeq
  }

  private def pickAtOrBelow(
      family: Seq[(Long, String)],
      version: Long): Option[(Long, String)] =
    family.filter(_._1 <= version).lastOption

  // ------------------------------------------------------------------
  // EQUALITY DELETES — merge-on-read upsert (the Iceberg v2
  // equality-delete shape): a CDC micro-batch commits O(batch)
  // metadata — keyed tombstones + its own fresh files — and NO
  // existing data file is opened or rewritten; readers resolve the
  // tombstones at scan time. Unlike the superseding DV family, `_eq`
  // generations ACCUMULATE: the read unions every tombstone set at or
  // below the queried version, scoping each to rows from files OLDER
  // than its commit (each sidecar records its commit's own fresh
  // files, so per-file age derives from O(batches-since-fold) tiny
  // lists, never a history walk). [[foldEqDeletes]] materializes the
  // resolved face as one copy-on-write replace and drops the
  // tombstones — the compaction that bounds read-side join depth.
  // Governed faces refuse every plain read/DML verb loudly
  // ([[resolveSidecars]]' allowEq gate + [[requireNotEqGoverned]]);
  // history inside a folded window refuses too (the tombstones that
  // defined those faces are gone — a raw answer would be a lie).
  // ------------------------------------------------------------------

  private def eqRoot(tablePath: String): String = s"$tablePath/_eq"

  private def eqDir(tablePath: String, version: Long): String =
    s"${eqRoot(tablePath)}/v$version"

  private def eqFoldMarker(tablePath: String): Path =
    new Path(s"${eqRoot(tablePath)}/folded")

  /** The per-fold expiry windows, one `(firstEqVersion, foldVersion)`
    * line per fold ever run: version v's MOR face is expired iff some
    * window holds `firstEq <= v < foldV`. PER-FOLD, not one global
    * window — a second fold must not retroactively swallow the first
    * fold's materialized copy-on-write face (or plain commits between
    * folds), which a single `(globalMin, latestFold)` pair would. */
  private def readEqFoldWindows(
      f: org.apache.hadoop.fs.FileSystem,
      tablePath: String): Seq[(Long, Long)] = {
    val p = eqFoldMarker(tablePath)
    if (!f.exists(p)) Seq.empty
    else {
      val in = f.open(p)
      try {
        val bytes = new java.io.ByteArrayOutputStream()
        val buf = new Array[Byte](4096)
        var n = in.read(buf)
        while (n > 0) { bytes.write(buf, 0, n); n = in.read(buf) }
        new String(bytes.toByteArray, "UTF-8").linesIterator
          .map(_.trim).filter(_.nonEmpty).map { line =>
            val parts = line.split(" ")
            (parts(0).toLong, parts(1).toLong)
          }.toSeq
      } finally in.close()
    }
  }

  private def inEqFoldWindow(
      windows: Seq[(Long, Long)], version: Long): Boolean =
    windows.exists { case (minEq, foldV) =>
      version >= minEq && version < foldV }

  private def eqKeysSchema(stored: org.apache.spark.sql.types.StructType,
      keyCols: Seq[String]): org.apache.spark.sql.types.StructType =
    org.apache.spark.sql.types.StructType(
      keyCols.map(k => stored.fields.find(_.name == k).getOrElse(
        throw new IllegalArgumentException(
          s"equality-delete key '$k' is not a stored column"))))

  private val eqFreshSchema = org.apache.spark.sql.types.StructType(Seq(
    org.apache.spark.sql.types.StructField("file",
      org.apache.spark.sql.types.StringType)))

  /** The eq-delete sidecar dirs at or below `version` whose version is
    * a LIVE generation — the only dirs that GOVERN. Tombstones commit
    * WITH their generation: a crashed commitEqUpsert (version claimed,
    * sidecar written, publish never landed) leaves a dir no manifest
    * references, and honoring its tombstones would apply a batch that
    * never happened (the replay re-commits under a fresh version,
    * possibly with different winners). Stale dirs are crash debris —
    * ignored here, swept by [[removeOrphans]]. One family listing +
    * one generation listing, both metadata-scale. */
  private def liveEqDirs(
      spark: SparkSession,
      tablePath: String,
      version: Long): Seq[(Long, String)] = {
    val f = fs(spark, tablePath)
    if (!f.exists(new Path(eqRoot(tablePath)))) Seq.empty
    else {
      val fam = sidecarFamilyListed(f, eqRoot(tablePath))
        .filter(_._1 <= version)
      if (fam.isEmpty) Seq.empty
      else {
        val live = listGenerations(spark, tablePath).toSet
        fam.filter(d => live.contains(d._1))
      }
    }
  }

  /** Is `version`'s face governed by equality-delete tombstones — or
    * inside a fold-expired window? The SQL catalog's scan guard: a
    * plain parquet scan of either would resurrect deleted keys. */
  private[graft] def eqGovernedAt(
      spark: SparkSession,
      tablePath: String,
      version: Long): Boolean = {
    val f = fs(spark, tablePath)
    f.exists(new Path(eqRoot(tablePath))) && (
      liveEqDirs(spark, tablePath, version).nonEmpty ||
        inEqFoldWindow(readEqFoldWindows(f, tablePath), version))
  }

  /** The DML-side guard: copy-on-write verbs on a tombstone-governed
    * face would rewrite rows WITHOUT applying the tombstones,
    * resurrecting deleted keys. */
  private def requireNotEqGoverned(
      spark: SparkSession,
      tablePath: String,
      version: Long,
      verb: String): Unit =
    require(liveEqDirs(spark, tablePath, version).isEmpty,
      s"$verb: version $version of $tablePath is governed by " +
        "equality-delete tombstones — foldEqDeletes materializes the " +
        "merge-on-read face before copy-on-write verbs apply")

  /** ONE merge-on-read upsert commit: append `upserts` as fresh files
    * and record `tombstones` (rows of exactly `keyCols`) in the
    * version's `_eq` sidecar — O(batch) data written, O(batch)
    * metadata committed, ZERO existing files opened or rewritten,
    * whatever the table size. The tombstones kill matching-key rows
    * in files OLDER than this commit only, so this batch's own
    * upserts (and any later batch's) survive their own keys' deletes —
    * the Flink→Iceberg upsert-sink contract. Blind by design: the
    * caller decides winners (an unordered feed resolves them against
    * [[readMorAsOf]] first — a key-pruned READ, still zero rewrites).
    * Composes with hive partitioning (`partCol` — fragments follow
    * the sync batches, pruning survives) and CHECK constraints
    * (enforced per sync batch inside the write job); DV/column-
    * mapping/generated-column governance still refuses toward the
    * copy-on-write verbs. */
  def commitEqUpsert(
      spark: SparkSession,
      tablePath: String,
      upserts: DataFrame,
      tombstones: DataFrame,
      keyCols: Seq[String],
      ts: Option[Long] = None,
      partCol: Option[String] = None): Long = {
    require(keyCols.nonEmpty, "commitEqUpsert needs key columns")
    val observed = latestVersion(spark, tablePath).getOrElse(
      throw new IllegalArgumentException(
        s"commitEqUpsert: $tablePath has no committed versions — " +
          "commit the base face first"))
    val gen = manifestFor(spark, tablePath, observed)
    require(gen.nonEmpty,
      s"commitEqUpsert: version $observed of $tablePath vanished " +
        "between the head resolution and its read — retry")
    val fileRows = fileRowsOf(gen)
    // the MOR lineage composes with hive partitioning: a partitioned
    // base face syncs `partitionBy(partCol)` batches (fragments follow
    // the data; partition pruning survives the lineage — see
    // [[readMorPartitionAsOf]]); a flat base refuses a partCol and
    // vice versa, so one lineage never mixes layouts
    partCol match {
      case Some(pc) =>
        require(fileRows.forall(r =>
            r._2 != null && r._2.startsWith(s"$pc=")),
          s"commitEqUpsert: $tablePath's base face is not " +
            s"hive-partitioned on '$pc' — commit it via " +
            "commitPartitioned first (one layout per MOR lineage)")
      case None =>
        require(fileRows.forall(_._2 == null),
          s"commitEqUpsert: $tablePath carries hive-partitioned " +
            "files — pass partCol so the sync batches keep the layout")
    }
    val gens = resolveSidecars(spark, tablePath, observed, allowEq = true)
    require(gens.dv.isEmpty && gens.colMap.isEmpty && gens.genCols.isEmpty,
      s"commitEqUpsert: $tablePath carries DV/column-mapping/" +
        "generated-column governance — the MOR lineage composes with " +
        "append faces and CHECK constraints only")
    val stored = schemaJsonOf(gen).map(j =>
      org.apache.spark.sql.types.DataType.fromJson(j)
        .asInstanceOf[org.apache.spark.sql.types.StructType]).getOrElse(
      throw new IllegalArgumentException(
        s"commitEqUpsert: version $observed of $tablePath carries no " +
          "stored schema — recommit the base first"))
    require(upserts.columns.sorted.sameElements(
      stored.fieldNames.sorted),
      s"commitEqUpsert: upsert columns ${upserts.columns.sorted.mkString(",")} " +
        s"must match the stored face ${stored.fieldNames.sorted.mkString(",")}")
    val keysSchema = eqKeysSchema(stored, keyCols)
    // a lineage's tombstone sidecars must all share ONE key set —
    // readMorAsOf anti-joins every live sidecar against the same
    // keyCols, so a sync keyed differently than its predecessors would
    // poison every subsequent read; refuse it before anything publishes
    liveEqDirs(spark, tablePath, observed).lastOption.foreach {
      case (n, dir) =>
        val prev = spark.read.parquet(s"$dir/keys").columns.sorted
        require(prev.sameElements(keyCols.sorted),
          s"commitEqUpsert: $tablePath's live tombstone sidecar v$n " +
            s"is keyed on (${prev.mkString(",")}) — a sync keyed on " +
            s"(${keyCols.sorted.mkString(",")}) cannot join the same " +
            "merge-on-read lineage; foldEqDeletes first")
    }
    val version = claimVersion(spark, tablePath, observed + 1L)
    // the batch's fresh data files (possibly none — a delete-only
    // sync), written under the lineage's layout, with the table's
    // governing CHECK constraints enforced INSIDE the write job — a
    // violating sync fails by constraint name before anything
    // publishes (the ingest path is exactly the one you want
    // constrained; the claimed number burns as a benign gap)
    val dataPath = s"$tablePath/$DataDir/v$version"
    val prepared = constraintGuard(spark, tablePath, Some(observed),
      upserts.select(stored.fieldNames.map(col).toIndexedSeq: _*))
    val fresh = partCol match {
      case Some(pc) =>
        prepared.write.mode("errorifexists").partitionBy(pc)
          .parquet(dataPath)
        footerCounts(spark, listPartitionedFiles(spark, dataPath))
      case None =>
        prepared.write.mode("errorifexists").parquet(dataPath)
        footerCounts(spark,
          listDataFiles(spark, dataPath).map((_, null: String)))
    }
    // the sidecar: keyed tombstones + this commit's own fresh files
    // (the age index readMorAsOf scopes each tombstone set with)
    tombstones.select(keyCols.map(c =>
        col(c).cast(keysSchema(c).dataType)).toIndexedSeq: _*)
      .distinct().coalesce(1)
      .write.mode("errorifexists").parquet(s"${eqDir(tablePath, version)}/keys")
    spark.createDataFrame(
      java.util.Arrays.asList(fresh.map(r => Row(r._1)): _*),
      eqFreshSchema).coalesce(1)
      .write.mode("errorifexists").parquet(s"${eqDir(tablePath, version)}/fresh")
    publishDerived(spark, tablePath, version, fileRows ++ fresh,
      stored.json, ts, observed, "commitEqUpsert")
  }

  /** The MERGE-ON-READ face of `version`: the raw appended rows with
    * every governing equality-delete tombstone resolved at scan time.
    * Each file group reads with its ADD SEQUENCE (base files = before
    * the first tombstone commit; each sidecar's own fresh list = its
    * commit), and ONE broadcast anti-join drops rows whose key a
    * STRICTLY-NEWER tombstone names — so re-upserted keys survive
    * their own batch's delete and all earlier ones. Join depth is one;
    * tombstone volume is O(deletes since the last fold), which
    * [[foldEqDeletes]] bounds. Refuses mid-lineage non-MOR commits
    * loudly (their files' age against the tombstones is unknowable). */
  def readMorAsOf(
      spark: SparkSession,
      tablePath: String,
      version: Long,
      keyCols: Seq[String],
      fragFilter: Option[String] = None): DataFrame = {
    require(keyCols.nonEmpty, "readMorAsOf needs key columns")
    val (allRows, stored) = generationOf(spark, tablePath, version)
    // partition scope ([[readMorPartitionAsOf]]): metadata-level
    // fragment pruning of EVERY leg's file list, before any read plans
    val rows = fragFilter.fold(allRows)(f => allRows.filter(_._2 == f))
    if (rows.isEmpty) // an absent partition answers empty, schema intact
      return spark.createDataFrame(spark.sparkContext.emptyRDD[Row],
        stored.getOrElse(readAsOf(spark, tablePath, version).schema))
    val gens = resolveSidecars(spark, tablePath, version, allowEq = true)
    require(gens.dv.isEmpty && gens.colMap.isEmpty && gens.genCols.isEmpty,
      s"readMorAsOf: $tablePath carries DV/column-mapping/generated-" +
        "column governance — the MOR lineage composes with plain " +
        "append faces only")
    val eqDirs = liveEqDirs(spark, tablePath, version)
    if (eqDirs.isEmpty)
      return readWithDv(spark, rows, stored, None, Map.empty)
    val eqVs = eqDirs.map(_._1).toSet
    val firstEq = eqDirs.map(_._1).min
    val foreign = listGenerations(spark, tablePath)
      .filter(g => g >= firstEq && g <= version && !eqVs.contains(g))
    require(foreign.isEmpty,
      s"readMorAsOf: version(s) ${foreign.mkString(",")} of $tablePath " +
        "landed mid-MOR-lineage from non-MOR verbs — their files' age " +
        "against the tombstones is unknowable; foldEqDeletes first")
    // per-file add sequence from the sidecars' own fresh lists —
    // O(batches since fold) tiny metadata reads, never a history walk;
    // memoized per published sidecar (every governed SQL statement
    // re-resolves this read)
    val freshOf: Seq[(Long, Set[String])] = eqDirs.map { case (n, dir) =>
      n -> memoizedMeta(fs(spark, dir),
        new Path(s"$dir/fresh"), "eqfresh") {
        spark.read.schema(eqFreshSchema).parquet(s"$dir/fresh")
          .collect().map(r => normPath(r.getString(0))).toSet
      }
    }
    val claimed = freshOf.flatMap(_._2).toSet
    val seqCol = "__eq_seq"
    val legs = ((Long.MinValue,
      rows.filterNot(r => claimed.contains(normPath(r._1)))) +:
      freshOf.map { case (n, files) =>
        n -> rows.filter(r => files.contains(normPath(r._1)))
      }).filter(_._2.nonEmpty).map { case (n, group) =>
      readFileRows(spark, group, stored).withColumn(seqCol, lit(n))
    }
    if (legs.isEmpty) {
      val schema = stored.getOrElse(
        throw new IllegalStateException(
          s"readMorAsOf: empty face of $tablePath with no stored schema"))
      return spark.createDataFrame(spark.sparkContext.emptyRDD[Row], schema)
    }
    val data = legs.reduceLeft(_ unionByName _)
    val tombSeq = "__eq_tomb_seq"
    val tombs = eqDirs.map { case (n, dir) =>
      val sideCols = eqSidecarKeyCols(spark, dir)
      // BY NAME, never positionally: the sidecar's parquet columns are
      // the keyCols of ITS commit — a caller passing a different order
      // (or a different key set than the syncs used) must resolve to
      // the right columns or refuse loudly, not silently cross-wire
      // the anti-join
      require(sideCols.sorted.sameElements(keyCols.sorted),
        s"readMorAsOf: tombstone sidecar v$n of $tablePath is keyed " +
          s"on (${sideCols.sorted.mkString(",")}) but the read " +
          s"asked for (${keyCols.sorted.mkString(",")}) — the key " +
          "sets must match")
      spark.read.parquet(s"$dir/keys").select(keyCols.map(k =>
          col(k).as(s"__eq_t_$k")).toIndexedSeq: _*)
        .withColumn(tombSeq, lit(n))
    }.reduceLeft(_ unionByName _)
    val cond = keyCols.map(k =>
      data(k) <=> col(s"__eq_t_$k")).reduce(_ && _) &&
      col(tombSeq) > col(seqCol)
    data.join(broadcast(tombs), cond, "left_anti").drop(seqCol)
  }

  /** [[readMorAsOf]] scoped to ONE hive partition — the composition
    * that keeps partition pruning alive on a partitioned MOR lineage:
    * every leg's FILE LIST is fragment-filtered in metadata before a
    * single file opens (base files and each sync's fresh files alike),
    * and only then does the tombstone anti-join run. Tombstones stay
    * GLOBAL — a key's delete applies wherever the key lives — but
    * rows of other partitions are never read to prove it. */
  def readMorPartitionAsOf(
      spark: SparkSession,
      tablePath: String,
      version: Long,
      keyCols: Seq[String],
      partCol: String,
      value: Any): DataFrame = {
    val frag = partFragment(partCol, String.valueOf(value))
    readMorAsOf(spark, tablePath, version, keyCols,
      fragFilter = Some(frag))
  }

  /** COMPACTION for the MOR lineage: materialize [[readMorAsOf]]'s
    * head face as ONE copy-on-write replace commit, then drop every
    * tombstone sidecar — bounding the read-side tombstone volume and
    * returning the table to the plain-verb surface. The fold marker
    * records the expired window: time travel INSIDE it refuses loudly
    * (those faces' tombstones are gone; a raw answer would resurrect
    * deletes), while pre-MOR history below and the folded face above
    * keep serving. */
  private def eqFoldIntent(tablePath: String): Path =
    new Path(s"${eqRoot(tablePath)}/folding")

  def foldEqDeletes(
      spark: SparkSession,
      tablePath: String,
      keyCols: Seq[String]): Long = {
    val head = latestVersion(spark, tablePath).getOrElse(
      throw new IllegalArgumentException(
        s"foldEqDeletes: $tablePath has no committed versions"))
    val f = fs(spark, tablePath)
    val eqAll =
      if (!f.exists(new Path(eqRoot(tablePath)))) Seq.empty
      else sidecarFamilyListed(f, eqRoot(tablePath))
    require(eqAll.nonEmpty,
      s"foldEqDeletes: $tablePath carries no equality-delete sidecars")
    // TWO-PHASE against the crash between the replace commit and the
    // marker/cleanup: the intent records which head the fold derived
    // from, so a re-run whose head is the crashed fold's OWN replace
    // commit (parent == intent, not an eq generation) just FINISHES —
    // re-deriving from it would refuse on its own mid-lineage commit
    val intentFrom: Option[Long] = {
      val p = eqFoldIntent(tablePath)
      if (!f.exists(p)) None
      else {
        val in = f.open(p)
        try {
          val buf = new Array[Byte](64)
          val n = in.read(buf)
          new String(buf, 0, math.max(n, 0), "UTF-8").trim.toLongOption
        } finally in.close()
      }
    }
    val eqVs = eqAll.map(_._1).toSet
    val crashedFoldLanded = intentFrom.exists { from =>
      head > from && !eqVs.contains(head) &&
        parentOf(manifestFor(spark, tablePath, head)).contains(from)
    }
    val v =
      if (crashedFoldLanded) head
      else {
        val out0 = f.create(eqFoldIntent(tablePath), true)
        try out0.write(head.toString.getBytes("UTF-8"))
        finally out0.close()
        val face = readMorAsOf(spark, tablePath, head, keyCols)
        // a partitioned MOR lineage folds through the partitioned
        // commit — the materialized face keeps its layout (and its
        // partition pruning) instead of silently flattening
        val headFrags = manifestFor(spark, tablePath, head)
          .map(r => if (r.isNullAt(2)) null else r.getString(2)).toSeq
        headFrags.headOption.filter(_ != null)
          .map(_.takeWhile(_ != '=')) match {
          case Some(pc) if headFrags.forall(p =>
            p != null && p.startsWith(s"$pc=")) =>
            commitPartitioned(spark, face, tablePath, pc,
              append = false, derivedFrom = Some(head),
              verb = "foldEqDeletes")
          case _ =>
            commit(spark, face, tablePath, append = false,
              derivedFrom = Some(head), verb = "foldEqDeletes")
        }
      }
    // marker BEFORE dir deletion: a crash in between leaves
    // over-refusal (safe), never a raw answer for a governed version.
    // APPEND a per-fold window — rewriting one global (min, latest)
    // pair would retroactively refuse the previous fold's materialized
    // face and any plain commits that landed between folds.
    val windows = readEqFoldWindows(f, tablePath) :+
      (eqAll.map(_._1).min, v)
    val out = f.create(eqFoldMarker(tablePath), true)
    try out.write(windows.map { case (a, b) => s"$a $b" }
      .mkString("\n").getBytes("UTF-8"))
    finally out.close()
    eqAll.foreach { case (_, dir) => f.delete(new Path(dir), true) }
    f.delete(eqFoldIntent(tablePath), false)
    v
  }

  // ------------------------------------------------------------------
  // Combined per-verb resolution — one listing pass, one manifest read
  // ------------------------------------------------------------------

  /** Instrumentation: sidecar-family directory listings and eager
    * manifest reads issued since process start — `private[graft]` so
    * the listing-budget spec pins "one read verb = one combined
    * resolution pass" as a counted fact instead of a wall-clock guess.
    * Monotone; tests snapshot-and-diff around a verb. */
  private[graft] val sidecarListings =
    new java.util.concurrent.atomic.AtomicLong
  private[graft] val manifestReads =
    new java.util.concurrent.atomic.AtomicLong

  /** Manifest ROWS materialized to the driver since process start —
    * the scale gauge the version-bounded reads exist for: a read verb
    * must collect O(files of the queried generation), never
    * O(versions × files of the history) (the counter
    * [[SnapshotsResolutionSpec]] pins that bound with). */
  private[graft] val manifestRowsCollected =
    new java.util.concurrent.atomic.AtomicLong

  /** Manifest FILES OPENED (gen files + checkpoint files whose rows
    * were actually read) since process start — the checkpoint's budget
    * gauge: a timeline read must open 1 + O(commits since the last
    * checkpoint) files, never O(versions) footers, however long the
    * history ([[SnapshotsResolutionSpec]] pins that bound). */
  private[graft] val manifestFilesOpened =
    new java.util.concurrent.atomic.AtomicLong

  /** Manifest DIRECTORY listings since process start (head resolution
    * + manifest reads) — with rows, files-opened and sidecar listings
    * this completes the metadata-plane budget family the soak spec
    * fences. */
  private[graft] val manifestDirListings =
    new java.util.concurrent.atomic.AtomicLong

  /** Every versioned sidecar family's generation governing `version`,
    * resolved in ONE pass: a single listing of the table root discovers
    * which families exist at all — on a table with no sidecars (the
    * common case) that is the resolution's ONLY I/O — then exactly one
    * listing per PRESENT family finds its latest-at-or-below dir. Read
    * verbs used to pay an exists+list pair PER FAMILY PER CALL, a
    * constant that grew with every sidecar family the engine accrued
    * (the r16 q25/q28 read-path creep); this caps it at 1 + families
    * actually present, however many verbs stack. */
  private[graft] final case class SidecarGens(
      dv: Option[(Long, String)],
      colMap: Option[(Long, String)],
      constraints: Option[(Long, String)],
      genCols: Option[(Long, String)],
      eq: Option[(Long, String)] = None)

  private[graft] def resolveSidecars(
      spark: SparkSession,
      tablePath: String,
      version: Long,
      allowEq: Boolean = false): SidecarGens = {
    val f = fs(spark, tablePath)
    sidecarListings.incrementAndGet()
    val present = f.listStatus(new Path(tablePath))
      .filter(_.isDirectory).map(_.getPath.getName).toSet
    def fam(root: String): Option[(Long, String)] = {
      val name = root.substring(root.lastIndexOf('/') + 1)
      if (!present.contains(name)) None
      else pickAtOrBelow(sidecarFamilyListed(f, root), version)
    }
    val eqPick =
      if (!present.contains("_eq")) None
      else {
        // a folded MOR lineage expired its tombstone history: versions
        // inside the fold window have NO servable face at all — refuse
        // toward the fold point instead of silently answering raw rows
        readEqFoldWindows(f, tablePath)
          .find { case (minEq, foldV) =>
            version >= minEq && version < foldV }
          .foreach { case (minEq, foldV) =>
            throw new IllegalArgumentException(
              s"version $version of $tablePath was merge-on-read " +
                s"governed and its equality-delete history folded away " +
                s"at v$foldV — no face exists inside [$minEq, $foldV); " +
                s"read v$foldV or later, or a version outside the window")
          }
        // LIVE dirs only: a crashed upsert's unpublished sidecar is
        // debris, not governance (removeOrphans sweeps it)
        liveEqDirs(spark, tablePath, version).lastOption
      }
    require(allowEq || eqPick.isEmpty,
      s"version $version of $tablePath is governed by equality-delete " +
        "tombstones (merge-on-read) — a plain scan would resurrect " +
        "deleted keys; read via readMorAsOf, or foldEqDeletes to " +
        "materialize a copy-on-write face")
    SidecarGens(
      fam(dvRoot(tablePath)),
      fam(colMapRoot(tablePath)),
      fam(constraintsRoot(tablePath)),
      fam(genColsRoot(tablePath)),
      eqPick)
  }

  /** The governing DV frame from an already-resolved [[SidecarGens]] —
    * zero further listings. */
  private def dvSetOf(
      spark: SparkSession,
      gens: SidecarGens): Option[DataFrame] =
    gens.dv.map { case (_, dir) =>
      spark.read.schema(dvSchema).parquet(dir)
    }

  /** The governing column mapping from an already-resolved
    * [[SidecarGens]] — zero further listings. */
  private def colMapOf(
      spark: SparkSession,
      gens: SidecarGens): Seq[(String, Option[String])] =
    gens.colMap.map { case (_, dir) => colMapRead(spark, dir) }
      .getOrElse(Seq.empty)

  /** One colmap sidecar dir's rows — memoized per published dir
    * ([[memoizedMeta]]): the mapping is consulted by every SQL
    * statement's loadTable (the colMapped guard) and by every read/DML
    * verb, and the dir is immutable once published. */
  private def colMapRead(
      spark: SparkSession,
      dir: String): Seq[(String, Option[String])] =
    memoizedMeta(fs(spark, dir), new Path(dir), "colmap") {
      spark.read.schema(colMapSchema).parquet(dir)
        .collect().map(r => (r.getString(0),
          if (r.isNullAt(1)) None else Some(r.getString(1))))
        .sortBy(_._1).toSeq
    }

  /** (file, part) rows + stored schema of ONE generation from a single
    * eager manifest read — the verbs that once called [[manifest]]
    * twice per answer (rows, then [[storedSchema]]) derive both from
    * the same point-in-time snapshot. */
  /** [[generationOf]] for the package's other faces (the SQL catalog
    * plans scans from exactly these file rows). */
  private[graft] def generationFiles(
      spark: SparkSession,
      tablePath: String,
      version: Long)
      : (Seq[(String, String)],
        Option[org.apache.spark.sql.types.StructType]) =
    generationOf(spark, tablePath, version)

  /** (file, partition fragment, footer row count) of ONE generation —
    * the SQL catalog's `files` metadata-table face, read from that
    * generation's own manifest file alone (O(files of v), never the
    * history). Null count = a legacy generation predating row-count
    * manifests. */
  private[graft] def generationFileMeta(
      spark: SparkSession,
      tablePath: String,
      version: Long): Seq[(String, String, Option[Long])] = {
    val rows = manifestFor(spark, tablePath, version)
    require(rows.nonEmpty,
      s"snapshot version $version of $tablePath is not in the manifest " +
        "(never committed, or expired by vacuum)")
    rows.map(r => (r.getString(1),
      if (r.isNullAt(2)) null else r.getString(2),
      if (r.isNullAt(4)) None else Some(r.getLong(4)))).toSeq
  }

  private def generationOf(
      spark: SparkSession,
      tablePath: String,
      version: Long)
      : (Seq[(String, String)],
        Option[org.apache.spark.sql.types.StructType]) = {
    val rows = manifestFor(spark, tablePath, version)
    require(rows.nonEmpty,
      s"snapshot version $version of $tablePath is not in the manifest " +
        "(never committed, or expired by vacuum)")
    val stored = schemaJsonOf(rows).map(j =>
      org.apache.spark.sql.types.DataType.fromJson(j)
        .asInstanceOf[org.apache.spark.sql.types.StructType])
    (rows.map(r => (r.getString(1),
      if (r.isNullAt(2)) null else r.getString(2))).toSeq, stored)
  }

  /** See [[sidecarResolve]] — the deletion-vector instance. */
  private def resolveDvDir(
      spark: SparkSession,
      tablePath: String,
      version: Long): Option[(Long, String)] =
    sidecarResolve(spark, dvRoot(tablePath), version)

  /** The governing DV set of `version` as a (file, row_index) frame —
    * None when no delete governs it. Metadata-scale: bounded by rows
    * DELETED, never by table size. */
  private def dvSet(
      spark: SparkSession,
      tablePath: String,
      version: Long): Option[DataFrame] =
    resolveDvDir(spark, tablePath, version).map { case (_, dir) =>
      spark.read.schema(dvSchema).parquet(dir)
    }

  /** The normalized file set one DV sidecar dir records — the SQL
    * catalog's dv-governed probe ([[graft.sources.v2.GraftCatalog]]
    * resolves EVERY statement's table references through it), memoized
    * per published dir ([[memoizedMeta]]): a driver Spark job
    * otherwise repeated per statement. */
  private[graft] def dvRecordedFiles(
      spark: SparkSession,
      dir: String): Set[String] =
    memoizedMeta(fs(spark, dir), new Path(dir), "dvfiles") {
      spark.read.schema(dvSchema).parquet(dir)
        .select(col("file")).distinct()
        .collect().map(r => normPath(r.getString(0))).toSet
    }

  private def writeDvSet(
      spark: SparkSession,
      tablePath: String,
      version: Long,
      rows: DataFrame): Unit =
    rows.select(col("file"), col("row_index"))
      .coalesce(1)
      .write.mode("errorifexists").parquet(dvDir(tablePath, version))

  /** Does ANY deletion-vector entry reference a file some manifest
    * generation still lists? Metadata-scale (every DV dir is bounded
    * by deletes); the guard for verbs whose answers would silently go
    * wrong under live row-level deletes. Dead entries (files already
    * replaced or compacted away) don't count. */
  /** True when ANY deletion-vector sidecar entry (any generation, live
    * or expired-but-undeleted) touches one of `files` — the
    * conservative gate the streaming table feed uses: a stream scan
    * cannot anti-join vectors mid-flight, and over-refusing a dead
    * entry is safe where under-refusing a live one replays deleted
    * rows. */
  private[graft] def dvEntriesTouch(
      spark: SparkSession,
      tablePath: String,
      files: Seq[String]): Boolean =
    liveDvEntriesExist(spark, tablePath, files)

  private def liveDvEntriesExist(
      spark: SparkSession,
      tablePath: String,
      manifestFiles: Seq[String]): Boolean = {
    val f = fs(spark, tablePath)
    val root = new Path(dvRoot(tablePath))
    if (!f.exists(root)) false
    else {
      val dirs = f.listStatus(root).filter(_.isDirectory)
        .map(_.getPath.toString)
      dirs.nonEmpty && {
        val filesDf = spark.createDataFrame(
          manifestFiles.distinct.map(Tuple1(_))).toDF("file")
        spark.read.schema(dvSchema).parquet(dirs.toIndexedSeq: _*)
          .join(filesDf, Seq("file"), "left_semi")
          .limit(1).collect().nonEmpty
      }
    }
  }

  /** Anti-join `df` (carrying the [[DvFileCol]]/[[DvPosCol]] row
    * identity) against a DV set. The DV side is a file-based relation
    * with known size, so the planner broadcasts it statically whenever
    * it fits — at 100 TB the refinement is per-file bitmaps pushed
    * into the scan (the Delta/Iceberg v2 physical shape); the
    * relational anti-join computes the identical answer. Keeps the
    * identity columns (callers drop them). */
  private def applyDv(df: DataFrame, dv: DataFrame): DataFrame =
    df.join(dv,
      df(DvFileCol) === dv("file") && df(DvPosCol) === dv("row_index"),
      "left_anti")

  /** The DISTINCT files a governing DV set touches, scheme-normalized —
    * metadata-scale (bounded by files CONTAINING deletes, never by the
    * table), resolved once at plan time. */
  private def dvFileSet(dv: DataFrame): Set[String] =
    dv.select(col("file")).distinct().collect()
      .map(r => normPath(r.getString(0))).toSet

  /** Plan a (possibly DV-governed) read over manifest file rows with
    * FILE-LEVEL DV PUSHDOWN: the admitted files split at METADATA time
    * into DV-clean and DV-dirty via the governing set's distinct
    * `file` column, and only the dirty files' scan carries the
    * `_metadata` row identity and pays the anti-join — the clean
    * files' subplan is a plain scan with NO JOIN AT ALL (spec-pinned).
    * On a 100-TB table where deletes touch a handful of files, the
    * bulk of the scan keeps its undisturbed whole-stage-codegen shape
    * and the join cost scales with the DELETES' blast radius, not the
    * table; a generation whose governing entries are all dead (files
    * replaced or compacted away) plans zero joins. One metadata-scale
    * collect per DV-governed read resolves the split. */
  private def readWithDv(
      spark: SparkSession,
      rows: Seq[(String, String)],
      stored: Option[org.apache.spark.sql.types.StructType],
      dv: Option[DataFrame],
      l2p: Map[String, String]): DataFrame = {
    val phys = stored.map(physicalSchema(_, l2p))
    dv match {
      case None =>
        fromPhysical(readFileRows(spark, rows, phys), l2p)
      case Some(d) =>
        val dirtySet = dvFileSet(d)
        val (dirty, clean) = rows.partition(r =>
          dirtySet.contains(normPath(r._1)))
        val legs =
          (if (clean.nonEmpty)
            Seq(fromPhysical(readFileRows(spark, clean, phys), l2p))
          else Seq.empty) ++
            (if (dirty.nonEmpty)
              Seq(applyDv(
                fromPhysical(
                  readFileRows(spark, dirty, phys, withMeta = true), l2p),
                d).drop(DvFileCol, DvPosCol))
            else Seq.empty)
        legs.reduceLeft((a, b) =>
          a.unionByName(b, allowMissingColumns = true))
    }
  }

  /** Row-level DELETE as a metadata commit — deletion vectors, the
    * merge-on-read half of the lakehouse delete design space: the new
    * version's manifest carries the parent's data files VERBATIM (zero
    * rows rewritten — spec-pinned), plus a `_dv/v<version>` sidecar of
    * the (file, row_index) identities the predicate doomed, applied as
    * an anti-join by every read of this version onward. Copy-on-write
    * ([[mergePartitioned]], [[purgeKeys]]) pays O(touched files) per
    * delete; this pays O(deleted rows) — the right half when deletes
    * are small and frequent (CDC corrections, right-to-erasure queues
    * staged for a later [[optimize]], which physically drops the rows
    * because it rewrites through [[readAsOf]] and commits fresh
    * DV-free files).
    *
    * The sidecar stores the FULL governing set (parent's surviving
    * entries plus the fresh ones — disjoint by construction, the fresh
    * side is filtered from the already-DV-applied live view), so a
    * reader resolves ONE directory, and versions committed in between
    * by DV-unaware verbs inherit correctly (see [[resolveDvDir]]).
    * Older versions read back undeleted — MVCC — and [[rollback]]
    * restores the target's set. Returns the minted version. */
  def deleteWhere(
      spark: SparkSession,
      tablePath: String,
      predicate: org.apache.spark.sql.Column,
      ts: Option[Long] = None): Long = {
    val observed = latestVersion(spark, tablePath).getOrElse(
      throw new IllegalArgumentException(
        s"deleteWhere: $tablePath has no committed versions"))
    requireNotEqGoverned(spark, tablePath, observed, "deleteWhere")
    val gen = manifestFor(spark, tablePath, observed)
    require(gen.nonEmpty,
      s"deleteWhere: version $observed of $tablePath vanished between " +
        "the head resolution and its read — a racing retraction; retry")
    val fileRows = fileRowsOf(gen)
    val schemaJson = schemaJsonOf(gen).orNull
    val stored = schemaJsonOf(gen).map(j =>
      org.apache.spark.sql.types.DataType.fromJson(j)
        .asInstanceOf[org.apache.spark.sql.types.StructType])
    val prior = dvSet(spark, tablePath, observed)
    val l2p = logicalToPhysical(colMapAsOf(spark, tablePath, observed))
    val base = fromPhysical(readFileRows(spark,
      fileRows.map(r => (r._1, r._2)),
      stored.map(physicalSchema(_, l2p)),
      withMeta = true), l2p)
    val live = prior.fold(base)(applyDv(base, _))
    val fresh = live.filter(predicate)
      .select(col(DvFileCol).as("file"), col(DvPosCol).as("row_index"))
    val version = claimVersion(spark, tablePath, observed + 1L)
    val full = prior.fold(fresh)(p =>
      p.select(col("file"), col("row_index")).unionByName(fresh))
    writeDvSet(spark, tablePath, version, full)
    publishDerived(spark, tablePath, version, fileRows, schemaJson, ts,
      observed, "deleteWhere")
  }

  /** Row-level UPDATE as FILE-EXACT copy-on-write — the other half of
    * the lakehouse DML design space from [[deleteWhere]]'s
    * merge-on-read: one predicate-pushed pass over the live face finds
    * the DISTINCT files that contain a matching row, and ONLY those
    * files are rewritten (matching rows with `assignments` applied —
    * each value cast to its column's stored type, the SQL UPDATE
    * contract — carried rows byte-equal); every untouched file's
    * manifest row repoints verbatim. At 100 TB the rewrite cost scales
    * with the predicate's file blast radius, never the table — a
    * selective update on a clustered key rewrites a handful of files,
    * and the discovery pass itself prunes to the predicate's columns
    * (parquet pushdown + row-group skipping).
    *
    * Composition: the governing DELETION VECTORS apply to both passes
    * (a rewrite that read raw files would resurrect DV-deleted rows
    * into fresh files), and the rewritten files' DV entries are
    * physically dropped — the new version's sidecar carries only the
    * untouched files' surviving entries. CHECK constraints and
    * generated-column definitions govern the updated rows exactly as
    * they govern ingest ([[prepareBatch]]); a column-mapping face
    * translates both ways. Updated columns keep their stored type
    * (assignments cast; a type-changing update is a replace commit's
    * job). Hive-partitioned generations rewrite `partitionBy`, so
    * fragments re-derive from the data — an update that moves a row's
    * partition value moves the row's fragment with it (mixed-layout
    * generations refuse toward [[optimizePartitioned]]). A
    * stats/bloom-governed table
    * KEEPS ITS PRUNING INDEXES LIVE: [[maintainIndexSidecars]] mints
    * the new version's sidecar from the parent's surviving rows plus
    * one fresh-files-only data pass, so range/box/point scans keep
    * pruning across selective updates instead of refusing. A predicate
    * matching nothing is a no-op: no generation minted, the head
    * version returns unchanged. Returns the head after the verb. */
  def updateWhere(
      spark: SparkSession,
      tablePath: String,
      predicate: org.apache.spark.sql.Column,
      assignments: Seq[(String, org.apache.spark.sql.Column)],
      ts: Option[Long] = None): Long = {
    require(assignments.nonEmpty, "updateWhere needs SET assignments")
    require(assignments.map(_._1).distinct.length == assignments.length,
      "updateWhere: duplicate assignment for column " +
        assignments.groupBy(_._1).collect { case (c, as) if as.length > 1 => c }
          .mkString(", "))
    val observed = latestVersion(spark, tablePath).getOrElse(
      throw new IllegalArgumentException(
        s"updateWhere: $tablePath has no committed versions"))
    requireNotEqGoverned(spark, tablePath, observed, "updateWhere")
    val gen = manifestFor(spark, tablePath, observed)
    require(gen.nonEmpty,
      s"updateWhere: version $observed of $tablePath vanished between " +
        "the head resolution and its read — a racing retraction; retry")
    val fileRows = fileRowsOf(gen)
    val partCol = dmlPartitionCol(fileRows, observed, tablePath,
      "updateWhere")
    val schemaJson = schemaJsonOf(gen).orNull
    val stored = schemaJsonOf(gen).map(j =>
      org.apache.spark.sql.types.DataType.fromJson(j)
        .asInstanceOf[org.apache.spark.sql.types.StructType])
    val l2p = logicalToPhysical(colMapAsOf(spark, tablePath, observed))
    val prior = dvSet(spark, tablePath, observed)
    def liveWithMeta(rows: Seq[(String, String, Option[Long])]): DataFrame = {
      val base = fromPhysical(readFileRows(spark,
        rows.map(r => (r._1, r._2)),
        stored.map(physicalSchema(_, l2p)), withMeta = true), l2p)
      prior.fold(base)(applyDv(base, _))
    }
    // pass 1 — the predicate's file blast radius: stats-sidecar
    // pruning drops provably-clean files before any data file opens
    // ([[statsPrunedForDml]]), then the scan reads only the
    // predicate's columns (+ row identity) with row-group stats skip
    if (fileRows.isEmpty) return observed // an empty face updates to itself
    val discovery = bloomPrunedForDml(spark, tablePath, observed,
      statsPrunedForDml(spark, tablePath, observed, fileRows, predicate),
      predicate)
    if (discovery.isEmpty) return observed // skipping disproves a match
    val dirtySet = liveWithMeta(discovery)
      .filter(predicate)
      .select(col(DvFileCol)).distinct()
      .collect().map(r => normPath(r.getString(0))).toSet
    if (dirtySet.isEmpty) return observed
    val (dirtyRows, cleanRows) =
      fileRows.partition(r => dirtySet.contains(normPath(r._1)))
    // pass 2 — rewrite exactly the dirty files
    val dirtyLive = liveWithMeta(dirtyRows).drop(DvFileCol, DvPosCol)
    val colType: Map[String, org.apache.spark.sql.types.DataType] =
      stored.getOrElse(dirtyLive.schema)
        .fields.map(f => f.name -> f.dataType).toMap
    assignments.foreach { case (c, _) =>
      require(colType.contains(c),
        s"updateWhere: no column '$c' in $tablePath (columns: " +
          s"${colType.keys.toSeq.sorted.mkString(", ")})")
    }
    // ANSI UPDATE: every SET expression and the WHERE predicate see the
    // PRE-update row. The predicate lands once in a flag column, then a
    // single select builds all outputs against the original frame — so
    // `SET a = b, b = a` swaps and a later RHS never observes an
    // earlier assignment's result.
    val predFlag = "__graft_update_pred"
    val assigned = assignments.toMap
    val outCols = dirtyLive.columns.map { c =>
      assigned.get(c) match {
        case Some(v) =>
          when(col(predFlag), v.cast(colType(c))).otherwise(col(c)).as(c)
        case None => col(c)
      }
    }
    val updated = dirtyLive.withColumn(predFlag, predicate)
      .select(outCols.toIndexedSeq: _*)
    val version = claimVersion(spark, tablePath, observed + 1L)
    val prepared = prepareBatch(spark, tablePath, Some(observed), updated)
    val fresh = writeDmlFiles(spark, tablePath, observed, version,
      prepared, partCol)
    // the new version's DV sidecar: untouched files' entries survive,
    // rewritten files' entries died physically with the rewrite — an
    // empty survivor set still writes (it supersedes the parent's)
    prior.foreach { p =>
      val survivingFiles = p.select(col("file")).distinct().collect()
        .map(_.getString(0))
        .filter(f => !dirtySet.contains(normPath(f)))
      writeDvSet(spark, tablePath, version,
        if (survivingFiles.isEmpty) p.limit(0)
        else p.filter(col("file").isin(survivingFiles.toIndexedSeq: _*)))
    }
    maintainIndexSidecars(spark, tablePath, observed, version,
      cleanRows.map(_._1), fresh.map(_._1))
    publishDerived(spark, tablePath, version, cleanRows ++ fresh,
      schemaJson, ts, observed, "updateWhere")
  }

  /** REPLACE WHERE — Delta's `replaceWhere` / the predicate-scoped
    * INSERT OVERWRITE, and [[replacePartitions]]' general-predicate
    * sibling: ONE derived commit whose face is (old face WHERE NOT
    * predicate) ∪ `df`. FILE-EXACT like every DML verb here: the
    * stats/bloom-pruned discovery pass finds the files containing a
    * matching row, only those rewrite (minus their matching rows),
    * every clean file repoints verbatim, and the replacement batch
    * lands as fresh files — so an idempotent daily reload scoped by
    * its predicate converges however many times it lands. Every
    * replacement row must itself satisfy the predicate (Delta's
    * constraint — refused loudly BEFORE anything publishes, else a
    * re-run would double rows outside the scope). Deletion vectors,
    * constraints, generated columns and hive partitioning compose as
    * in [[updateWhere]]; the SQL face is
    * `INSERT INTO <t> REPLACE WHERE <pred> SELECT …` (q82). */
  def commitReplaceWhere(
      spark: SparkSession,
      tablePath: String,
      df: DataFrame,
      predicate: org.apache.spark.sql.Column,
      ts: Option[Long] = None): Long = {
    val observed = latestVersion(spark, tablePath).getOrElse(
      throw new IllegalArgumentException(
        s"commitReplaceWhere: $tablePath has no committed versions"))
    requireNotEqGoverned(spark, tablePath, observed, "commitReplaceWhere")
    val gen = manifestFor(spark, tablePath, observed)
    require(gen.nonEmpty,
      s"commitReplaceWhere: version $observed of $tablePath vanished " +
        "between the head resolution and its read — retry")
    val fileRows = fileRowsOf(gen)
    val partCol = dmlPartitionCol(fileRows, observed, tablePath,
      "commitReplaceWhere")
    val schemaJson = schemaJsonOf(gen).orNull
    val stored = schemaJsonOf(gen).map(j =>
      org.apache.spark.sql.types.DataType.fromJson(j)
        .asInstanceOf[org.apache.spark.sql.types.StructType])
    stored.foreach { st =>
      require(df.columns.sorted.sameElements(st.fieldNames.sorted),
        s"commitReplaceWhere: batch columns ${df.columns.sorted.mkString(",")} " +
          s"must match the stored face ${st.fieldNames.sorted.mkString(",")}")
    }
    // Delta's replaceWhere contract: a replacement row OUTSIDE the
    // predicate's scope would survive the next re-run's replace and
    // double — refuse the whole statement before anything publishes
    val offending = df.filter(!coalesce(predicate, lit(false)))
      .limit(1).collect()
    require(offending.isEmpty,
      s"commitReplaceWhere: the batch carries rows NOT satisfying the " +
        "REPLACE WHERE predicate — the reload would not be idempotent; " +
        "widen the predicate or filter the batch")
    val l2p = logicalToPhysical(colMapAsOf(spark, tablePath, observed))
    val prior = dvSet(spark, tablePath, observed)
    def liveWithMeta(rows: Seq[(String, String, Option[Long])]): DataFrame = {
      val base = fromPhysical(readFileRows(spark,
        rows.map(r => (r._1, r._2)),
        stored.map(physicalSchema(_, l2p)), withMeta = true), l2p)
      prior.fold(base)(applyDv(base, _))
    }
    // discovery: the predicate's file blast radius, sidecar-pruned
    // before any data file opens
    val dirtySet: Set[String] =
      if (fileRows.isEmpty) Set.empty
      else {
        val discovery = bloomPrunedForDml(spark, tablePath, observed,
          statsPrunedForDml(spark, tablePath, observed, fileRows,
            predicate), predicate)
        if (discovery.isEmpty) Set.empty
        else liveWithMeta(discovery).filter(predicate)
          .select(col(DvFileCol)).distinct()
          .collect().map(r => normPath(r.getString(0))).toSet
      }
    val (dirtyRows, cleanRows) =
      fileRows.partition(r => dirtySet.contains(normPath(r._1)))
    val colOrder = stored.map(_.fieldNames.toSeq).getOrElse(
      df.columns.toSeq)
    val survivors =
      if (dirtyRows.isEmpty) None
      else Some(liveWithMeta(dirtyRows).drop(DvFileCol, DvPosCol)
        .filter(!coalesce(predicate, lit(false)))
        .select(colOrder.map(col): _*))
    val replaced = survivors
      .map(_.unionByName(df.select(colOrder.map(col): _*)))
      .getOrElse(df.select(colOrder.map(col): _*))
    val version = claimVersion(spark, tablePath, observed + 1L)
    val prepared = prepareBatch(spark, tablePath, Some(observed), replaced)
    val fresh = writeDmlFiles(spark, tablePath, observed, version,
      prepared, partCol)
    prior.foreach { p =>
      val survivingFiles = p.select(col("file")).distinct().collect()
        .map(_.getString(0))
        .filter(f => !dirtySet.contains(normPath(f)))
      writeDvSet(spark, tablePath, version,
        if (survivingFiles.isEmpty) p.limit(0)
        else p.filter(col("file").isin(survivingFiles.toIndexedSeq: _*)))
    }
    maintainIndexSidecars(spark, tablePath, observed, version,
      cleanRows.map(_._1), fresh.map(_._1))
    publishDerived(spark, tablePath, version, cleanRows ++ fresh,
      schemaJson, ts, observed, "commitReplaceWhere")
  }

  /** The partition column a file-swapping DML commit must preserve:
    * None for a flat generation, the single fragment key for a
    * uniformly hive-partitioned one (the rewrite then writes
    * `partitionBy` so fragments — including rows an UPDATE moved
    * across partitions — re-derive from the data). A MIXED layout
    * (partition evolution mid-flight) refuses: fragment-scoped
    * answers over it are undefined until [[optimizePartitioned]]. */
  private def dmlPartitionCol(
      fileRows: Seq[(String, String, Option[Long])],
      version: Long,
      tablePath: String,
      verb: String): Option[String] = {
    if (fileRows.isEmpty || fileRows.forall(_._2 == null)) None
    else {
      require(fileRows.forall(_._2 != null),
        s"$verb: version $version of $tablePath mixes flat and " +
          "partitioned files (partition evolution) — compact with " +
          "optimizePartitioned first")
      val keys = fileRows.map(_._2.split("=", 2)(0)).distinct
      require(keys.length == 1,
        s"$verb: version $version of $tablePath carries fragments on " +
          s"multiple keys (${keys.mkString(", ")}) — compact with " +
          "optimizePartitioned first")
      Some(keys.head)
    }
  }

  /** Write a DML verb's fresh files — flat or `partitionBy` to match
    * the generation's layout — and return their manifest rows. */
  private def writeDmlFiles(
      spark: SparkSession,
      tablePath: String,
      parent: Long,
      version: Long,
      prepared: DataFrame,
      partCol: Option[String]): Seq[(String, String, Option[Long])] = {
    val dataPath = s"$tablePath/$DataDir/v$version"
    val w = toPhysical(spark, tablePath, Some(parent), prepared)
      .write.mode("errorifexists")
    partCol match {
      case Some(pc) =>
        require(prepared.columns.contains(pc),
          s"DML rewrite of $tablePath lost partition column '$pc'")
        w.partitionBy(pc).parquet(dataPath)
        footerCounts(spark, listPartitionedFiles(spark, dataPath))
      case None =>
        w.parquet(dataPath)
        footerCounts(spark,
          listDataFiles(spark, dataPath).map((_, null: String)))
    }
  }

  /** STATS-PRUNE a DML verb's DISCOVERY pass: when a stats sidecar
    * describes the parent generation, files whose per-file [min, max]
    * intervals PROVABLY cannot contain a predicate-matching row drop
    * from the discovery scan before any data file opens — so a
    * selective `UPDATE ... WHERE key BETWEEN ...` on a clustered or
    * Z-ordered 100-TB table reads only the admitted files even to FIND
    * its blast radius. Strictly conservative: the predicate is split
    * into top-level AND conjuncts, each simple comparison / IN on a
    * stats-keyed column maps to an interval test, and every shape the
    * translator does not recognize (OR trees, functions, other
    * columns) is simply ignored — ignoring a conjunct only WIDENS
    * admission, and the exact predicate still runs row-level inside
    * the discovery scan. Returns the input rows untouched when no
    * sidecar describes the generation, a column mapping governs, or
    * nothing translates. */
  private[graft] def statsPrunedForDml(
      spark: SparkSession,
      tablePath: String,
      version: Long,
      fileRows: Seq[(String, String, Option[Long])],
      predicate: org.apache.spark.sql.Column)
      : Seq[(String, String, Option[Long])] = {
    if (fileRows.isEmpty) return fileRows
    if (colMapAsOf(spark, tablePath, version)
      .exists { case (p, l) => !l.contains(p) }) return fileRows
    val sd = describingSidecarDir(spark, tablePath, "_stats", version)
      .getOrElse(return fileRows)
    val side = spark.read.parquet(sd)
    val statKeys = side.columns.filter(_.startsWith("min_"))
      .map(_.stripPrefix("min_")).toSet
    import org.apache.spark.sql.catalyst.analysis.{UnresolvedAttribute, UnresolvedFunction}
    import org.apache.spark.sql.catalyst.expressions.{And => CAnd, Attribute, EqualTo => CEq, Expression, GreaterThan => CGt, GreaterThanOrEqual => CGe, In => CIn, LessThan => CLt, LessThanOrEqual => CLe, Literal => CLit}
    // the Column DSL converts to UNRESOLVED function nodes ('and, '=,
    // '>=…) while the SQL DML rule hands over RESOLVED typed trees —
    // match both faces of each shape
    object Fn {
      def unapply(e: Expression): Option[(String, Seq[Expression])] =
        e match {
          case f: UnresolvedFunction if f.nameParts.length == 1 =>
            Some((f.nameParts.head.toLowerCase(java.util.Locale.ROOT),
              f.arguments))
          case _ => None
        }
    }
    def conjuncts(e: Expression): Seq[Expression] = e match {
      case CAnd(l, r) => conjuncts(l) ++ conjuncts(r)
      case Fn("and", Seq(l, r)) => conjuncts(l) ++ conjuncts(r)
      case other => Seq(other)
    }
    def keyOf(e: Expression): Option[String] = e match {
      case u: UnresolvedAttribute if u.nameParts.length == 1 &&
        statKeys.contains(u.nameParts.head) => Some(u.nameParts.head)
      case a: Attribute if statKeys.contains(a.name) => Some(a.name)
      case _ => None
    }
    def litCol(l: CLit): org.apache.spark.sql.Column =
      org.apache.spark.sql.GraftSqlShim.column(l)
    // a file whose key stats are all-null cannot satisfy a comparison
    // (null comparisons are never TRUE row-level), so a null interval
    // test dropping it is exact, not just conservative
    def admitOne(e: Expression): Option[org.apache.spark.sql.Column] =
      e match {
        case CEq(k, l: CLit) => keyOf(k).map(c =>
          col(s"min_$c") <= litCol(l) && col(s"max_$c") >= litCol(l))
        case CEq(l: CLit, k) => keyOf(k).map(c =>
          col(s"min_$c") <= litCol(l) && col(s"max_$c") >= litCol(l))
        case CGt(k, l: CLit) => keyOf(k).map(c => col(s"max_$c") > litCol(l))
        case CGt(l: CLit, k) => keyOf(k).map(c => col(s"min_$c") < litCol(l))
        case CGe(k, l: CLit) => keyOf(k).map(c => col(s"max_$c") >= litCol(l))
        case CGe(l: CLit, k) => keyOf(k).map(c => col(s"min_$c") <= litCol(l))
        case CLt(k, l: CLit) => keyOf(k).map(c => col(s"min_$c") < litCol(l))
        case CLt(l: CLit, k) => keyOf(k).map(c => col(s"max_$c") > litCol(l))
        case CLe(k, l: CLit) => keyOf(k).map(c => col(s"min_$c") <= litCol(l))
        case CLe(l: CLit, k) => keyOf(k).map(c => col(s"max_$c") >= litCol(l))
        case CIn(k, vs) if vs.nonEmpty && vs.forall(_.isInstanceOf[CLit]) =>
          keyOf(k).map { c =>
            vs.map(v => col(s"min_$c") <= litCol(v.asInstanceOf[CLit]) &&
              col(s"max_$c") >= litCol(v.asInstanceOf[CLit]))
              .reduce(_ || _)
          }
        case Fn("=" | "==", Seq(a, b)) => admitOne(CEq(a, b))
        case Fn(">", Seq(a, b)) => admitOne(CGt(a, b))
        case Fn(">=", Seq(a, b)) => admitOne(CGe(a, b))
        case Fn("<", Seq(a, b)) => admitOne(CLt(a, b))
        case Fn("<=", Seq(a, b)) => admitOne(CLe(a, b))
        case Fn("in", k +: vs) if vs.nonEmpty => admitOne(CIn(k, vs))
        case _ => None
      }
    val admits = conjuncts(
      org.apache.spark.sql.GraftSqlShim.eagerExpression(predicate))
      .flatMap(admitOne)
    if (admits.isEmpty) return fileRows
    val admitted = filterSidecarToFiles(side, fileRows.map(_._1).toSet)
      .filter(admits.reduce(_ && _))
      .select(col("file")).collect()
      .map(r => normPath(r.getString(0))).toSet
    fileRows.filter(r => admitted.contains(normPath(r._1)))
  }

  /** The `key` column a bloom sidecar dir records — memoized per
    * directory through [[memoizedMeta]], because the read is a (tiny)
    * Spark job and the probe sits on hot paths (point scans,
    * runtime-filter admission, DML discovery, loadTable). The
    * FileStatus in the memo key closes the r20-advice hole a
    * path-only key left open: dropping a table directory and
    * re-initializing the SAME path restarts versions at 0, recreating
    * e.g. `_bloom/v0` with a DIFFERENT key — under a path-only key
    * the stale entry would let admission probe sketches built over
    * another column, a silent false prune. The recreated dir's status
    * differs, so it re-reads. */
  private def bloomRecordedKey(
      spark: SparkSession,
      dir: String): Option[String] =
    memoizedMeta(fs(spark, dir), new Path(dir), "bloomkey") {
      val side = spark.read.parquet(dir)
      if (!side.columns.contains("key")) None
      else side.select(col("key")).limit(1).collect()
        .headOption.map(_.getString(0))
    }

  /** [[statsPrunedForDml]]'s point-lookup sibling: when a BLOOM
    * sidecar describes the parent generation and the predicate carries
    * an equality or IN conjunct on the sidecar's recorded key, only
    * the files whose bloom might contain one of the values stay in the
    * DML discovery scan — `UPDATE ... WHERE event_id = x` on a
    * bloom-indexed 100-TB table opens a handful of files to find its
    * blast radius. Same conservative contract: unrecognized shapes
    * widen admission, blooms never produce false negatives, and the
    * exact predicate still runs row-level. */
  private[graft] def bloomPrunedForDml(
      spark: SparkSession,
      tablePath: String,
      version: Long,
      fileRows: Seq[(String, String, Option[Long])],
      predicate: org.apache.spark.sql.Column)
      : Seq[(String, String, Option[Long])] = {
    if (fileRows.isEmpty) return fileRows
    if (colMapAsOf(spark, tablePath, version)
      .exists { case (p, l) => !l.contains(p) }) return fileRows
    val bd = describingSidecarDir(spark, tablePath, "_bloom", version)
      .getOrElse(return fileRows)
    val keyCol = bloomRecordedKey(spark, bd).getOrElse(return fileRows)
    import org.apache.spark.sql.catalyst.analysis.{UnresolvedAttribute, UnresolvedFunction}
    import org.apache.spark.sql.catalyst.expressions.{And => CAnd, Attribute, EqualTo => CEq, Expression, In => CIn, Literal => CLit}
    object Fn {
      def unapply(e: Expression): Option[(String, Seq[Expression])] =
        e match {
          case f: UnresolvedFunction if f.nameParts.length == 1 =>
            Some((f.nameParts.head.toLowerCase(java.util.Locale.ROOT),
              f.arguments))
          case _ => None
        }
    }
    def conjuncts(e: Expression): Seq[Expression] = e match {
      case CAnd(l, r) => conjuncts(l) ++ conjuncts(r)
      case Fn("and", Seq(l, r)) => conjuncts(l) ++ conjuncts(r)
      case other => Seq(other)
    }
    def isKey(e: Expression): Boolean = e match {
      case u: UnresolvedAttribute =>
        u.nameParts.length == 1 && u.nameParts.head == keyCol
      case a: Attribute => a.name == keyCol
      case _ => false
    }
    def scalaValue(l: CLit): Any =
      org.apache.spark.sql.catalyst.CatalystTypeConverters
        .convertToScala(l.value, l.dataType)
    def pointValues(e: Expression): Option[Seq[Any]] = e match {
      case CEq(k, l: CLit) if isKey(k) => Some(Seq(scalaValue(l)))
      case CEq(l: CLit, k) if isKey(k) => Some(Seq(scalaValue(l)))
      case CIn(k, vs) if isKey(k) && vs.nonEmpty &&
        vs.forall(_.isInstanceOf[CLit]) =>
        Some(vs.map(v => scalaValue(v.asInstanceOf[CLit])))
      case Fn("=" | "==", Seq(a, b)) => pointValues(CEq(a, b))
      case Fn("in", k +: vs) if vs.nonEmpty => pointValues(CIn(k, vs))
      case _ => None
    }
    // the FIRST point conjunct suffices (conjuncts intersect): a row
    // matching the whole predicate must match it
    conjuncts(org.apache.spark.sql.GraftSqlShim
      .eagerExpression(predicate))
      .flatMap(pointValues).headOption match {
      case None => fileRows
      case Some(values) =>
        val admitted = values
          .flatMap(v => Skipping.pruneFilesPoint(spark, bd, v))
          .map(normPath).toSet
        fileRows.filter(r => admitted.contains(normPath(r._1)))
    }
  }

  /** Prune [[mergeInto]]'s MATCHED-pass target scan by the SOURCE's
    * key range: when the ON condition carries a plain `t.<col> =
    * s.<col>` equality and a stats sidecar describes the target's
    * parent generation, ONE small aggregate computes the source key's
    * [min, max] and only target files whose interval intersects it
    * stay in the match scan — a MERGE whose source covers one day of
    * a date-clustered 100-TB table reads that day's files to find its
    * matches, not the table. Conservative as always: no sidecar, no
    * recognizable equality, or an all-null source key → no pruning;
    * rows outside the admitted files cannot match (their key interval
    * misses every source key), so the join answer is unchanged. */
  private[graft] def mergeSourcePruned(
      spark: SparkSession,
      tablePath: String,
      version: Long,
      fileRows: Seq[(String, String, Option[Long])],
      source: DataFrame,
      on: org.apache.spark.sql.Column)
      : Seq[(String, String, Option[Long])] = {
    if (fileRows.isEmpty) return fileRows
    if (colMapAsOf(spark, tablePath, version)
      .exists { case (p, l) => !l.contains(p) }) return fileRows
    val sd = describingSidecarDir(spark, tablePath, "_stats", version)
      .getOrElse(return fileRows)
    val side = spark.read.parquet(sd)
    val statKeys = side.columns.filter(_.startsWith("min_"))
      .map(_.stripPrefix("min_")).toSet
    import org.apache.spark.sql.catalyst.analysis.{UnresolvedAttribute, UnresolvedFunction}
    import org.apache.spark.sql.catalyst.expressions.{And => CAnd, EqualTo => CEq, Expression}
    object Fn {
      def unapply(e: Expression): Option[(String, Seq[Expression])] =
        e match {
          case f: UnresolvedFunction if f.nameParts.length == 1 =>
            Some((f.nameParts.head.toLowerCase(java.util.Locale.ROOT),
              f.arguments))
          case _ => None
        }
    }
    def conjuncts(e: Expression): Seq[Expression] = e match {
      case CAnd(l, r) => conjuncts(l) ++ conjuncts(r)
      case Fn("and", Seq(l, r)) => conjuncts(l) ++ conjuncts(r)
      case other => Seq(other)
    }
    def sided(e: Expression): Option[(String, String)] = e match {
      // (alias, column) of a two-part attribute — the verbs' own
      // t./s. aliases, whichever way the equality was written
      case u: UnresolvedAttribute if u.nameParts.length == 2 =>
        Some((u.nameParts.head, u.nameParts.last))
      case _ => None
    }
    def eqKey(e: Expression): Option[(String, String)] = e match {
      case CEq(a, b) =>
        (sided(a), sided(b)) match {
          case (Some(("t", tc)), Some(("s", sc))) => Some((tc, sc))
          case (Some(("s", sc)), Some(("t", tc))) => Some((tc, sc))
          case _ => None
        }
      case Fn("=" | "==", Seq(a, b)) => eqKey(CEq(a, b))
      case _ => None
    }
    val key = conjuncts(
      org.apache.spark.sql.GraftSqlShim.eagerExpression(on))
      .flatMap(eqKey).find { case (tc, sc) =>
        statKeys.contains(tc) && source.columns.contains(sc)
      }
      .getOrElse(return fileRows)
    val (tCol, sCol) = key
    val bounds = source.agg(
      min(col(sCol)).as("lo"), max(col(sCol)).as("hi")).collect().head
    if (bounds.isNullAt(0)) return fileRows // all-null source key
    val admitted = filterSidecarToFiles(side, fileRows.map(_._1).toSet)
      .filter(col(s"max_$tCol") >= lit(bounds.get(0)) &&
        col(s"min_$tCol") <= lit(bounds.get(1)))
      .select(col("file")).collect()
      .map(r => normPath(r.getString(0))).toSet
    fileRows.filter(r => admitted.contains(normPath(r._1)))
  }

  /** One WHEN clause of [[mergeInto]] — the SQL MERGE action shapes.
    * `cond` is the clause's extra predicate (beyond the ON match),
    * evaluated over BOTH sides' columns; columns of the target
    * qualify as `t.<col>`, the source as `s.<col>` (unqualified names
    * resolve only while unambiguous). */
  sealed trait MergeClause
  /** WHEN MATCHED [AND cond] THEN UPDATE SET col = expr, ... */
  case class MergeUpdate(
      cond: Option[org.apache.spark.sql.Column],
      set: Seq[(String, org.apache.spark.sql.Column)]) extends MergeClause
  /** WHEN MATCHED [AND cond] THEN DELETE */
  case class MergeDelete(
      cond: Option[org.apache.spark.sql.Column]) extends MergeClause
  /** WHEN NOT MATCHED [AND cond] THEN INSERT (cols...) VALUES (...) */
  case class MergeInsert(
      cond: Option[org.apache.spark.sql.Column],
      values: Seq[(String, org.apache.spark.sql.Column)]) extends MergeClause
  /** WHEN NOT MATCHED BY SOURCE [AND cond] THEN UPDATE SET ... —
    * target rows NO source row matched; expressions reference the
    * target side only (the ANSI restriction). */
  case class MergeUpdateBySource(
      cond: Option[org.apache.spark.sql.Column],
      set: Seq[(String, org.apache.spark.sql.Column)]) extends MergeClause
  /** WHEN NOT MATCHED BY SOURCE [AND cond] THEN DELETE — the
    * full-sync / replication clause: target rows the source stopped
    * carrying leave the table. */
  case class MergeDeleteBySource(
      cond: Option[org.apache.spark.sql.Column]) extends MergeClause

  /** ANSI MERGE INTO as FILE-EXACT copy-on-write — the general
    * source-driven upsert over a flat or hive-partitioned snapshot
    * table (partitioned rewrites go `partitionBy`, fragments
    * re-derive from the data), completing
    * [[merge]]'s keyed shape and [[mergePartitioned]]'s
    * partition-scoped shape. One semi-join pass finds the target
    * files containing ANY ON-matched row (the match blast radius —
    * only those rewrite; every untouched file repoints verbatim), a
    * cardinality aggregate enforces the ANSI contract that no target
    * row matches two source rows (refused loudly, never
    * last-source-wins), and ONE fresh write carries the rewritten
    * survivors plus the not-matched inserts. Matched clauses apply
    * first-match-wins in declaration order (the SQL contract), and so
    * do the WHEN NOT MATCHED BY SOURCE clauses over the target rows
    * the source stopped carrying — their blast radius is its own
    * condition-pruned anti-join pass, so a full-sync MERGE rewrites
    * only the files its deletes and updates actually touch. Rows hit
    * by no clause carry unchanged. Deletion vectors,
    * constraints, generated columns and column mappings compose
    * exactly as in [[updateWhere]]. The source is evaluated exactly
    * TWICE (blast radius + rewrite join) — cache it if expensive.
    * Returns the head after the verb (unchanged when the source
    * matches nothing and inserts nothing). */
  def mergeInto(
      spark: SparkSession,
      tablePath: String,
      source: DataFrame,
      on: org.apache.spark.sql.Column,
      clauses: Seq[MergeClause],
      ts: Option[Long] = None): Long = {
    require(clauses.nonEmpty, "mergeInto needs at least one WHEN clause")
    val matched = clauses.collect {
      case u: MergeUpdate => u: MergeClause
      case d: MergeDelete => d: MergeClause
    }
    val inserts = clauses.collect { case i: MergeInsert => i }
    val bySource = clauses.collect {
      case u: MergeUpdateBySource => u: MergeClause
      case d: MergeDeleteBySource => d: MergeClause
    }
    val observed = latestVersion(spark, tablePath).getOrElse(
      throw new IllegalArgumentException(
        s"mergeInto: $tablePath has no committed versions"))
    requireNotEqGoverned(spark, tablePath, observed, "mergeInto")
    val gen = manifestFor(spark, tablePath, observed)
    require(gen.nonEmpty,
      s"mergeInto: version $observed of $tablePath vanished between " +
        "the head resolution and its read — a racing retraction; retry")
    val fileRows = fileRowsOf(gen)
    val partCol = dmlPartitionCol(fileRows, observed, tablePath,
      "mergeInto")
    val schemaJson = schemaJsonOf(gen).orNull
    val stored = schemaJsonOf(gen).map(j =>
      org.apache.spark.sql.types.DataType.fromJson(j)
        .asInstanceOf[org.apache.spark.sql.types.StructType])
    val l2p = logicalToPhysical(colMapAsOf(spark, tablePath, observed))
    val prior = dvSet(spark, tablePath, observed)
    def liveWithMeta(rows: Seq[(String, String, Option[Long])]): DataFrame = {
      val base = fromPhysical(readFileRows(spark,
        rows.map(r => (r._1, r._2)),
        stored.map(physicalSchema(_, l2p)), withMeta = true), l2p)
      prior.fold(base)(applyDv(base, _))
    }
    // the sentinel marks "the left join FOUND a source row" without
    // guessing at a non-null source column — MERGE's matched test
    val src = source.withColumn(MergeSrcSentinel, lit(1)).alias("s")
    // pass 1 — the match blast radius + the ANSI cardinality check in
    // ONE aggregate: per matched target row identity, how many source
    // rows matched
    val dirtyMatched: Set[String] =
      // no matched clause → no matched-file rewrites (and the ANSI
      // cardinality contract binds only update/delete — Spark and
      // Iceberg agree); an empty face has nothing to match either way
      if (fileRows.isEmpty || matched.isEmpty) Set.empty
      else {
        // target files whose stats interval misses the source's whole
        // key range cannot contain a match — prune the match scan
        val matchScan = mergeSourcePruned(spark, tablePath, observed,
          fileRows, source, on)
        if (matchScan.isEmpty) Set.empty // stats disprove any match
        else {
          val matchCounts = liveWithMeta(matchScan).alias("t")
            .join(src, on, "inner")
            .groupBy(col(DvFileCol), col(DvPosCol))
            .agg(count(lit(1)).as("n_matches"))
          val ambiguous = matchCounts.filter(col("n_matches") > 1)
            .limit(1).collect()
          require(ambiguous.isEmpty,
            s"mergeInto: a target row of $tablePath matches more than " +
              "one source row — the ANSI MERGE cardinality contract; " +
              "deduplicate the source on the ON keys first")
          matchCounts.select(col(DvFileCol)).distinct()
            .collect().map(r => normPath(r.getString(0))).toSet
        }
      }
    // the NOT MATCHED BY SOURCE blast radius: files containing a
    // target row with NO match that some by-source clause would hit —
    // one anti-join pass, pruned by the clauses' own conditions
    val dirtyBySource: Set[String] =
      if (fileRows.isEmpty || bySource.isEmpty) Set.empty
      else {
        val anyCond = bySource.map {
          case MergeUpdateBySource(c, _) => c.getOrElse(lit(true))
          case MergeDeleteBySource(c) => c.getOrElse(lit(true))
          case _ => lit(false)
        }.reduce(_ || _)
        liveWithMeta(fileRows).alias("t")
          .join(src, on, "left_anti")
          .filter(anyCond)
          .select(col(DvFileCol)).distinct()
          .collect().map(r => normPath(r.getString(0))).toSet
      }
    val dirtySet = dirtyMatched ++ dirtyBySource
    val (dirtyRows, cleanRows) =
      fileRows.partition(r => dirtySet.contains(normPath(r._1)))
    val colType: Map[String, org.apache.spark.sql.types.DataType] =
      stored.map(_.fields.map(f => f.name -> f.dataType).toMap)
        .getOrElse(Map.empty)
    def castTo(c: String, v: org.apache.spark.sql.Column) =
      colType.get(c).map(v.cast).getOrElse(v)
    val targetCols: Seq[String] = stored.map(_.fieldNames.toSeq)
      .getOrElse {
        require(fileRows.nonEmpty,
          s"mergeInto: version $observed of $tablePath is empty and " +
            "carries no stored schema — the insert face is unknowable")
        fromPhysical(readFileRows(spark,
          fileRows.take(1).map(r => (r._1, r._2)), None), l2p)
          .columns.toSeq
      }
    // pass 2 — rewrite the dirty files: left-join their live rows to
    // the source, apply the first matching WHEN clause per row
    val rewritten: Option[DataFrame] =
      if (dirtyRows.isEmpty) None
      else {
        val withSentinel = liveWithMeta(dirtyRows).alias("t")
          .join(src, on, "left_outer")
        val isMatched = col(MergeSrcSentinel).isNotNull
        // first-match-wins per row set: matched rows walk the matched
        // clauses in declaration order, unmatched-by-source rows the
        // by-source clauses — two independent CASE WHEN chains folded
        // per output column + one keep/delete flag
        var keep: org.apache.spark.sql.Column = lit(true)
        var decided: org.apache.spark.sql.Column = lit(false)
        var decidedBs: org.apache.spark.sql.Column = lit(false)
        val colExprs = scala.collection.mutable.LinkedHashMap[String,
          org.apache.spark.sql.Column]()
        targetCols.foreach(c => colExprs(c) = col(s"t.$c"))
        def setCols(
            fires: org.apache.spark.sql.Column,
            set: Seq[(String, org.apache.spark.sql.Column)],
            verb: String): Unit =
          set.foreach { case (c, v) =>
            require(targetCols.contains(c),
              s"mergeInto: $verb names no column '$c' of " +
                s"$tablePath (columns: ${targetCols.mkString(", ")})")
            colExprs(c) = when(fires, castTo(c, v)).otherwise(colExprs(c))
          }
        clauses.foreach {
          case MergeUpdate(cond, set) =>
            val fires = isMatched && !decided && cond.getOrElse(lit(true))
            setCols(fires, set, "UPDATE SET")
            decided = decided || (isMatched && cond.getOrElse(lit(true)))
          case MergeDelete(cond) =>
            val fires = isMatched && !decided && cond.getOrElse(lit(true))
            keep = keep && !fires
            decided = decided || (isMatched && cond.getOrElse(lit(true)))
          case MergeUpdateBySource(cond, set) =>
            val fires =
              !isMatched && !decidedBs && cond.getOrElse(lit(true))
            setCols(fires, set, "UPDATE SET (not matched by source)")
            decidedBs = decidedBs ||
              (!isMatched && cond.getOrElse(lit(true)))
          case MergeDeleteBySource(cond) =>
            val fires =
              !isMatched && !decidedBs && cond.getOrElse(lit(true))
            keep = keep && !fires
            decidedBs = decidedBs ||
              (!isMatched && cond.getOrElse(lit(true)))
          case _: MergeInsert => ()
        }
        // With no WHEN MATCHED clause the ANSI cardinality check never
        // ran, yet a by-source clause can dirty files that ALSO hold
        // matched rows; the left_outer join fans those out per source
        // match. Every such row's outputs depend on target columns
        // only (by-source SET is target-side by the ANSI restriction,
        // matched rows carry unchanged), so collapsing on the row
        // identity is exact. With matched clauses present the
        // cardinality check above already refused any fan-out.
        val applied = withSentinel.filter(keep)
        val collapsed =
          if (matched.isEmpty) applied.dropDuplicates(DvFileCol, DvPosCol)
          else applied
        Some(collapsed
          .select(targetCols.map(c => colExprs(c).as(c)): _*))
      }
    // not-matched inserts: source rows with NO target match at all
    val inserted: Option[DataFrame] =
      if (inserts.isEmpty) None
      else {
        val unmatched =
          if (fileRows.isEmpty) src
          else src.join(liveWithMeta(fileRows).alias("t"), on, "left_anti")
        var decided: org.apache.spark.sql.Column = lit(false)
        val legs = inserts.map { case MergeInsert(cond, values) =>
          values.foreach { case (c, _) =>
            require(targetCols.contains(c),
              s"mergeInto: INSERT names no column '$c' of $tablePath " +
                s"(columns: ${targetCols.mkString(", ")})")
          }
          val fires = !decided && cond.getOrElse(lit(true))
          decided = decided || cond.getOrElse(lit(true))
          val byName = values.toMap
          unmatched.filter(fires).select(targetCols.map(c =>
            byName.get(c).map(v => castTo(c, v))
              .getOrElse(lit(null).cast(colType.getOrElse(c,
                org.apache.spark.sql.types.StringType))).as(c)): _*)
        }
        legs.reduceLeftOption(_.unionByName(_))
      }
    val freshFrame = (rewritten, inserted) match {
      case (Some(r), Some(i)) => Some(r.unionByName(i))
      case (r, i) => r.orElse(i)
    }
    // short-circuits: the insert-emptiness probe job runs only when no
    // file rewrites force a commit anyway
    val anythingToWrite = freshFrame.isDefined &&
      (dirtyRows.nonEmpty || inserted.exists(!_.isEmpty))
    if (!anythingToWrite) return observed
    val version = claimVersion(spark, tablePath, observed + 1L)
    val prepared = prepareBatch(spark, tablePath, Some(observed),
      freshFrame.get)
    val fresh = writeDmlFiles(spark, tablePath, observed, version,
      prepared, partCol)
    prior.foreach { p =>
      val survivingFiles = p.select(col("file")).distinct().collect()
        .map(_.getString(0))
        .filter(f => !dirtySet.contains(normPath(f)))
      writeDvSet(spark, tablePath, version,
        if (survivingFiles.isEmpty) p.limit(0)
        else p.filter(col("file").isin(survivingFiles.toIndexedSeq: _*)))
    }
    maintainIndexSidecars(spark, tablePath, observed, version,
      cleanRows.map(_._1), fresh.map(_._1))
    publishDerived(spark, tablePath, version, cleanRows ++ fresh,
      schemaJson, ts, observed, "mergeInto")
  }

  // ------------------------------------------------------------------
  // CHECK constraints — declarative row invariants enforced at ingest
  // ------------------------------------------------------------------

  private def constraintsRoot(tablePath: String): String =
    s"$tablePath/_constraints"

  private def constraintsDir(tablePath: String, version: Long): String =
    s"${constraintsRoot(tablePath)}/v$version"

  private def constraintSchema = org.apache.spark.sql.types.StructType(Seq(
    org.apache.spark.sql.types.StructField("name",
      org.apache.spark.sql.types.StringType),
    org.apache.spark.sql.types.StructField("expr",
      org.apache.spark.sql.types.StringType)))

  /** The CHECK constraints GOVERNING `version`, as (name, exprSql)
    * pairs — the versioned sidecar family again ([[sidecarResolve]]):
    * each `_constraints/v<N>` holds the full active set of its
    * version, so constraints travel with the table, appends inherit,
    * and every face replays with exactly the invariants it was
    * written under. */
  def constraintsAsOf(
      spark: SparkSession,
      tablePath: String,
      version: Long): Seq[(String, String)] =
    sidecarResolve(spark, constraintsRoot(tablePath), version).map {
      case (_, dir) =>
        spark.read.schema(constraintSchema).parquet(dir)
          .collect().map(r => (r.getString(0), r.getString(1)))
          .sortBy(_._1).toSeq
    }.getOrElse(Seq.empty)

  private def writeConstraints(
      spark: SparkSession,
      tablePath: String,
      version: Long,
      set: Seq[(String, String)]): Unit =
    writeMetaDir(spark, constraintsDir(tablePath, version),
      Seq("name" -> false, "expr" -> false),
      set.map(c => Seq[Any](c._1, c._2)))

  /** Wrap a fresh batch in its governing CHECK constraints as an
    * `assert_true` filter that RIDES the write job — Delta's
    * invariant-enforcement shape: zero extra passes (the expressions
    * evaluate inside the write tasks, codegen'd with the rest of the
    * projection), and the first violating row aborts the job with the
    * constraint's name before anything publishes. SQL CHECK
    * three-valued semantics: a row violates only when the expression
    * is FALSE — null/unknown passes (`coalesce(expr, true)`). An
    * aborted write leaves a claimed marker and partial files — the
    * same benign debris any crashed committer leaves
    * ([[removeOrphans]]' job); the manifest never saw the batch. */
  private def constraintGuard(
      spark: SparkSession,
      tablePath: String,
      parent: Option[Long],
      df: DataFrame): DataFrame = {
    val active = parent
      .map(constraintsAsOf(spark, tablePath, _)).getOrElse(Seq.empty)
    if (active.isEmpty) df
    else df.filter(active.map { case (n, e) =>
      assert_true(coalesce(expr(e), lit(true)),
        lit(s"CHECK constraint '$n' violated: $e")).isNull
    }.reduce(_ && _))
  }

  /** The latest generation's manifest rows + stored schema JSON — the
    * shared fixture of every METADATA-ONLY commit (deletes,
    * constraint changes): the new version repoints these verbatim. */
  private def headGeneration(
      spark: SparkSession,
      tablePath: String,
      version: Long)
      : (Seq[(String, String, Option[Long])], String) = {
    val gen = manifestFor(spark, tablePath, version)
    require(gen.nonEmpty,
      s"snapshot version $version of $tablePath is not in the manifest " +
        "(never committed, or expired by vacuum)")
    (fileRowsOf(gen), schemaJsonOf(gen).orNull)
  }

  /** ALTER TABLE ADD CONSTRAINT: a metadata-only commit (parent files
    * repointed verbatim) that installs a named CHECK expression
    * enforced on every subsequent ingest ([[constraintGuard]] rides
    * each write job). Delta's semantics: the EXISTING face must
    * already satisfy the new invariant — one explicit validation scan,
    * the honest cost of retrofitting — so a constraint can never be
    * true of some of a version's rows. Returns the minted version. */
  def addConstraint(
      spark: SparkSession,
      tablePath: String,
      name: String,
      exprSql: String): Long = {
    require(name.nonEmpty, "addConstraint needs a constraint name")
    val observed = latestVersion(spark, tablePath).getOrElse(
      throw new IllegalArgumentException(
        s"addConstraint: $tablePath has no committed versions"))
    val active = constraintsAsOf(spark, tablePath, observed)
    require(!active.exists(_._1 == name),
      s"addConstraint: constraint '$name' already exists on $tablePath")
    // validate against the LOGICAL row shape — governing generated
    // columns materialize first (materialize-ONLY: rows from files
    // older than the generator null-fill the stored column, so the
    // ingest-time equality check would misfire here; the defining
    // expression is the truth either way), so a constraint may
    // reference generated columns even though older files never wrote
    // them
    val face = generatedColumnsAsOf(spark, tablePath, observed)
      .foldLeft(readAsOf(spark, tablePath, observed)) {
        case (d, (n, e)) => d.withColumn(n, expr(e))
      }
    val bad = face
      .filter(expr(exprSql) === lit(false)).limit(1).collect()
    require(bad.isEmpty,
      s"addConstraint('$name'): existing rows of $tablePath violate " +
        s"'$exprSql' — fix the data (or the expression) first")
    val (fileRows, schemaJson) = headGeneration(spark, tablePath, observed)
    val version = claimVersion(spark, tablePath, observed + 1L)
    writeConstraints(spark, tablePath, version,
      active :+ (name -> exprSql))
    publishDerived(spark, tablePath, version, fileRows, schemaJson, None,
      observed, "addConstraint")
  }

  /** ALTER TABLE DROP CONSTRAINT — the metadata-only inverse. Past
    * versions keep their governing set (a face replays with the
    * invariants it was written under); only ingest from here on stops
    * checking. Returns the minted version. */
  def dropConstraint(
      spark: SparkSession,
      tablePath: String,
      name: String): Long = {
    val observed = latestVersion(spark, tablePath).getOrElse(
      throw new IllegalArgumentException(
        s"dropConstraint: $tablePath has no committed versions"))
    val active = constraintsAsOf(spark, tablePath, observed)
    require(active.exists(_._1 == name),
      s"dropConstraint: no constraint '$name' on $tablePath")
    val (fileRows, schemaJson) = headGeneration(spark, tablePath, observed)
    val version = claimVersion(spark, tablePath, observed + 1L)
    writeConstraints(spark, tablePath, version,
      active.filterNot(_._1 == name))
    publishDerived(spark, tablePath, version, fileRows, schemaJson, None,
      observed, "dropConstraint")
  }

  // ------------------------------------------------------------------
  // Generated columns — declared once, materialized at every ingest
  // ------------------------------------------------------------------

  private def genColsRoot(tablePath: String): String = s"$tablePath/_gencols"

  private def genColsDir(tablePath: String, version: Long): String =
    s"${genColsRoot(tablePath)}/v$version"

  /** The generated columns GOVERNING `version` as (name, exprSql)
    * pairs — same versioned-sidecar family as constraints. */
  def generatedColumnsAsOf(
      spark: SparkSession,
      tablePath: String,
      version: Long): Seq[(String, String)] =
    sidecarResolve(spark, genColsRoot(tablePath), version).map {
      case (_, dir) =>
        spark.read.schema(constraintSchema).parquet(dir)
          .collect().map(r => (r.getString(0), r.getString(1)))
          .sortBy(_._1).toSeq
    }.getOrElse(Seq.empty)

  private def writeGenCols(
      spark: SparkSession,
      tablePath: String,
      version: Long,
      set: Seq[(String, String)]): Unit =
    writeMetaDir(spark, genColsDir(tablePath, version),
      Seq("name" -> false, "expr" -> false),
      set.map(c => Seq[Any](c._1, c._2)))

  /** Materialize the governing generated columns into a fresh batch —
    * or, when the writer supplied the column itself, VALIDATE it
    * against the defining expression inside the write job (the same
    * zero-extra-pass assert_true shape as [[constraintGuard]]; a
    * writer-supplied wrong value is a refused batch, Delta's
    * semantics). Runs BEFORE the constraint guard so constraints may
    * reference generated columns, and before the physical translation
    * so expressions speak logical names. */
  private def genColumnsApply(
      spark: SparkSession,
      tablePath: String,
      parent: Option[Long],
      df: DataFrame): DataFrame = {
    val gens = parent
      .map(generatedColumnsAsOf(spark, tablePath, _)).getOrElse(Seq.empty)
    gens.foldLeft(df) { case (d, (n, e)) =>
      if (!d.columns.contains(n)) d.withColumn(n, expr(e))
      else d.filter(assert_true(col(n) <=> expr(e),
        lit(s"generated column '$n' violated its definition: $e")).isNull)
    }
  }

  /** Declare a generated column: from this version on, every ingest
    * materializes `name = exprSql` when the batch lacks the column and
    * validates it when supplied. Metadata-only (parent files verbatim);
    * history is untouched — earlier files null-fill the column by
    * schema evolution once a later batch carries it. */
  def addGeneratedColumn(
      spark: SparkSession,
      tablePath: String,
      name: String,
      exprSql: String): Long = {
    require(name.nonEmpty, "addGeneratedColumn needs a column name")
    val observed = latestVersion(spark, tablePath).getOrElse(
      throw new IllegalArgumentException(
        s"addGeneratedColumn: $tablePath has no committed versions"))
    storedSchema(spark, tablePath, observed).foreach(st =>
      require(!st.fieldNames.contains(name),
        s"addGeneratedColumn: '$name' already exists as a data column"))
    val active = generatedColumnsAsOf(spark, tablePath, observed)
    require(!active.exists(_._1 == name),
      s"addGeneratedColumn: '$name' is already generated")
    val (fileRows, schemaJson) = headGeneration(spark, tablePath, observed)
    val version = claimVersion(spark, tablePath, observed + 1L)
    writeGenCols(spark, tablePath, version, active :+ (name -> exprSql))
    publishDerived(spark, tablePath, version, fileRows, schemaJson, None,
      observed, "addGeneratedColumn")
  }

  /** Stop generating `name` — already-written data keeps the column
    * (drop it from the schema separately via [[dropColumn]]). */
  def dropGeneratedColumn(
      spark: SparkSession,
      tablePath: String,
      name: String): Long = {
    val observed = latestVersion(spark, tablePath).getOrElse(
      throw new IllegalArgumentException(
        s"dropGeneratedColumn: $tablePath has no committed versions"))
    val active = generatedColumnsAsOf(spark, tablePath, observed)
    require(active.exists(_._1 == name),
      s"dropGeneratedColumn: no generated column '$name' on $tablePath")
    val (fileRows, schemaJson) = headGeneration(spark, tablePath, observed)
    val version = claimVersion(spark, tablePath, observed + 1L)
    writeGenCols(spark, tablePath, version, active.filterNot(_._1 == name))
    publishDerived(spark, tablePath, version, fileRows, schemaJson, None,
      observed, "dropGeneratedColumn")
  }

  /** The shared ingest preparation every data-writing verb runs:
    * generated columns materialize/validate, CHECK constraints guard,
    * the column mapping translates to physical names — in that order
    * (constraints may reference generated columns; both speak logical
    * names). */
  private def prepareBatch(
      spark: SparkSession,
      tablePath: String,
      parent: Option[Long],
      df: DataFrame): DataFrame =
    constraintGuard(spark, tablePath, parent,
      genColumnsApply(spark, tablePath, parent, df))

  // ------------------------------------------------------------------
  // Column mapping — RENAME/DROP COLUMN as pure metadata (field-ids)
  // ------------------------------------------------------------------

  private def colMapRoot(tablePath: String): String = s"$tablePath/_colmap"

  private def colMapDir(tablePath: String, version: Long): String =
    s"${colMapRoot(tablePath)}/v$version"

  private def colMapSchema = org.apache.spark.sql.types.StructType(Seq(
    org.apache.spark.sql.types.StructField("physical",
      org.apache.spark.sql.types.StringType),
    org.apache.spark.sql.types.StructField("logical",
      org.apache.spark.sql.types.StringType, nullable = true)))

  /** The column mapping GOVERNING `version`: (physical, logical) pairs
    * where `logical = None` is a DROP tombstone. The Iceberg field-id
    * idea reduced to names: data files carry a column's PHYSICAL name
    * forever (assigned at column birth), renames and drops only move
    * the logical label in this sidecar — zero data rewritten, O(1)
    * metadata per schema change on a 100-TB table. Every write
    * translates logical→physical before touching parquet; every read
    * translates back. A dropped column's physical name stays
    * tombstoned so a later re-add can never resurrect old file data
    * under the same name (re-adds are refused loudly — the field-id
    * refinement would mint a fresh physical name instead). Same
    * versioned-sidecar family as DVs/constraints: latest-at-or-below,
    * re-materialized by rollback/clone, folded by vacuum. */
  def colMapAsOf(
      spark: SparkSession,
      tablePath: String,
      version: Long): Seq[(String, Option[String])] =
    sidecarResolve(spark, colMapRoot(tablePath), version).map {
      case (_, dir) => colMapRead(spark, dir)
    }.getOrElse(Seq.empty)

  private def writeColMap(
      spark: SparkSession,
      tablePath: String,
      version: Long,
      set: Seq[(String, Option[String])]): Unit =
    writeMetaDir(spark, colMapDir(tablePath, version),
      Seq("physical" -> false, "logical" -> false),
      set.map(c => Seq[Any](c._1, c._2)))

  private def logicalToPhysical(
      cmap: Seq[(String, Option[String])]): Map[String, String] =
    cmap.collect { case (p, Some(l)) => l -> p }.toMap

  /** Translate a LOGICAL frame to the PHYSICAL column names its files
    * must carry. Refuses a fresh column whose name collides with a
    * mapped or tombstoned physical name — silently writing it would
    * alias old file data under the new column on read. */
  private def toPhysical(
      spark: SparkSession,
      tablePath: String,
      parent: Option[Long],
      df: DataFrame): DataFrame = {
    val cmap = parent
      .map(v => colMapAsOf(spark, tablePath, v)).getOrElse(Seq.empty)
    if (cmap.isEmpty) df
    else {
      val l2p = logicalToPhysical(cmap)
      val reserved = cmap.map(_._1).toSet
      df.columns.foreach { c =>
        require(l2p.contains(c) || !reserved.contains(c),
          s"column '$c' collides with a renamed or dropped column's " +
            "physical name — a tombstoned name cannot be re-added " +
            "(rename the new column first)")
      }
      l2p.foldLeft(df) { case (d, (l, p)) =>
        if (l == p || !d.columns.contains(l)) d
        else d.withColumnRenamed(l, p)
      }
    }
  }

  /** Translate a scanned PHYSICAL frame back to logical names. */
  private def fromPhysical(
      df: DataFrame,
      l2p: Map[String, String]): DataFrame =
    l2p.foldLeft(df) { case (d, (l, p)) =>
      if (l == p || !d.columns.contains(p)) d
      else d.withColumnRenamed(p, l)
    }

  /** The physical read schema for a stored LOGICAL schema. */
  private def physicalSchema(
      stored: org.apache.spark.sql.types.StructType,
      l2p: Map[String, String]): org.apache.spark.sql.types.StructType =
    org.apache.spark.sql.types.StructType(
      stored.fields.map(f => f.copy(name = l2p.getOrElse(f.name, f.name))))

  /** Loud guard for the verbs that address columns inside sidecar
    * FILES by name (clustered stats, blooms, purge rewrites) — their
    * mapping-aware refinement is not built, and running them under a
    * non-trivial mapping would silently miss renamed columns. */
  private def requireNoColMap(
      spark: SparkSession,
      tablePath: String,
      verb: String): Unit = {
    // resolved at Long.MaxValue = the latest mapping generation —
    // identical to resolving at the head version (sidecar generations
    // never outlive their commit: a refused commit retracts its dirs)
    // without the manifest read a latestVersion() would cost
    val governed = colMapAsOf(spark, tablePath, Long.MaxValue)
    require(governed.forall { case (p, l) => l.contains(p) },
      s"$verb: a column rename/drop mapping governs $tablePath — " +
        "this verb addresses physical file columns by name and is not " +
        "mapping-aware yet; run it before the schema change or extend " +
        "it with the translation")
  }

  /** ALTER TABLE RENAME COLUMN as a metadata-only commit: the new
    * generation repoints the parent's files verbatim and its stored
    * schema carries the new LOGICAL name, while the column-mapping
    * sidecar records which PHYSICAL name the files keep. O(1) metadata
    * on any table size — the rewrite-free rename copy-on-write cannot
    * give. Partition columns refuse (fragments are path-encoded);
    * legacy generations without a manifest-carried schema refuse. */
  def renameColumn(
      spark: SparkSession,
      tablePath: String,
      from: String,
      to: String): Long = {
    val observed = latestVersion(spark, tablePath).getOrElse(
      throw new IllegalArgumentException(
        s"renameColumn: $tablePath has no committed versions"))
    val stored = storedSchema(spark, tablePath, observed).getOrElse(
      throw new IllegalArgumentException(
        s"renameColumn: version $observed of $tablePath predates " +
          "manifest-carried schemas — recommit first"))
    require(stored.fieldNames.contains(from),
      s"renameColumn: no column '$from' in ${stored.fieldNames.mkString(",")}")
    require(!stored.fieldNames.contains(to),
      s"renameColumn: column '$to' already exists")
    val (fileRows, _) = headGeneration(spark, tablePath, observed)
    require(!fileRows.exists(r => r._2 != null && r._2.startsWith(s"$from=")),
      s"renameColumn: '$from' is a partition column — its fragments " +
        "are path-encoded and cannot be relabeled in metadata")
    val cmap = colMapAsOf(spark, tablePath, observed)
    require(!cmap.exists(_._1 == to),
      s"renameColumn: '$to' collides with an existing physical name")
    val phys = logicalToPhysical(cmap).getOrElse(from, from)
    val newMap = cmap.filterNot(_._1 == phys) :+ (phys -> Some(to))
    val newSchema = org.apache.spark.sql.types.StructType(
      stored.fields.map(f => if (f.name == from) f.copy(name = to) else f))
    val version = claimVersion(spark, tablePath, observed + 1L)
    writeColMap(spark, tablePath, version, newMap)
    publishDerived(spark, tablePath, version, fileRows, newSchema.json,
      None, observed, "renameColumn")
  }

  /** ALTER TABLE DROP COLUMN as a metadata-only commit: the field
    * leaves the stored logical schema (so scans never even read its
    * bytes — column pruning does the physical work) and its physical
    * name is tombstoned in the mapping so no later commit can alias
    * old file data by re-adding it. Past versions keep the column. */
  def dropColumn(
      spark: SparkSession,
      tablePath: String,
      name: String): Long = {
    val observed = latestVersion(spark, tablePath).getOrElse(
      throw new IllegalArgumentException(
        s"dropColumn: $tablePath has no committed versions"))
    val stored = storedSchema(spark, tablePath, observed).getOrElse(
      throw new IllegalArgumentException(
        s"dropColumn: version $observed of $tablePath predates " +
          "manifest-carried schemas — recommit first"))
    require(stored.fieldNames.contains(name),
      s"dropColumn: no column '$name' in ${stored.fieldNames.mkString(",")}")
    require(stored.fields.length > 1,
      "dropColumn: cannot drop the last column")
    val (fileRows, _) = headGeneration(spark, tablePath, observed)
    require(!fileRows.exists(r => r._2 != null && r._2.startsWith(s"$name=")),
      s"dropColumn: '$name' is a partition column — drop is undefined " +
        "for path-encoded fragments")
    val cmap = colMapAsOf(spark, tablePath, observed)
    val phys = logicalToPhysical(cmap).getOrElse(name, name)
    val newMap = cmap.filterNot(_._1 == phys) :+ (phys -> None)
    val newSchema = org.apache.spark.sql.types.StructType(
      stored.fields.filterNot(_.name == name))
    val version = claimVersion(spark, tablePath, observed + 1L)
    writeColMap(spark, tablePath, version, newMap)
    publishDerived(spark, tablePath, version, fileRows, newSchema.json,
      None, observed, "dropColumn")
  }

  /** ALTER TABLE ADD COLUMN as a metadata-only commit: the field joins
    * the stored logical schema at the END (nullable by contract — a
    * retroactive NOT NULL would be a lie about history) and every
    * existing file null-fills it at scan time through the stored-schema
    * read path, the same mechanism an evolving append uses; no byte of
    * data moves. Past versions keep their own schema (time travel below
    * answers without the column). The name must not collide with a live
    * column OR a renamed/dropped column's tombstoned physical name —
    * re-adding a tombstone would alias old file data on read. */
  def addColumn(
      spark: SparkSession,
      tablePath: String,
      name: String,
      dataType: org.apache.spark.sql.types.DataType): Long = {
    require(name.nonEmpty, "addColumn needs a column name")
    val observed = latestVersion(spark, tablePath).getOrElse(
      throw new IllegalArgumentException(
        s"addColumn: $tablePath has no committed versions"))
    val stored = storedSchema(spark, tablePath, observed).getOrElse(
      throw new IllegalArgumentException(
        s"addColumn: version $observed of $tablePath predates " +
          "manifest-carried schemas — recommit first"))
    require(!stored.fieldNames.contains(name),
      s"addColumn: '$name' already exists")
    val cmap = colMapAsOf(spark, tablePath, observed)
    require(!cmap.map(_._1).contains(name),
      s"addColumn: '$name' collides with a renamed or dropped column's " +
        "physical name — a tombstoned name cannot be re-added")
    require(!generatedColumnsAsOf(spark, tablePath, observed)
      .exists(_._1 == name),
      s"addColumn: '$name' is a generated column")
    val (fileRows, _) = headGeneration(spark, tablePath, observed)
    val newSchema = org.apache.spark.sql.types.StructType(
      stored.fields :+ org.apache.spark.sql.types.StructField(
        name, dataType, nullable = true))
    val version = claimVersion(spark, tablePath, observed + 1L)
    publishDerived(spark, tablePath, version, fileRows, newSchema.json,
      None, observed, "addColumn")
  }

  /** Render a partition value the way Spark's writer renders it into a
    * directory name: hive path-escaping ('=', ':', '%', '/', … become
    * `%XX`). Manifest fragments are recorded from the written
    * directory names, so a LOOKUP value must pass through the same
    * escaping or any special-charactered value silently matches
    * nothing — a scan returns empty and a merge leaves the stale row
    * beside its replacement instead of rewriting the partition. */
  private def partFragment(partCol: String, value: String): String = {
    import org.apache.spark.sql.catalyst.catalog.ExternalCatalogUtils
    s"$partCol=${ExternalCatalogUtils.escapePathName(value)}"
  }

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
      append: Boolean,
      derivedFrom: Option[Long] = None,
      verb: String = "commitClustered"): Long = {
    require(numFiles >= 1, "numFiles must be positive")
    preflightStatsParent(spark, tablePath, append, "commitClustered")
    val clustered = df
      .repartitionByRange(numFiles, col(keyCol))
      .sortWithinPartitions(col(keyCol))
    val version =
      commit(spark, clustered, tablePath, append, None, derivedFrom, verb)
    // the stats parent is the generation's RECORDED lineage parent
    // (writeKeyStats reads it from the manifest) — never version−1 (a
    // crashed claim leaves a numeric gap with no stats dir) and never
    // the pre-claim observed head (reconciliation may have rebased).
    // MAPPING-AWARE: stats aggregate over the RAW FILES, whose columns
    // carry physical names — the sidecar records min_/max_ under the
    // key's physical name ([[scanRangeAsOf]] translates back)
    val statsKey = logicalToPhysical(
      colMapAsOf(spark, tablePath, version)).getOrElse(keyCol, keyCol)
    writeKeyStats(spark, tablePath, version, Seq(statsKey), append)
    version
  }

  /** The sidecar generation GOVERNING a stats/bloom scan of `version`:
    * the exact `v<version>` dir when the generation minted one (the
    * zero-manifest-read fast path), else the latest-at-or-below dir
    * that still DESCRIBES every file of the generation — which is how
    * the index survives the FILE-PRESERVING metadata verbs
    * (deleteWhere, constraint / generated-column changes) that repoint
    * the parent's files verbatim without minting sidecar dirs of their
    * own. Coverage is the proof, checked on the metadata-scale sidecar
    * itself: a generation whose files left the described set (replace,
    * OPTIMIZE, purge) answers None rather than pruning with bounds
    * that no longer speak for the data; an unknown version answers
    * None (nothing can describe files that do not exist). */
  private def describingSidecarDir(
      spark: SparkSession,
      tablePath: String,
      family: String,
      version: Long): Option[String] = {
    val f = fs(spark, tablePath)
    val exact = s"$tablePath/$family/v$version"
    if (f.exists(new Path(exact))) return Some(exact)
    val rows = manifestRows(spark, tablePath, version)
    if (rows.isEmpty) return None
    sidecarResolve(spark, s"$tablePath/$family", version)
      .filter { case (_, dir) =>
        val described = sidecarDescribedFiles(spark, dir)
        rows.forall(r => described.contains(normPath(r._1)))
      }.map(_._2)
  }

  /** The normalized `file` set a stats/bloom sidecar dir describes —
    * the coverage-proof read of [[describingSidecarDir]], memoized per
    * published dir ([[memoizedMeta]]) because it is a driver Spark job
    * on every resolve of a sidecar-governed table. */
  private def sidecarDescribedFiles(
      spark: SparkSession,
      dir: String): Set[String] =
    memoizedMeta(fs(spark, dir), new Path(dir), "described") {
      spark.read.parquet(dir).select(col("file")).collect()
        .map(r => normPath(r.getString(0))).toSet
    }

  /** Stats-pruned key-range scan AS OF `version`: the version's stats
    * manifest admits only the files whose [min, max] interval meets
    * [lo, hi]; the exact row filter clears file-level false positives
    * (stats are necessary, not sufficient). Zero admitted files is an
    * answer (empty frame with the snapshot's schema), a missing stats
    * manifest (version unknown, vacuumed, or committed without
    * clustering) is an error. A version whose files the latest stats
    * generation still fully describes — a deleteWhere or constraint
    * change repointed them verbatim — scans through that generation
    * ([[describingSidecarDir]]), composed with its own deletion
    * vectors. */
  def scanRangeAsOf(
      spark: SparkSession,
      tablePath: String,
      version: Long,
      keyCol: String,
      lo: Any,
      hi: Any): DataFrame = {
    // MAPPING-AWARE: sidecar min_/max_ columns carry the key's
    // PHYSICAL name forever (stats are computed over raw files); a
    // renamed key resolves logical→physical for the sidecar probe and
    // the row filter runs on the logical face — a rename costs the
    // table nothing, not even its data skipping (the Iceberg field-id
    // composition, reduced to names)
    val gens = resolveSidecars(spark, tablePath, version)
    val l2p = logicalToPhysical(colMapOf(spark, gens))
    val phys = l2p.getOrElse(keyCol, keyCol)
    val sd = describingSidecarDir(spark, tablePath, "_stats", version)
      .getOrElse(throw new IllegalArgumentException(
        s"no stats manifest for version $version of $tablePath — not " +
          "committed via commitClustered, or expired by vacuum"))
    val admitted = spark.read.parquet(sd)
      .filter(col(s"max_$phys") >= lit(lo) && col(s"min_$phys") <= lit(hi))
      .select(col("file")).collect().map(_.getString(0)).toIndexedSeq
    // the manifest is read ONLY on the empty-answer path (for the
    // schema) — the happy path stays at zero manifest reads, the
    // budget [[SnapshotsResolutionSpec]] pins
    val base =
      if (admitted.isEmpty)
        spark.createDataFrame(spark.sparkContext.emptyRDD[Row],
          generationOf(spark, tablePath, version)._2
            .getOrElse(readAsOf(spark, tablePath, version).schema))
      else {
        val dv = dvSetOf(spark, gens)
        readWithDv(spark, admitted.map((_, null: String)), None, dv, l2p)
      }
    base.filter(col(keyCol) >= lit(lo) && col(keyCol) <= lit(hi))
  }

  /** RUNTIME FILTER into a snapshot scan — the dynamic-file-pruning
    * leg Spark's DPP cannot give a manifest-planned union scan: for a
    * selective dim⋈fact join, the DIM side's key domain prunes the
    * FACT FILE SET through the fact's own sidecars BEFORE any data
    * file opens. Two plan-time dim passes (the broadcast-side
    * contract — the dim is small by assumption): (1) one aggregate
    * for [min, max] + exact distinct count, admitted against the
    * STATS sidecar's per-file intervals; (2) when the distinct count
    * is within `maxPointKeys` and a BLOOM sidecar governs, the key
    * set's hashes probe every file's sketch in ONE executor pass
    * (sketch bytes never reach the driver) — scattered keys then
    * prune what interval logic cannot. Returns the fact face over
    * exactly the admitted files (DV-resolved); the caller applies the
    * join — every surviving row still meets the join exactly, the
    * filter only removes files that provably cannot match. Requires
    * at least one governing sidecar (an unindexed fact has nothing to
    * prune with — refused loudly rather than silently scanning
    * everything). */
  def scanJoinPruned(
      spark: SparkSession,
      tablePath: String,
      version: Long,
      keyCol: String,
      dimKeys: DataFrame,
      maxPointKeys: Int = 4096): DataFrame = {
    requireNoColMap(spark, tablePath, "scanJoinPruned")
    require(dimKeys.columns.length == 1,
      s"scanJoinPruned: dimKeys must carry exactly the join key " +
        s"column, got ${dimKeys.columns.mkString(", ")}")
    val (rows, stored) = generationOf(spark, tablePath, version)
    def emptyFace = spark.createDataFrame(
      spark.sparkContext.emptyRDD[Row],
      stored.getOrElse(readAsOf(spark, tablePath, version).schema))
    val admitted = sidecarAdmission(spark, tablePath, version, keyCol,
      dimKeys, maxPointKeys, rows.map(_._1))
      .getOrElse(throw new IllegalArgumentException(
        s"scanJoinPruned: version $version of $tablePath carries no " +
          s"stats or bloom sidecar applicable to '$keyCol' — nothing " +
          "answers file admission; commit via commitClustered/" +
          "commitBloom on that key (or join the plain readAsOf face)"))
    val files = rows.filter(r => admitted.contains(normPath(r._1)))
    if (files.isEmpty) emptyFace
    else {
      val dv = dvSetOf(spark, resolveSidecars(spark, tablePath, version))
      readWithDv(spark, files, stored, dv, Map.empty)
    }
  }

  /** The STATS/BLOOM admission core shared by [[scanJoinPruned]] (the
    * explicit verb) and the SQL catalog scan's
    * `SupportsRuntimeV2Filtering` path: which of `files` can a bounded
    * join-key set NOT rule out? None when no sidecar APPLICABLE TO
    * `keyCol` governs `version` (stats must carry min_/max_ columns
    * for the key; a bloom's recorded key column must BE the key — a
    * probe against a sketch of a different column would falsely prune
    * files containing matching rows); the caller decides whether that
    * refuses loudly (the verb) or scans everything (the transparent
    * SQL path). Some(admitted) is scheme-NORMALIZED paths. Two dim
    * passes at most: one bounds aggregate, one executor-side sketch
    * probe when the distinct count is within `maxPointKeys`. */
  private[graft] def sidecarAdmission(
      spark: SparkSession,
      tablePath: String,
      version: Long,
      keyCol: String,
      dimKeys: DataFrame,
      maxPointKeys: Int,
      files: Seq[String]): Option[Set[String]] = {
    if (colMapAsOf(spark, tablePath, version)
      .exists { case (p, l) => !l.contains(p) }) return None
    val dimCol = dimKeys.columns.head
    val sd = describingSidecarDir(spark, tablePath, "_stats", version)
      .filter(d => statsSidecarKeys(spark, d).contains(keyCol))
    val bd = describingSidecarDir(spark, tablePath, "_bloom", version)
      .filter(d => bloomRecordedKey(spark, d).contains(keyCol))
    if (sd.isEmpty && bd.isEmpty) return None
    val bounds = dimKeys.agg(min(col(dimCol)).as("lo"),
      max(col(dimCol)).as("hi"),
      count_distinct(col(dimCol)).as("n")).collect().head
    if (bounds.isNullAt(0)) return Some(Set.empty) // no dim keys at all
    var admitted: Set[String] = files.map(normPath).toSet
    sd.foreach { d =>
      val hit = spark.read.parquet(d)
        .filter(col(s"max_$keyCol") >= lit(bounds.get(0)) &&
          col(s"min_$keyCol") <= lit(bounds.get(1)))
        .select(col("file")).collect()
        .map(r => normPath(r.getString(0))).toSet
      admitted = admitted.intersect(hit)
    }
    if (bd.isDefined && bounds.getLong(2) <= maxPointKeys &&
      admitted.nonEmpty) {
      val hashes = dimKeys.select(xxhash64(col(dimCol))).distinct()
        .collect().map(_.getLong(0))
      val admits = udf { (bf: Array[Byte]) =>
        val sk = org.apache.spark.util.sketch.BloomFilter
          .readFrom(new java.io.ByteArrayInputStream(bf))
        hashes.exists(sk.mightContainLong)
      }
      val hit = spark.read.parquet(bd.get)
        .filter(admits(col("bf")))
        .select(col("file")).collect()
        .map(r => normPath(r.getString(0))).toSet
      admitted = admitted.intersect(hit)
    }
    Some(admitted)
  }

  /** The key columns whose sidecars can answer runtime file admission
    * for `version` — what the SQL catalog scan declares as
    * `filterAttributes` so Spark's dynamic-pruning rule wires the dim
    * side's runtime filter to it. Empty under a non-trivial column
    * mapping (sidecar columns are physical names) and when no sidecar
    * governs; metadata-scale (footer reads + one 1-row probe). */
  private[graft] def runtimeFilterKeys(
      spark: SparkSession,
      tablePath: String,
      version: Long): Seq[String] = {
    if (colMapAsOf(spark, tablePath, version)
      .exists { case (p, l) => !l.contains(p) }) return Seq.empty
    val statsKeys = describingSidecarDir(spark, tablePath, "_stats",
      version).toSeq.flatMap(d => statsSidecarKeys(spark, d))
    val bloomKey = describingSidecarDir(spark, tablePath, "_bloom",
      version).toSeq.flatMap(d => bloomRecordedKey(spark, d).toSeq)
    (statsKeys ++ bloomKey).distinct
  }

  /** The key columns a stats sidecar dir carries min_/max_ intervals
    * for — memoized per published dir (a footer read otherwise
    * repeated by every statement's loadTable and every admission). */
  private def statsSidecarKeys(
      spark: SparkSession,
      dir: String): Seq[String] =
    memoizedMeta(fs(spark, dir), new Path(dir), "statskeys") {
      val cs = spark.read.parquet(dir).columns
      cs.filter(_.startsWith("min_")).map(_.stripPrefix("min_"))
        .filter(k => cs.contains(s"max_$k")).toSeq
    }

  /** The SQL runtime-filter bridge: the data files of `version` an
    * IN-set of `values` on `keyCol` admits, spelled EXACTLY as the
    * manifest lists them (what the catalog's ParquetTable was built
    * from — the caller rebuilds its file index over the subset
    * verbatim). None when nothing applicable governs or the set is
    * unusably large; never a false prune (both sidecar legs are
    * conservative). */
  def runtimeAdmittedFiles(
      spark: SparkSession,
      tablePath: String,
      version: Long,
      keyCol: String,
      values: Seq[Any],
      valueType: org.apache.spark.sql.types.DataType,
      maxPointKeys: Int = 4096): Option[Seq[String]] = {
    if (values.isEmpty) return Some(Seq.empty)
    if (values.length > 65536) return None // DPP IN-set beyond sanity
    val schema = org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField(keyCol, valueType)))
    val dimKeys = spark.createDataFrame(
      java.util.Arrays.asList(values.map(Row(_)): _*), schema)
    val (rows, _) = generationOf(spark, tablePath, version)
    sidecarAdmission(spark, tablePath, version, keyCol, dimKeys,
      maxPointKeys, rows.map(_._1)).map { admitted =>
      rows.map(_._1).filter(f => admitted.contains(normPath(f)))
    }
  }

  /** [[commit]] plus a per-file BLOOM sidecar on `keyCol` — the
    * point-lookup complement of [[commitClustered]]'s min/max stats,
    * composed with time travel: min/max pruning needs the key
    * CLUSTERED (each file a narrow interval), while a high-cardinality
    * UNCLUSTERED key (event id, user id, url hash) spans the whole
    * domain in every file and interval pruning admits everything.
    * Each commit aggregates one `BloomFilterAggregate` per fresh file
    * (one grouped data pass, map-side combined) into
    * `_bloom/v<version>`; appends carry the parent's sidecar rows
    * forward unchanged — shared files keep their blooms, the Delta
    * bloom-index shape versioned. [[scanPointAsOf]] then answers
    * "key = v AS OF version" reading only the admitted files.
    * [[vacuum]] expires sidecars with their versions; [[purgeKeys]]
    * repoints them (a purged file's bloom stays a conservative
    * superset). Flat commits only — partition the table instead when
    * the lookup key IS the partition key. Returns the version. */
  def commitBloom(
      spark: SparkSession,
      df: DataFrame,
      tablePath: String,
      keyCol: String,
      append: Boolean,
      expectedPerFile: Long = 100000L,
      fpp: Double = 0.01,
      ts: Option[Long] = None): Long = {
    require(expectedPerFile > 0, "expectedPerFile must be positive")
    require(fpp > 0 && fpp < 1, "fpp must be in (0, 1)")
    val observed = latestVersion(spark, tablePath)
    // pre-flight the parent's sidecar BEFORE the commit publishes — a
    // post-publish refusal would leave a committed head with no bloom
    // sidecar and a misleading "commit the parent first" error (the
    // observed head may differ from the post-rebase recorded parent
    // under an active race; the post-commit resolve below remains the
    // authoritative check for that residual window)
    if (append) observed.foreach { h =>
      require(describingSidecarDir(spark, tablePath, "_bloom", h).isDefined,
        s"commitBloom append onto version $h of $tablePath, which no " +
          "bloom sidecar describes — the parent's files would silently " +
          "vanish from point pruning; commit the parent through " +
          "commitBloom first (refused before publishing; the table is " +
          "untouched)")
    }
    val version = commit(spark, df, tablePath, append, ts)
    // fresh files and the RECORDED lineage parent from the generation's
    // own manifest rows (mirror writeKeyStats): the reconciliation may
    // have REBASED the append onto a racer's head, and unioning the
    // pre-claim observed head's sidecar would omit the racer's files —
    // the exact-dir fast path in describingSidecarDir would then skip
    // the coverage check and scanPointAsOf would silently never scan
    // them (dropped rows)
    val gen = manifestFor(spark, tablePath, version)
    val recordedParent = parentOf(gen)
    val parentFiles = recordedParent
      .map(p => manifestFor(spark, tablePath, p).map(_.getString(1)).toSet)
      .getOrElse(Set.empty[String])
    val fresh = gen.map(_.getString(1)).filterNot(parentFiles).toSeq
    // MAPPING-AWARE like [[commitClustered]]: the sketch aggregates
    // over the raw files' physical column and records the PHYSICAL
    // name as its key ([[scanPointAsOf]] translates the probe back)
    val bloomKey = logicalToPhysical(
      colMapAsOf(spark, tablePath, version)).getOrElse(keyCol, keyCol)
    val freshBloom =
      bloomRowsOf(spark, fresh.toIndexedSeq, bloomKey, expectedPerFile,
        fpp)
    val sidecar = recordedParent.filter(_ => append) match {
      case Some(p) =>
        val dir = describingSidecarDir(spark, tablePath, "_bloom", p)
          .getOrElse(throw new IllegalStateException(
            s"commitBloom published version $version of $tablePath, but " +
              s"its recorded parent $p carries no describing bloom " +
              "sidecar (a racer rebased the append onto an unindexed " +
              "head) — rebuild the index with optimizeBloom"))
        // a describing dir may conservatively cover MORE files than the
        // parent generation still lists — inherit rows for the parent's
        // own files only, so the minted sidecar stays exactly the
        // snapshot's file set
        filterSidecarToFiles(spark.read.parquet(dir), parentFiles)
          .unionByName(freshBloom, allowMissingColumns = true)
      case None => freshBloom
    }
    sidecar.coalesce(1).write.mode("errorifexists")
      .parquet(bloomDir(tablePath, version))
    version
  }

  /** Restrict a (file, …) sidecar frame to rows describing `files`,
    * scheme-normalized on both sides (`input_file_name()` URIs vs
    * `listStatus` path strings differ in scheme rendering). The frame
    * is metadata-scale; the normalization runs executor-side so sketch
    * bytes never ship to the driver. */
  private def filterSidecarToFiles(
      df: DataFrame,
      files: Set[String]): DataFrame = {
    val keep = files.map(normPath)
    val inSet = udf((f: String) => keep.contains(new Path(f).toUri.getPath))
    df.filter(inSet(col("file")))
  }

  /** One (file, n_rows, bf, key) sidecar row per listed file — one
    * grouped data pass, map-side combined. `key` records the indexed
    * column so maintenance ([[optimizePreserving]]) can rebuild the
    * index without being told it. */
  private def bloomRowsOf(
      spark: SparkSession,
      files: Seq[String],
      keyCol: String,
      expectedPerFile: Long,
      fpp: Double): DataFrame = {
    import org.apache.spark.sql.GraftSqlShim
    import org.apache.spark.sql.catalyst.expressions.Literal
    import org.apache.spark.sql.catalyst.expressions.aggregate.BloomFilterAggregate
    val bits = math.max(64L, math.ceil(
      expectedPerFile * math.log(1 / fpp) /
        (math.log(2) * math.log(2))).toLong)
    val agg = GraftSqlShim.column(
      new BloomFilterAggregate(
        GraftSqlShim.expression(xxhash64(col(keyCol))),
        Literal(expectedPerFile), Literal(bits)).toAggregateExpression())
    spark.read.parquet(files: _*)
      .groupBy(input_file_name().as("file"))
      .agg(count(lit(1)).as("n_rows"), agg.as("bf"))
      .withColumn("key", lit(keyCol))
  }

  /** [[optimize]] for a BLOOM-indexed table: the small-file rewrite
    * lands as a replace version AND rebuilds the bloom sidecar over
    * the compacted files, so point lookups keep their index across
    * compaction — without this, an OPTIMIZE leaves the new head
    * sidecar-less and [[scanPointAsOf]] refuses (loud, but a
    * maintenance regression). Old versions keep their own sidecars
    * until vacuum. Returns the minted version. */
  /** [[commitClustered]]'s TWO-dimensional sibling: the batch lays out
    * Z-ordered on `(xCol, yCol)` ([[Layout.clusterByZOrder]] — Morton
    * interleave + one range exchange), and the per-file stats sidecar
    * carries min/max for BOTH columns, so each file's statistics cover
    * a compact rectangle and a selective predicate on EITHER dimension
    * — or a 2-D box ([[scanBoxAsOf]]) — prunes most files, where a
    * layout clustered on x alone can only ever prune x.
    * [[scanRangeAsOf]] works as-is on either column (it reads
    * `min_<col>`/`max_<col>` by name). Flat commits only; appends
    * reuse the parent's stats rows like the 1-D verb. */
  def commitZordered(
      spark: SparkSession,
      df: DataFrame,
      tablePath: String,
      xCol: String,
      yCol: String,
      numFiles: Int,
      append: Boolean): Long =
    commitZorderedN(spark, df, tablePath, Seq(xCol, yCol), numFiles,
      append)

  /** [[commitZordered]] over N cluster keys: the batch lays out on the
    * N-dimensional Morton curve ([[Layout.clusterByZOrderN]]) and the
    * stats sidecar carries min/max for EVERY key, so each file's
    * statistics cover a compact N-rectangle — a selective predicate on
    * ANY single key ([[scanRangeAsOf]], which reads `min_<col>`/
    * `max_<col>` by name), or a box over ANY SUBSET of the keys
    * ([[scanBoxAsOfN]]), prunes files where a 1-D clustering serves
    * only its own key. `bits` per key must fit N×bits ≤ 63
    * ([[Layout.zValueN]] — 3 keys at the default 21, 4 at 15); real
    * layout tuning runs 3-4 keys, past which Morton locality decays
    * and a Hilbert option would be the refinement. Flat commits only;
    * appends reuse the parent's stats rows like the 1-D verb. */
  def commitZorderedN(
      spark: SparkSession,
      df: DataFrame,
      tablePath: String,
      keyCols: Seq[String],
      numFiles: Int,
      append: Boolean,
      bits: Int = 21,
      derivedFrom: Option[Long] = None,
      verb: String = "commitZorderedN"): Long = {
    require(numFiles >= 1, "numFiles must be positive")
    require(keyCols.distinct.size == keyCols.size,
      s"commitZorderedN: duplicate cluster keys in $keyCols")
    preflightStatsParent(spark, tablePath, append, "commitZorderedN")
    val version = commit(spark,
      Layout.clusterByZOrderN(df, keyCols, numFiles, bits).drop("zkey"),
      tablePath, append, None, derivedFrom, verb)
    // MAPPING-AWARE like [[commitClustered]]: stats aggregate over the
    // raw files' physical columns ([[scanBoxAsOfN]] translates back)
    val l2p = logicalToPhysical(colMapAsOf(spark, tablePath, version))
    writeKeyStats(spark, tablePath, version,
      keyCols.map(k => l2p.getOrElse(k, k)), append)
    version
  }

  /** [[commitZorderedN]] on the HILBERT curve
    * ([[Layout.clusterByHilbertN]]) — same stats sidecar, same
    * [[scanBoxAsOfN]]/[[scanRangeAsOf]] read path (pruning reads only
    * `min_*`/`max_*` bounds, never the curve), better per-file
    * rectangle compactness at 3+ keys where Morton's bit spreading
    * fattens them (consecutive Hilbert indexes are grid-adjacent —
    * the locality the N-D layout exists for). Flat commits only;
    * appends reuse the recorded lineage parent's stats rows. */
  def commitHilbertN(
      spark: SparkSession,
      df: DataFrame,
      tablePath: String,
      keyCols: Seq[String],
      numFiles: Int,
      append: Boolean,
      bits: Int = 21,
      derivedFrom: Option[Long] = None,
      verb: String = "commitHilbertN"): Long = {
    require(numFiles >= 1, "numFiles must be positive")
    require(keyCols.distinct.size == keyCols.size,
      s"commitHilbertN: duplicate cluster keys in $keyCols")
    preflightStatsParent(spark, tablePath, append, "commitHilbertN")
    val version = commit(spark,
      Layout.clusterByHilbertN(df, keyCols, numFiles, bits).drop("hkey"),
      tablePath, append, None, derivedFrom, verb)
    // MAPPING-AWARE like [[commitClustered]]
    val l2p = logicalToPhysical(colMapAsOf(spark, tablePath, version))
    writeKeyStats(spark, tablePath, version,
      keyCols.map(k => l2p.getOrElse(k, k)), append)
    version
  }

  /** The per-file min/max stats sidecar of a freshly committed
    * generation over `keyCols`, parent rows carried on appends — the
    * shared tail of the clustered/Z-ordered commit verbs. */
  private def writeKeyStats(
      spark: SparkSession,
      tablePath: String,
      version: Long,
      keyCols: Seq[String],
      append: Boolean): Unit = {
    // two single-generation reads answer both lineage questions (fresh
    // files of the generation, recorded parent) — never the history
    val gen = manifestFor(spark, tablePath, version)
    val recordedParent = parentOf(gen)
    val parentFiles = recordedParent
      .map(p => manifestFor(spark, tablePath, p).map(_.getString(1)).toSet)
      .getOrElse(Set.empty[String])
    val fresh = gen.map(_.getString(1)).filterNot(parentFiles).toSeq
    val aggs = count(lit(1)).as("n_rows") +:
      keyCols.flatMap(k =>
        Seq(min(col(k)).as(s"min_$k"), max(col(k)).as(s"max_$k")))
    val freshStats = spark.read.parquet(fresh.toIndexedSeq: _*)
      .groupBy(input_file_name().as("file"))
      .agg(aggs.head, aggs.tail: _*)
    // the recorded lineage parent (not the pre-claim observed head —
    // reconciliation may have rebased the append) carries the stats
    // rows the shared files keep, resolved through the DESCRIBING
    // generation so an append onto a file-preserving metadata head
    // (deleteWhere, constraint change — no exact stats dir of its own)
    // inherits the covering sidecar instead of refusing; a parent no
    // stats generation describes refuses loudly — its files would
    // silently vanish from pruning (callers pre-flight this before the
    // commit publishes; this residual check catches a racer's rebase)
    val parent = recordedParent.filter(_ => append)
    val stats = parent match {
      case Some(p) =>
        val dir = describingSidecarDir(spark, tablePath, "_stats", p)
          .getOrElse(throw new IllegalStateException(
            s"stats append onto version $p of $tablePath, which no " +
              "stats sidecar describes — the parent's files would " +
              "silently vanish from range/box pruning; commit the " +
              "parent through a clustered/Z-ordered verb first"))
        filterSidecarToFiles(spark.read.parquet(dir), parentFiles)
          .unionByName(freshStats)
      case None => freshStats
    }
    stats.coalesce(1).write.mode("errorifexists")
      .parquet(statsDir(tablePath, version))
  }

  /** Keep a stats/bloom-governed table's PRUNING INDEXES LIVE across a
    * file-swapping DML commit ([[updateWhere]], [[mergeInto]]): when a
    * sidecar describes the parent, mint the new version's sidecar as
    * the parent's rows for the surviving files plus freshly computed
    * rows for the fresh files — one data pass over the FRESH files
    * only (the DML's own blast radius), never the table. The sidecar's
    * own metadata names its keys (stats: the `min_<k>` columns; bloom:
    * the recorded `key` column), so no caller has to remember how the
    * table is indexed. Skips silently when nothing describes the
    * parent (the table was never index-governed), when a column
    * mapping governs (the stats verbs are not mapping-aware — scans
    * already refuse loudly), or when a legacy bloom sidecar predates
    * the recorded key; in those cases the new head is simply
    * non-described, exactly as every pre-maintenance DML commit was.
    * Runs BEFORE the publish so a refused commit retracts the staged
    * sidecar with the generation. */
  private def maintainIndexSidecars(
      spark: SparkSession,
      tablePath: String,
      parent: Long,
      version: Long,
      keptFiles: Seq[String],
      freshFiles: Seq[String]): Unit = {
    val mapped = colMapAsOf(spark, tablePath, parent)
      .exists { case (p, l) => !l.contains(p) }
    if (mapped) return
    val kept = keptFiles.toSet
    describingSidecarDir(spark, tablePath, "_stats", parent).foreach { dir =>
      val side = spark.read.parquet(dir)
      val keyCols = side.columns.filter(_.startsWith("min_"))
        .map(_.stripPrefix("min_")).toSeq
      if (keyCols.nonEmpty) {
        val aggs = count(lit(1)).as("n_rows") +:
          keyCols.flatMap(k =>
            Seq(min(col(k)).as(s"min_$k"), max(col(k)).as(s"max_$k")))
        val freshStats =
          if (freshFiles.isEmpty) filterSidecarToFiles(side, Set.empty)
          else spark.read.parquet(freshFiles.toIndexedSeq: _*)
            .groupBy(input_file_name().as("file"))
            .agg(aggs.head, aggs.tail: _*)
        filterSidecarToFiles(side, kept).unionByName(freshStats)
          .coalesce(1).write.mode("errorifexists")
          .parquet(statsDir(tablePath, version))
      }
    }
    describingSidecarDir(spark, tablePath, "_bloom", parent).foreach { dir =>
      val side = spark.read.parquet(dir)
      if (side.columns.contains("key")) {
        side.select(col("key")).limit(1).collect().headOption
          .map(_.getString(0)).foreach { keyCol =>
            val freshBloom =
              if (freshFiles.isEmpty) filterSidecarToFiles(side, Set.empty)
              else bloomRowsOf(spark, freshFiles.toIndexedSeq, keyCol,
                100000L, 0.01)
            filterSidecarToFiles(side, kept)
              .unionByName(freshBloom, allowMissingColumns = true)
              .coalesce(1).write.mode("errorifexists")
              .parquet(bloomDir(tablePath, version))
          }
      }
    }
  }

  /** The shared pre-flight of the stats-sidecar commit verbs: refuse
    * an append onto a head no stats generation describes BEFORE the
    * commit publishes — a post-publish refusal would leave a committed
    * head with no sidecar and a misleading "commit the parent first"
    * error (the observed head may differ from the post-rebase recorded
    * parent under an active race; [[writeKeyStats]]' resolve remains
    * the authoritative check for that residual window). */
  private def preflightStatsParent(
      spark: SparkSession,
      tablePath: String,
      append: Boolean,
      verb: String): Unit =
    if (append) latestVersion(spark, tablePath).foreach { h =>
      require(describingSidecarDir(spark, tablePath, "_stats", h).isDefined,
        s"$verb append onto version $h of $tablePath, which no stats " +
          "sidecar describes — the parent's files would silently " +
          "vanish from range/box pruning; commit the parent through a " +
          "clustered/Z-ordered verb first (refused before publishing; " +
          "the table is untouched)")
    }

  /** 2-D box scan AS OF `version` over a [[commitZordered]] layout:
    * the stats sidecar admits only files whose min/max RECTANGLE
    * intersects the box — metadata-decided on both dimensions at once,
    * the pruning a Z-order layout exists to enable — and the exact
    * predicate clears the interior. */
  def scanBoxAsOf(
      spark: SparkSession,
      tablePath: String,
      version: Long,
      xCol: String, loX: Any, hiX: Any,
      yCol: String, loY: Any, hiY: Any): DataFrame =
    scanBoxAsOfN(spark, tablePath, version,
      Seq((xCol, loX, hiX), (yCol, loY, hiY)))

  /** [[scanBoxAsOf]] over ANY SUBSET of a [[commitZorderedN]] layout's
    * keys: each (col, lo, hi) bound intersects the stats sidecar's
    * per-file rectangle on that dimension — a file prunes when ANY
    * bound misses it — and the exact predicate clears the interior.
    * A single-element bounds list is [[scanRangeAsOf]]; unconstrained
    * keys simply don't appear in `bounds` (the Z-layout's point: every
    * key subset prunes, where clustering on one key serves only
    * itself). */
  def scanBoxAsOfN(
      spark: SparkSession,
      tablePath: String,
      version: Long,
      bounds: Seq[(String, Any, Any)]): DataFrame = {
    require(bounds.nonEmpty, "scanBoxAsOfN: no bounds given")
    // MAPPING-AWARE like [[scanRangeAsOf]]: each bound's sidecar probe
    // resolves logical→physical; the row filter runs on the logical face
    val gens = resolveSidecars(spark, tablePath, version)
    val l2p = logicalToPhysical(colMapOf(spark, gens))
    val sd = describingSidecarDir(spark, tablePath, "_stats", version)
      .getOrElse(throw new IllegalArgumentException(
        s"no stats manifest for version $version of $tablePath — not " +
          "committed via commitZordered, or expired by vacuum"))
    val admit = bounds.map { case (c, lo, hi) =>
      val p = l2p.getOrElse(c, c)
      col(s"max_$p") >= lit(lo) && col(s"min_$p") <= lit(hi)
    }.reduce(_ && _)
    val admitted = spark.read.parquet(sd).filter(admit)
      .select(col("file")).collect().map(_.getString(0)).toIndexedSeq
    val base =
      if (admitted.isEmpty)
        spark.createDataFrame(spark.sparkContext.emptyRDD[Row],
          generationOf(spark, tablePath, version)._2
            .getOrElse(readAsOf(spark, tablePath, version).schema))
      else {
        val dv = dvSetOf(spark, gens)
        readWithDv(spark, admitted.map((_, null: String)), None, dv, l2p)
      }
    base.filter(bounds.map { case (c, lo, hi) =>
      col(c) >= lit(lo) && col(c) <= lit(hi)
    }.reduce(_ && _))
  }

  /** OPTIMIZE that preserves RANGE skipping — [[optimizeBloom]]'s
    * min/max sibling: the latest snapshot rewrites range-clustered on
    * `keyCol` with a fresh `_stats` sidecar, so [[scanRangeAsOf]]
    * survives (and usually improves after) compaction where the plain
    * [[optimize]] would strand it. The rewrite reads through
    * [[readAsOf]], so deletion vectors compact away with it. */
  def optimizeClustered(
      spark: SparkSession,
      tablePath: String,
      keyCol: String,
      numFiles: Int): Long = {
    val latest = latestVersion(spark, tablePath).getOrElse(
      throw new IllegalArgumentException(
        s"optimizeClustered: $tablePath has no committed versions"))
    commitClustered(spark, readAsOf(spark, tablePath, latest),
      tablePath, keyCol, numFiles, append = false,
      derivedFrom = Some(latest), verb = "optimizeClustered")
  }

  def optimizeBloom(
      spark: SparkSession,
      tablePath: String,
      keyCol: String,
      targetBytes: Long,
      expectedPerFile: Long = 100000L,
      fpp: Double = 0.01): Long = {
    val version = optimize(spark, tablePath, targetBytes)
    val files = manifestRows(spark, tablePath, version).map(_._1)
    val bloomKey = logicalToPhysical(
      colMapAsOf(spark, tablePath, version)).getOrElse(keyCol, keyCol)
    bloomRowsOf(spark, files, bloomKey, expectedPerFile, fpp)
      .coalesce(1).write.mode("errorifexists")
      .parquet(bloomDir(tablePath, version))
    version
  }

  /** Bloom-pruned POINT lookup AS OF `version`: the version's bloom
    * sidecar admits only the files that might contain `key = value`
    * (no false negatives by construction), the exact predicate clears
    * the false positives — time travel × bloom skipping multiply, the
    * same composition [[scanRangeAsOf]] gives min/max stats. Loud when
    * the version has no bloom sidecar (not committed via
    * [[commitBloom]], or expired by vacuum). */
  def scanPointAsOf(
      spark: SparkSession,
      tablePath: String,
      version: Long,
      keyCol: String,
      value: Any): DataFrame = {
    // MAPPING-AWARE like [[scanRangeAsOf]]: the bloom sidecar records
    // the key's PHYSICAL name; a renamed key resolves through the
    // mapping, and a key the sidecar does not index refuses loudly
    // (probing a sketch of a different column would falsely prune)
    val gens = resolveSidecars(spark, tablePath, version)
    val l2p = logicalToPhysical(colMapOf(spark, gens))
    val phys = l2p.getOrElse(keyCol, keyCol)
    val bd = describingSidecarDir(spark, tablePath, "_bloom", version)
      .getOrElse(throw new IllegalArgumentException(
        s"no bloom sidecar for version $version of $tablePath — not " +
          "committed via commitBloom, or expired by vacuum"))
    bloomRecordedKey(spark, bd).foreach(recorded =>
      require(recorded == phys,
        s"scanPointAsOf: the bloom sidecar of $tablePath indexes " +
          s"'$recorded', not '$keyCol' — a probe against it would " +
          "falsely prune files; commitBloom on the queried key"))
    val admitted = Skipping.pruneFilesPoint(spark, bd, value)
    val stored = generationOf(spark, tablePath, version)._2
    val base =
      if (admitted.isEmpty) {
        val schema = stored.getOrElse(
          readAsOf(spark, tablePath, version).schema)
        spark.createDataFrame(spark.sparkContext.emptyRDD[Row], schema)
      } else {
        val dv = dvSetOf(spark, gens)
        readWithDv(spark, admitted.map((_, null: String)), stored, dv,
          l2p)
      }
    base.filter(col(keyCol) === lit(value))
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
    // one listing resolves the head, one single-generation read its
    // file set
    val latest = latestVersion(spark, tablePath).getOrElse(
      throw new IllegalArgumentException(
        s"optimize: $tablePath has no committed versions"))
    val files = manifestFiles(spark, tablePath, latest)
    val f = fs(spark, tablePath)
    val bytes = files.map(p => f.getFileStatus(new Path(p)).getLen).sum
    val n = math.max(1L, (bytes + targetBytes - 1) / targetBytes).toInt
    // readAsOf (not the raw file list): a partitioned snapshot's
    // partition column lives in the paths, and a rewrite that read the
    // bare files would silently drop it. The rewrite itself commits a
    // flat layout — OPTIMIZE trades the partition directories for
    // uniform files; re-partitioning afterwards is commitPartitioned's
    // job if wanted.
    commit(spark, readAsOf(spark, tablePath, latest).repartition(n),
      tablePath, append = false, derivedFrom = Some(latest),
      verb = "optimize")
  }

  /** OPTIMIZE that preserves the table's LAYOUT CONTRACT — the verb a
    * maintenance scheduler may run blindly where the plain [[optimize]]
    * silently DEGRADES an indexed table (its flat rewrite leaves the
    * new head sidecar-less, so [[scanRangeAsOf]]/[[scanBoxAsOfN]]
    * refuse and [[scanPartitionAsOf]] loses its fragments): a
    * hive-partitioned head compacts via [[optimizePartitioned]] (one
    * file per partition, fragments survive), a stats-governed head
    * rewrites through [[commitClustered]] / [[commitZorderedN]] on the
    * sidecar's OWN key columns (read off its `min_*` schema — range
    * and box skipping survive compaction), a bloom-governed head
    * rebuilds its point index via [[optimizeBloom]] on the key column
    * the sidecar records (legacy keyless sidecars refuse toward the
    * explicit verb), and a plain head takes the plain [[optimize]].
    * Returns the minted version. */
  def optimizePreserving(
      spark: SparkSession,
      tablePath: String,
      targetBytes: Long): Long = {
    require(targetBytes > 0, "targetBytes must be positive")
    val head = latestVersion(spark, tablePath).getOrElse(
      throw new IllegalArgumentException(
        s"optimizePreserving: $tablePath has no committed versions"))
    val rows = manifestFor(spark, tablePath, head)
    require(rows.nonEmpty,
      s"optimizePreserving: version $head of $tablePath vanished " +
        "between the head resolution and its read — a racing " +
        "retraction; retry")
    val f = fs(spark, tablePath)
    if (rows.forall(r => !r.isNullAt(2))) {
      // fragment key precedes '='; hive escaping applies to VALUES only
      val partCol = rows.head.getString(2).takeWhile(_ != '=')
      return optimizePartitioned(spark, tablePath, partCol)
    }
    // a stats generation GOVERNS the head when it still DESCRIBES
    // every head file ([[describingSidecarDir]]) — true across
    // file-preserving commits (deleteWhere, constraint/gencol changes
    // repoint files verbatim without minting a stats dir of their
    // own), false after a plain replace buried the clustered era. Key
    // names come off the sidecar's min_* schema; the rewrite
    // re-clusters on them and mints a FRESH sidecar at the new head.
    describingSidecarDir(spark, tablePath, "_stats", head).foreach { dir =>
      val keys = spark.read.parquet(dir).schema.fieldNames.toSeq
        .filter(_.startsWith("min_")).map(_.substring(4))
      val bytes = rows
        .map(r => f.getFileStatus(new Path(r.getString(1))).getLen).sum
      val n = math.max(1L, (bytes + targetBytes - 1) / targetBytes).toInt
      return keys match {
        case Seq(one) =>
          commitClustered(spark, readAsOf(spark, tablePath, head),
            tablePath, one, n, append = false,
            derivedFrom = Some(head), verb = "optimizePreserving")
        case many =>
          commitZorderedN(spark, readAsOf(spark, tablePath, head),
            tablePath, many, n, append = false,
            derivedFrom = Some(head), verb = "optimizePreserving")
      }
    }
    // a bloom-governed head rebuilds its point index over the
    // compacted files — the sidecar records its own key column, so the
    // fleet sweep needs no out-of-band knowledge. A legacy sidecar
    // without the key (or with conflicting keys) refuses toward the
    // explicit verb rather than guessing.
    describingSidecarDir(spark, tablePath, "_bloom", head).foreach { dir =>
      val sc = spark.read.parquet(dir)
      val keys =
        if (!sc.columns.contains("key")) Seq.empty
        else sc.select(col("key")).filter(col("key").isNotNull)
          .distinct().collect().map(_.getString(0)).toSeq
      require(keys.size == 1,
        s"optimizePreserving: version $head of $tablePath is " +
          "bloom-governed but the sidecar does not record ONE key " +
          s"column (found ${keys.mkString(", ")}) — run " +
          "optimizeBloom(keyCol) explicitly")
      return optimizeBloom(spark, tablePath, keys.head, targetBytes)
    }
    optimize(spark, tablePath, targetBytes)
  }

  /** Delete data files NO manifest generation references — the
    * "remove orphan files" maintenance job [[vacuum]] cannot cover:
    * vacuum deletes files of the generations it DROPS, but a committer
    * that crashed between writing its data files and publishing its
    * manifest leaves files referenced by nothing, invisible to every
    * reader and every vacuum, silently accumulating storage forever.
    * `olderThanMs` is the safety window (no default on purpose —
    * Iceberg ships days): a RACING committer's just-written files are
    * also unreferenced until its publish lands, so only files whose
    * modification time predates the window are deleted. Returns the
    * number of files removed; table content is untouched by
    * construction (only unreferenced files die). */
  def removeOrphans(
      spark: SparkSession,
      tablePath: String,
      olderThanMs: Long): Long = {
    require(olderThanMs >= 0, "olderThanMs must be non-negative")
    val f = fs(spark, tablePath)
    val dataRoot = new Path(s"$tablePath/$DataDir")
    if (!f.exists(dataRoot)) return 0L
    val referenced = manifest(spark, tablePath)
      .select(col("file")).distinct().collect().map(_.getString(0)).toSet
    val cutoff = System.currentTimeMillis() - olderThanMs
    def walk(p: Path): Seq[org.apache.hadoop.fs.FileStatus] =
      f.listStatus(p).toSeq.flatMap { s =>
        if (s.isDirectory) walk(s.getPath) else Seq(s)
      }
    // a branch root's sweep spares files the PARENT table's manifest
    // references (published by a fast-forward — main's, not orphans),
    // and main's sweep spares files a LIVE branch still references
    // (main's manifest may have expired the forked-from version while
    // the branch keeps reading its files)
    val parentRef = parentTableRefs(spark, tablePath)
    val branchRef = liveBranchRefs(spark, tablePath)
    val orphans = walk(dataRoot).filter { s =>
      !s.getPath.getName.startsWith("_") &&
        !referenced.contains(s.getPath.toString) &&
        !parentRef.contains(normPath(s.getPath.toString)) &&
        !branchRef.contains(normPath(s.getPath.toString)) &&
        s.getModificationTime <= cutoff
    }
    orphans.foreach(s => f.delete(s.getPath, false))
    // a crashed commitEqUpsert's sidecar dir (version claimed, publish
    // never landed) is orphan metadata too: it never governs (the live
    // filter ignores it) but it accumulates — same safety window
    val staleEq =
      if (!f.exists(new Path(eqRoot(tablePath)))) Seq.empty
      else {
        val live = listGenerations(spark, tablePath).toSet
        sidecarFamilyListed(f, eqRoot(tablePath))
          .filterNot(d => live.contains(d._1))
          .map(d => new Path(d._2))
          .filter(p => f.getFileStatus(p).getModificationTime <= cutoff)
      }
    staleEq.foreach(p => f.delete(p, true))
    (orphans.length + staleEq.length).toLong
  }

  /** [[optimize]] for a HIVE-PARTITIONED snapshot table, preserving
    * the layout the flat rewrite would destroy: after many append
    * commits each partition directory accumulates one file set per
    * commit (the classic small-file problem — an incremental ANN
    * store's cells, a by-date event table's days), and this rewrites
    * the LATEST snapshot as one compact file per partition value while
    * the manifest keeps carrying partition fragments — so
    * [[scanPartitionAsOf]] pruning survives the compaction, which is
    * the point of compacting a partitioned table. Committed as a
    * REPLACE version: readers of older versions keep their immutable
    * files until [[vacuum]]. The `repartition(partCol)` shuffle routes
    * every partition's rows to one task, so each directory emits
    * exactly one file; at petabyte partitions a byte-targeted variant
    * (repartitionByRange within partitions) is the refinement, same
    * commit path. */
  def optimizePartitioned(
      spark: SparkSession,
      tablePath: String,
      partCol: String): Long = {
    val latest = latestVersion(spark, tablePath).getOrElse(
      throw new IllegalArgumentException(
        s"optimizePartitioned: $tablePath has no committed versions"))
    require(manifestRows(spark, tablePath, latest).forall(_._2 != null),
      s"optimizePartitioned needs a partitioned table (commitPartitioned); " +
        s"version $latest of $tablePath carries flat files")
    commitPartitioned(spark,
      readAsOf(spark, tablePath, latest).repartition(col(partCol)),
      tablePath, partCol, append = false,
      derivedFrom = Some(latest), verb = "optimizePartitioned")
  }

  /** ROLLBACK: make `toVersion`'s content the table's new head by
    * publishing a fresh version whose manifest rows ARE `toVersion`'s —
    * pointers only, partition fragments, schema, and row counts
    * included. Strictly METADATA-ONLY: no data file is written, read,
    * or deleted, so reverting a bad terabyte-scale commit costs one
    * kilobyte-scale manifest generation (the Iceberg
    * `rollback_to_snapshot` shape). History stays intact — the bad
    * version remains readable AS OF until [[vacuum]] expires it, and
    * because the rolled-back-to files are referenced by the NEW head,
    * a subsequent vacuum keeps them while reclaiming the bad commit's
    * files. Rolling back to a vacuumed (or never-committed) version is
    * refused loudly. Returns the minted version. */
  def rollback(
      spark: SparkSession,
      tablePath: String,
      toVersion: Long,
      ts: Option[Long] = None): Long = {
    val observed = latestVersion(spark, tablePath).getOrElse(
      throw new IllegalArgumentException(
        s"rollback: $tablePath has no committed versions"))
    val gen = manifestFor(spark, tablePath, toVersion)
    require(gen.nonEmpty,
      s"rollback: snapshot version $toVersion of $tablePath is not in " +
        "the manifest (never committed, or expired by vacuum)")
    val rows = fileRowsOf(gen)
    val schemaJson = schemaJsonOf(gen).orNull
    val version = claimVersion(spark, tablePath, observed + 1L)
    // a rollback RESTORES content: re-materialize the TARGET's
    // governing DV set (possibly empty) at the new version, masking
    // any deletes committed in between — without this, resolveDvDir
    // would hand the restored snapshot a later delete's entries and
    // the rollback would silently keep them deleted
    if (fs(spark, tablePath).exists(new Path(dvRoot(tablePath)))) {
      val restored = dvSet(spark, tablePath, toVersion).getOrElse(
        spark.createDataFrame(spark.sparkContext.emptyRDD[Row], dvSchema))
      writeDvSet(spark, tablePath, version, restored)
    }
    // same restore rule for the CHECK-constraint sidecar: the rolled-
    // back head is governed by the TARGET's invariants, not by
    // constraint changes committed after it
    if (fs(spark, tablePath).exists(new Path(constraintsRoot(tablePath))))
      writeConstraints(spark, tablePath, version,
        constraintsAsOf(spark, tablePath, toVersion))
    // and for the column mapping: the restored head reads and writes
    // under the TARGET's names, masking later renames/drops
    if (fs(spark, tablePath).exists(new Path(colMapRoot(tablePath))))
      writeColMap(spark, tablePath, version,
        colMapAsOf(spark, tablePath, toVersion))
    // and for generated columns
    if (fs(spark, tablePath).exists(new Path(genColsRoot(tablePath))))
      writeGenCols(spark, tablePath, version,
        generatedColumnsAsOf(spark, tablePath, toVersion))
    publishDerived(spark, tablePath, version, rows, schemaJson, ts,
      observed, "rollback")
  }

  /** ZERO-COPY shallow clone: fork `srcTable`'s snapshot `version` as
    * version 0 of the (empty) `dstTable` — the new table's first
    * manifest generation IS pointer rows to the source's files
    * (partition fragments, schema, and row counts carried; the commit
    * timeline starts fresh), so forking a 100-TB table costs one
    * kilobyte-scale manifest write and zero data movement (Delta's
    * SHALLOW CLONE — the test-against-prod-data and experiment-branch
    * verb). The fork then diverges freely: its own commits, merges and
    * purges write files under its OWN root, while destructive verbs
    * ([[vacuum]], [[purgeKeys]]) recognize the borrowed files as
    * EXTERNAL ([[ownsFile]]) and only ever drop them from the clone's
    * manifest — deleting them is the source's right, never the
    * clone's (spec-pinned). The standing caveat is Delta's too: the
    * SOURCE's vacuum does not know about clones, so retention policy
    * must outlive the forks. Clustered stats and bloom sidecars do not transfer
    * ([[scanRangeAsOf]]/[[scanPointAsOf]] on the clone refuse loudly); a clone of a
    * clone is just another clone. Returns the clone's version (0). */
  def cloneTable(
      spark: SparkSession,
      srcTable: String,
      version: Long,
      dstTable: String): Long = {
    require(latestVersion(spark, dstTable).isEmpty,
      s"cloneTable: destination $dstTable already has commits")
    val gen = manifestFor(spark, srcTable, version)
    require(gen.nonEmpty,
      s"cloneTable: snapshot version $version of $srcTable is not in " +
        "the manifest (never committed, or expired by vacuum)")
    val rows = fileRowsOf(gen)
    val schemaJson = schemaJsonOf(gen).orNull
    val v = claimVersion(spark, dstTable, 0L)
    // the source's governing DV set transfers with the pointers —
    // a clone of a deleted-from snapshot must not resurrect its rows
    dvSet(spark, srcTable, version).foreach(d =>
      writeDvSet(spark, dstTable, v, d))
    // and so do the governing CHECK constraints — the fork starts life
    // under the same invariants it was cut from
    val srcConstraints = constraintsAsOf(spark, srcTable, version)
    if (srcConstraints.nonEmpty)
      writeConstraints(spark, dstTable, v, srcConstraints)
    val srcColMap = colMapAsOf(spark, srcTable, version)
    if (srcColMap.nonEmpty)
      writeColMap(spark, dstTable, v, srcColMap)
    val srcGen = generatedColumnsAsOf(spark, srcTable, version)
    if (srcGen.nonEmpty)
      writeGenCols(spark, dstTable, v, srcGen)
    publishRows(spark, dstTable, v, rows, schemaJson, None, None)
  }

  // ------------------------------------------------------------------
  // BRANCHES — writable isolated lineages (the Iceberg branch / WAP
  // shape, built on the zero-copy clone)
  // ------------------------------------------------------------------

  /** The branch's own table root — a full snapshot table: every verb
    * (clustered commits, deletes, constraints, MERGE, time travel
    * WITHIN the branch) works on it unchanged. */
  def branchPath(tablePath: String, name: String): String =
    s"$tablePath/_branches/$name"

  private def forkMarker(tablePath: String, name: String): Path =
    new Path(s"$tablePath/_branches/$name.fork")

  private def readFork(
      spark: SparkSession,
      tablePath: String,
      name: String): Option[Long] = {
    val f = fs(spark, tablePath)
    val p = forkMarker(tablePath, name)
    if (!f.exists(p)) None
    else {
      val in = f.open(p)
      try {
        val buf = new Array[Byte](32)
        val n = in.read(buf)
        Some(new String(buf, 0, math.max(n, 0), "UTF-8").trim.toLong)
      } finally in.close()
    }
  }

  private def writeFork(
      spark: SparkSession,
      tablePath: String,
      name: String,
      version: Long): Unit = {
    val f = fs(spark, tablePath)
    val out = f.create(forkMarker(tablePath, name), true)
    try out.write(version.toString.getBytes("UTF-8"))
    finally out.close()
  }

  /** Fork an ISOLATED WRITABLE lineage off `fromVersion` (default the
    * head): a zero-copy clone under the table's own `_branches/<name>`
    * plus a fork marker recording the main version it left from. Main
    * readers NEVER see branch commits (the branch has its own manifest
    * space); the branch is a full snapshot table — write to it with
    * any verb against [[branchPath]], audit it with [[readBranch]],
    * and publish it back atomically with [[fastForward]]. This is
    * write-audit-publish at LINEAGE scope: stage any number of
    * commits, not one. While a branch is open, main's [[vacuum]] and
    * [[removeOrphans]] spare every file the branch's manifest still
    * references (the [[liveBranchRefs]] guard) — dropping the branch
    * releases them to the next sweep. Returns the branch's own
    * version 0. */
  def createBranch(
      spark: SparkSession,
      tablePath: String,
      name: String,
      fromVersion: Option[Long] = None): Long = {
    requireTagName(name)
    require(readFork(spark, tablePath, name).isEmpty,
      s"branch '$name' already exists on $tablePath")
    val from = fromVersion.orElse(latestVersion(spark, tablePath))
      .getOrElse(throw new IllegalArgumentException(
        s"createBranch: $tablePath has no committed versions"))
    val root = branchPath(tablePath, name)
    init(spark, root)
    val v = cloneTable(spark, tablePath, from, root)
    writeFork(spark, tablePath, name, from)
    v
  }

  /** All (name, forkVersion, branchHead) branches of the table. */
  def branches(
      spark: SparkSession,
      tablePath: String): Seq[(String, Long, Long)] = {
    val f = fs(spark, tablePath)
    val dir = new Path(s"$tablePath/_branches")
    if (!f.exists(dir)) Seq.empty
    else f.listStatus(dir).filter(s =>
      s.isFile && s.getPath.getName.endsWith(".fork")).toSeq.map { st =>
      val name = st.getPath.getName.stripSuffix(".fork")
      (name,
        readFork(spark, tablePath, name).get,
        latestVersion(spark, branchPath(tablePath, name)).getOrElse(-1L))
    }.sortBy(_._1)
  }

  /** The branch's current face. */
  def readBranch(
      spark: SparkSession,
      tablePath: String,
      name: String): DataFrame = {
    val root = branchPath(tablePath, name)
    readAsOf(spark, root, latestVersion(spark, root).getOrElse(
      throw new IllegalArgumentException(
        s"no branch '$name' on $tablePath — known: " +
          branches(spark, tablePath).map(_._1).mkString(", "))))
  }

  /** Publish the branch's head onto main as ONE metadata-only commit —
    * the branch's manifest rows repoint verbatim (files stay where
    * they are, under the branch's `data/`; main owns everything under
    * its root, so its vacuum lifecycle covers them) and the branch's
    * governing DV/constraint/mapping/generated-column sets transfer
    * exactly as [[rollback]] restores a target's (the branch face IS
    * the published face, deletes and invariants included). REFUSES
    * when main's head moved past the fork — a fast-forward is only
    * fast-forward onto the lineage it left; recreate the branch to
    * rebase (the same retry contract every derived commit has). The
    * fork marker advances to the published version, so the branch
    * remains usable for the next audit cycle. Stats/bloom sidecars do
    * not transfer (the clone contract) — re-cluster after merging if
    * the table is index-governed. Returns the minted main version. */
  def fastForward(
      spark: SparkSession,
      tablePath: String,
      name: String,
      ts: Option[Long] = None): Long = {
    val fork = readFork(spark, tablePath, name).getOrElse(
      throw new IllegalArgumentException(
        s"no branch '$name' on $tablePath — known: " +
          branches(spark, tablePath).map(_._1).mkString(", ")))
    val observed = latestVersion(spark, tablePath)
    require(observed.contains(fork),
      s"fastForward('$name'): $tablePath's head is " +
        s"${observed.fold("<empty>")(_.toString)} but the branch forked " +
        s"from $fork — main moved; recreate the branch from the new " +
        "head to rebase its changes")
    val root = branchPath(tablePath, name)
    val bHead = latestVersion(spark, root).getOrElse(
      throw new IllegalArgumentException(
        s"fastForward('$name'): the branch has no commits"))
    val gen = manifestFor(spark, root, bHead)
    require(gen.nonEmpty,
      s"fastForward('$name'): branch head $bHead vanished — a racing " +
        "retraction; retry")
    val rows = fileRowsOf(gen)
    val schemaJson = schemaJsonOf(gen).orNull
    val version = claimVersion(spark, tablePath, fork + 1L)
    // the branch's governing sidecar sets become main's at the
    // published version (the rollback restore pattern: the face being
    // published carries its own deletes and invariants)
    dvSet(spark, root, bHead).foreach(d =>
      writeDvSet(spark, tablePath, version, d))
    val bCons = constraintsAsOf(spark, root, bHead)
    if (bCons.nonEmpty || fs(spark, tablePath).exists(
      new Path(constraintsRoot(tablePath))))
      writeConstraints(spark, tablePath, version, bCons)
    val bMap = colMapAsOf(spark, root, bHead)
    if (bMap.nonEmpty || fs(spark, tablePath).exists(
      new Path(colMapRoot(tablePath))))
      writeColMap(spark, tablePath, version, bMap)
    val bGen = generatedColumnsAsOf(spark, root, bHead)
    if (bGen.nonEmpty || fs(spark, tablePath).exists(
      new Path(genColsRoot(tablePath))))
      writeGenCols(spark, tablePath, version, bGen)
    val published = publishDerived(spark, tablePath, version, rows,
      schemaJson, ts, fork, "fastForward")
    writeFork(spark, tablePath, name, published)
    published
  }

  /** Drop a branch: its manifest space and its OWN data files go; a
    * branch whose files a retained MAIN generation references (it was
    * fast-forwarded) refuses toward [[optimize]]-then-vacuum first —
    * deleting them would corrupt main's history. */
  def dropBranch(
      spark: SparkSession,
      tablePath: String,
      name: String): Boolean = {
    requireTagName(name)
    val f = fs(spark, tablePath)
    val marker = forkMarker(tablePath, name)
    if (!f.exists(marker)) return false
    val root = branchPath(tablePath, name)
    val prefix = normPath(root) + "/"
    val borrowed = manifest(spark, tablePath)
      .select(col("file")).distinct().collect().map(_.getString(0))
      .exists(file => normPath(file).startsWith(prefix))
    require(!borrowed,
      s"dropBranch('$name'): a retained main generation references " +
        "files under the branch root (it was fast-forwarded) — " +
        "optimize main (rewriting them under main's own data/) and " +
        "vacuum the referencing versions first")
    f.delete(new Path(root), true)
    f.delete(marker, false)
    true
  }

  /** COUNT(*) AS OF `version`, answered from the manifest's per-file
    * footer counts alone — zero data files opened, the aggregate
    * pushdown every lakehouse metadata layer exists to enable (a
    * 100-TB table's row count is a sum over kilobytes of manifest).
    * Loud when the version is unknown or its generation predates
    * row-count manifests (recommit or rely on a scan). */
  def countAsOf(
      spark: SparkSession,
      tablePath: String,
      version: Long): Long = {
    val rows = manifestRows(spark, tablePath, version)
    require(rows.nonEmpty,
      s"snapshot version $version of $tablePath is not in the manifest " +
        "(never committed, or expired by vacuum)")
    require(rows.forall(_._3.isDefined),
      s"snapshot version $version of $tablePath predates row-count " +
        "manifests — its generation carries no footer counts")
    val base = rows.map(_._3.get).sum
    // deletion vectors subtract from the footer counts; entries
    // referencing files outside this generation (replaced or compacted
    // away) are dead and must not be counted. Still zero DATA files
    // opened — the DV sidecar is metadata-scale (bounded by deletes).
    dvSetOf(spark, resolveSidecars(spark, tablePath, version)).fold(base) {
      dv =>
        val files = spark.createDataFrame(rows.map(r => Tuple1(r._1)))
          .toDF("file")
        base - dv.join(files, Seq("file"), "left_semi").count()
    }
  }

  /** Metadata-only statistics frame: one row per (version, part) with
    * its file and row counts — `part` null for flat commits. Every
    * number derives from the manifest (footer counts captured at
    * commit), so the whole history of a 100-TB table profiles without
    * opening one data file; the row-count columns are null-free by
    * construction for tables written by this layer (guarded loudly
    * for legacy generations). The frame is ordinary lazy SQL over the
    * metadata-scale manifest — filter/join it like any table
    * (Iceberg's `.snapshots`/`.files` metadata-table shape). */
  def tableStats(spark: SparkSession, tablePath: String): DataFrame = {
    val m = manifest(spark, tablePath)
    require(m.filter(col("rows").isNull).limit(1).collect().isEmpty,
      s"$tablePath carries generations without footer counts — " +
        "tableStats would undercount; recommit those versions")
    // footer counts are PHYSICAL; live deletion vectors would make
    // them silently overcount — refuse toward the DV-aware countAsOf
    require(!liveDvEntriesExist(spark, tablePath,
      m.select(col("file")).collect().map(_.getString(0)).toSeq),
      s"$tablePath carries live deletion vectors — tableStats' footer " +
        "counts would overcount deleted rows; use countAsOf per " +
        "version, and dvStats for the deletion pressure gauge")
    m.groupBy(col("version"), col("part"))
      .agg(count(lit(1)).as("n_files"), sum(col("rows")).as("n_rows"))
  }

  /** Version-level history frame: one row per generation with its
    * logical commit stamp, file count, and row count — the Iceberg
    * `.history`/`.snapshots` metadata-table shape, derived entirely
    * from the manifest ([[tableStats]] is the per-partition
    * refinement). Ordinary lazy SQL over metadata-scale rows; loud
    * when any generation predates row-count manifests, exactly as
    * [[tableStats]] refuses rather than undercounting. `commit_ts` is
    * null for unstamped generations — a report column, unlike
    * [[versionAt]] which refuses mixed timelines. */
  def tableHistory(spark: SparkSession, tablePath: String): DataFrame = {
    val m = manifest(spark, tablePath)
    require(m.filter(col("rows").isNull).limit(1).collect().isEmpty,
      s"$tablePath carries generations without footer counts — " +
        "tableHistory would undercount; recommit those versions")
    require(!liveDvEntriesExist(spark, tablePath,
      m.select(col("file")).collect().map(_.getString(0)).toSeq),
      s"$tablePath carries live deletion vectors — tableHistory's " +
        "footer counts would overcount deleted rows; use countAsOf")
    m.groupBy(col("version"))
      .agg(max(col("commit_ts")).as("commit_ts"),
        count(lit(1)).as("n_files"),
        sum(col("rows")).as("n_rows"))
  }

  /** Deletion-vector PRESSURE on the head version — the growth trigger
    * for the merge-on-read half of the delete design: each
    * [[deleteWhere]] grows the governing (file, row_index) set, every
    * read pays the anti-join against it, and nothing shrinks it until
    * a compacting [[optimize]] rewrites through the DV-applied read
    * and commits fresh DV-free files. One row, all from metadata (the
    * manifest's footer counts + the DV sidecar — zero data files
    * opened): `physical_rows` (footer sum of the head), `dv_rows`
    * (LIVE governing entries — entries on files the head no longer
    * references are dead and don't count, so an OPTIMIZE clears the
    * gauge by construction), `dv_fraction`, and `compaction_due` once
    * the fraction crosses `compactAt` (default 10%, the
    * Delta-ish maintenance heuristic) — the signal a table-maintenance
    * scheduler polls to know WHICH tables to OPTIMIZE next, instead of
    * discovering the anti-join tax in query latency. Refuses on
    * generations predating row-count manifests, like [[tableStats]]. */
  def dvStats(
      spark: SparkSession,
      tablePath: String,
      compactAt: Double = 0.1): DataFrame = {
    require(compactAt > 0 && compactAt <= 1,
      s"compactAt must be in (0, 1], got $compactAt")
    val head = latestVersion(spark, tablePath).getOrElse(
      throw new IllegalArgumentException(
        s"dvStats: $tablePath has no committed versions"))
    val rows = manifestRows(spark, tablePath, head)
    require(rows.forall(_._3.isDefined),
      s"version $head of $tablePath predates row-count manifests — " +
        "dvStats needs footer counts; recommit the version")
    val physical = rows.map(_._3.get).sum
    val dvRows = dvSetOf(spark, resolveSidecars(spark, tablePath, head))
      .map { dv =>
        val files = spark.createDataFrame(rows.map(r => Tuple1(r._1)))
          .toDF("file")
        dv.join(files, Seq("file"), "left_semi").count()
      }.getOrElse(0L)
    val frac =
      if (physical == 0L) 0.0 else dvRows.toDouble / physical.toDouble
    spark.createDataFrame(Seq(
      (head, physical, dvRows, frac, frac >= compactAt)))
      .toDF("version", "physical_rows", "dv_rows", "dv_fraction",
        "compaction_due")
  }

  /** The equality-delete PRESSURE GAUGE — [[dvStats]]' merge-on-read
    * sibling, closing the same growth-trigger loop for MOR lineages:
    * live tombstone rows vs the head's physical rows, all
    * metadata-scale (each keys sidecar is a coalesced single file the
    * size of its sync batch; the physical count comes off the
    * manifest's footer counts — no data file opens). Without a fold,
    * [[readMorAsOf]]'s broadcast anti-join grows with every sync;
    * `fold_due` is the fleet scheduler's signal to run
    * [[foldEqDeletes]] — the eq analog of `dv_fraction` →
    * `optimize`. A table with no live eq sidecars gauges zero. */
  def eqStats(
      spark: SparkSession,
      tablePath: String,
      foldAt: Double = 0.1): DataFrame = {
    require(foldAt > 0 && foldAt <= 1,
      s"foldAt must be in (0, 1], got $foldAt")
    val head = latestVersion(spark, tablePath).getOrElse(
      throw new IllegalArgumentException(
        s"eqStats: $tablePath has no committed versions"))
    val eqDirs = liveEqDirs(spark, tablePath, head)
    val tombRows = eqDirs.map { case (_, dir) =>
      spark.read.parquet(s"$dir/keys").count()
    }.sum
    val rows = manifestRows(spark, tablePath, head)
    require(rows.forall(_._3.isDefined),
      s"version $head of $tablePath predates row-count manifests — " +
        "eqStats needs footer counts; recommit the version")
    val physical = rows.map(_._3.get).sum
    val frac =
      if (physical == 0L) { if (tombRows > 0L) 1.0 else 0.0 }
      else tombRows.toDouble / physical.toDouble
    spark.createDataFrame(Seq(
      (head, physical, tombRows, eqDirs.length.toLong, frac,
        frac >= foldAt)))
      .toDF("version", "physical_rows", "eq_tombstones", "eq_sidecars",
        "eq_fraction", "fold_due")
  }

  /** The live tombstone sidecars' recorded key columns (the newest
    * live sidecar's keys-parquet column names — one footer read), or
    * None when nothing governs: what lets a fleet sweep fold a MOR
    * table it never created. */
  def eqLiveKeyCols(
      spark: SparkSession,
      tablePath: String): Option[Seq[String]] =
    latestVersion(spark, tablePath).flatMap(h =>
      liveEqDirs(spark, tablePath, h).lastOption.map { case (_, dir) =>
        eqSidecarKeyCols(spark, dir)
      })

  /** One tombstone sidecar's recorded key columns (its keys-parquet
    * column names) — memoized per published dir: a footer read
    * otherwise repeated by every governed SQL statement's
    * substitution. */
  private def eqSidecarKeyCols(
      spark: SparkSession,
      dir: String): Seq[String] =
    memoizedMeta(fs(spark, dir), new Path(s"$dir/keys"), "eqkeycols") {
      spark.read.parquet(s"$dir/keys").columns.toSeq
    }

  /** [[foldEqDeletes]] with the key columns derived from the newest
    * live sidecar itself — the maintenance-sweep entry point (the
    * sweep knows the table, not its CDC pipeline's key choice).
    * Refuses when nothing governs. */
  def foldEqDeletes(spark: SparkSession, tablePath: String): Long =
    foldEqDeletes(spark, tablePath,
      eqLiveKeyCols(spark, tablePath).getOrElse(
        throw new IllegalArgumentException(
          s"foldEqDeletes: $tablePath carries no live equality-delete " +
            "sidecars — nothing to fold")))

  /** Resolve AS OF TIMESTAMP to a version: the LATEST version (in
    * commit order, the Iceberg rule) whose `commit_ts` is at or before
    * `ts`. Timestamps are the caller's LOGICAL clock — an event-time
    * watermark supplied at commit, never wall time — so resolution
    * replays deterministically on any engine. Loud in every murky
    * case: an empty table, a `ts` predating the first commit, and any
    * generation missing a timestamp (a mixed table would silently drop
    * untimestamped commits out of the timeline — refuse instead;
    * commit verbs take `ts` optionally, a timestamped table should
    * pass it on every commit). Driver-side over the metadata-scale
    * manifest. */
  def versionAt(
      spark: SparkSession,
      tablePath: String,
      ts: Long): Long = {
    val gens = manifestMeta(spark, tablePath)
      .map(r => (r.getLong(0),
        if (r.isNullAt(1)) None else Some(r.getLong(1))))
    require(gens.nonEmpty, s"$tablePath has no committed versions")
    val missing = gens.filter(_._2.isEmpty).map(_._1)
    require(missing.isEmpty,
      s"versions ${missing.sorted.mkString(",")} of $tablePath carry no " +
        "commit_ts — AS OF TIMESTAMP needs every generation timestamped")
    val admitted = gens.filter(_._2.get <= ts)
    require(admitted.nonEmpty,
      s"no snapshot of $tablePath at or before ts=$ts (earliest " +
        s"commit_ts ${gens.map(_._2.get).min})")
    admitted.map(_._1).max
  }

  /** [[readAsOf]] with the version resolved by [[versionAt]] — the
    * `SELECT … FOR TIMESTAMP AS OF` surface. */
  def readAsOfTimestamp(
      spark: SparkSession,
      tablePath: String,
      ts: Long): DataFrame =
    readAsOf(spark, tablePath, versionAt(spark, tablePath, ts))

  /** Incremental changelog read: the rows ADDED between `fromVersion`
    * (exclusive) and `toVersion` (inclusive), planned as the manifest
    * file-set difference — ONLY the new files enter the scan, so a
    * consumer that checkpoints the last version it processed pays
    * O(delta) per poll on a 100-TB table (the Iceberg incremental-scan
    * / Delta streaming-source shape, expressed as a batch primitive:
    * poll `latestVersion`, read the delta, advance the checkpoint).
    *
    * Defined only for APPEND lineage over the interval: every file of
    * `fromVersion` must still be referenced by `toVersion`. A replace,
    * MERGE, or OPTIMIZE in between rewrote history — "what was added"
    * is ill-defined at file granularity — and is refused loudly; use
    * [[diff]] for the row-level audit there. `fromVersion ==
    * toVersion` is the empty delta (with the snapshot's schema).
    *
    * DV-AWARE: the destination's governing deletion vectors apply to
    * the fresh rows, so a row appended and then DV-deleted INSIDE the
    * interval is never replayed as live (a fresh file cannot carry a
    * pre-interval DV entry — the file did not exist yet — so filtering
    * the fresh scan by `toVersion`'s set is exactly the interval's
    * deletes on it). Deletes that hit PRE-EXISTING rows stay invisible
    * here by design: this is the inserts-only feed; a consumer that
    * must see retractions polls [[readChangesBetween]], the `'+'/'-'`
    * CDC feed over the same checkpoint discipline. */
  def readAppendsBetween(
      spark: SparkSession,
      tablePath: String,
      fromVersion: Long,
      toVersion: Long): DataFrame = {
    require(fromVersion <= toVersion,
      s"readAppendsBetween: fromVersion $fromVersion > toVersion $toVersion")
    val (from, to, stored) =
      generationPair(spark, tablePath, fromVersion, toVersion,
        "readAppendsBetween")
    val toFiles = to.map(_._1).toSet
    val dropped = from.filterNot(r => toFiles.contains(r._1))
    require(dropped.isEmpty,
      s"readAppendsBetween: versions $fromVersion..$toVersion of " +
        s"$tablePath are not append lineage — ${dropped.size} file(s) of " +
        s"v$fromVersion were rewritten in between (replace/MERGE/" +
        "OPTIMIZE); use diff() for the row-level audit")
    val fromFiles = from.map(_._1).toSet
    val fresh = to.filterNot(r => fromFiles.contains(r._1))
    if (fresh.isEmpty) {
      val schema = stored.getOrElse(
        readAsOf(spark, tablePath, toVersion).schema)
      spark.createDataFrame(spark.sparkContext.emptyRDD[Row], schema)
    } else {
      val gens = resolveSidecars(spark, tablePath, toVersion)
      val dv = dvSetOf(spark, gens)
      val l2p = logicalToPhysical(colMapOf(spark, gens))
      readWithDv(spark, fresh, stored, dv, l2p)
    }
  }

  /** (file, part) rows of TWO generations plus the destination's
    * stored schema, from a single eager read of exactly those TWO
    * generations' manifest files — the interval verbs' resolution:
    * O(files of from + files of to) rows collected, never the history.
    * Loud per missing version, naming the verb's contract. */
  private def generationPair(
      spark: SparkSession,
      tablePath: String,
      fromVersion: Long,
      toVersion: Long,
      verb: String)
      : (Seq[(String, String)], Seq[(String, String)],
        Option[org.apache.spark.sql.types.StructType]) = {
    manifestReads.incrementAndGet()
    recoverManifestSwap(spark, tablePath)
    val f = fs(spark, tablePath)
    val paths = Seq(fromVersion, toVersion).distinct
      .map(genFilePath(tablePath, _))
      .filter(p => f.exists(new Path(p)))
    val rows =
      if (paths.isEmpty) Array.empty[Row]
      else try {
        manifestFilesOpened.addAndGet(paths.length.toLong)
        val r = normalizeManifest(spark.read
          .option("mergeSchema", "true").parquet(paths: _*)).collect()
        manifestRowsCollected.addAndGet(r.length.toLong)
        r
      } catch {
        // an endpoint vanished mid-read (racing retraction/vacuum) —
        // same loud answer as a missing generation below
        case e: Throwable if isFileGone(e) => Array.empty[Row]
      }
    def of(v: Long): Seq[(String, String)] =
      rows.filter(_.getLong(0) == v).map(r => (r.getString(1),
        if (r.isNullAt(2)) null else r.getString(2))).toSeq
    val (from, to) = (of(fromVersion), of(toVersion))
    require(from.nonEmpty,
      s"snapshot version $fromVersion of $tablePath is not in the " +
        "manifest (never committed, or expired by vacuum)")
    require(to.nonEmpty,
      s"snapshot version $toVersion of $tablePath is not in the " +
        "manifest (never committed, or expired by vacuum)")
    val stored = rows.filter(r => r.getLong(0) == toVersion &&
      !r.isNullAt(3)).headOption.map(r =>
      org.apache.spark.sql.types.DataType.fromJson(r.getString(3))
        .asInstanceOf[org.apache.spark.sql.types.StructType])
    (from, to, stored)
  }

  /** Row-level CDC feed between two versions, O(delta) — the
    * completion of [[readAppendsBetween]] for lineages that also
    * DELETE through deletion vectors: one frame of the interval's net
    * row changes tagged `change` `'+'`/`'-'`. Adds are the fresh
    * files' rows surviving the destination's DV (a row added and
    * deleted inside the interval nets to nothing); deletes are the DV
    * entries the interval ADDED, materialized by scanning ONLY the
    * files that contain them (a metadata-scale semi-join on the scan's
    * `_metadata` identity); a rollback that RESURRECTS rows (its
    * re-materialized DV set shrinks) emits them back as `'+'`. Where
    * [[diff]] scans both faces — O(table) — this scans the delta's
    * files only, which is what a checkpointing consumer pays per poll
    * on a 100-TB table. Same lineage contract as
    * [[readAppendsBetween]]: a replace/OPTIMIZE in the interval
    * refuses loudly toward [[diff]]. */
  def readChangesBetween(
      spark: SparkSession,
      tablePath: String,
      fromVersion: Long,
      toVersion: Long): DataFrame = {
    require(fromVersion <= toVersion,
      s"readChangesBetween: fromVersion $fromVersion > toVersion $toVersion")
    val (from, to, stored) =
      generationPair(spark, tablePath, fromVersion, toVersion,
        "readChangesBetween")
    val toFiles = to.map(_._1).toSet
    val dropped = from.filterNot(r => toFiles.contains(r._1))
    require(dropped.isEmpty,
      s"readChangesBetween: versions $fromVersion..$toVersion of " +
        s"$tablePath are not append+delete lineage — ${dropped.size} " +
        "file(s) were rewritten in between; use diff() for the " +
        "row-level audit")
    // both versions' governing DV generations from ONE family listing
    val f = fs(spark, tablePath)
    val dvFam =
      if (f.exists(new Path(dvRoot(tablePath))))
        sidecarFamilyListed(f, dvRoot(tablePath))
      else Seq.empty
    val gens = resolveSidecars(spark, tablePath, toVersion)
    val l2p = logicalToPhysical(colMapOf(spark, gens))
    val phys = stored.map(physicalSchema(_, l2p))
    def rowsOf(files: Seq[(String, String)], withMeta: Boolean) =
      fromPhysical(readFileRows(spark, files, phys, withMeta), l2p)

    val emptyDv =
      spark.createDataFrame(spark.sparkContext.emptyRDD[Row], dvSchema)
    def dvAt(v: Long) = pickAtOrBelow(dvFam, v)
      .map { case (_, dir) => spark.read.schema(dvSchema).parquet(dir) }
      .getOrElse(emptyDv)
    val dTo = dvAt(toVersion)
    val dFrom = dvAt(fromVersion)
    // DV sets are exact (file, row_index) id sets — set difference is
    // the interval's delete/resurrect delta, metadata-scale
    val newlyDeleted = dTo.exceptAll(dFrom)
    val resurrected = dFrom.exceptAll(dTo)

    val fromFileSet = from.map(_._1).toSet
    val freshFiles = to.filterNot(r => fromFileSet.contains(r._1))
    // materialize rows addressed by a DV-id frame: scan ONLY the
    // files that carry them, semi-join on the row identity
    def materialize(ids: DataFrame, tag: String): Option[DataFrame] = {
      val files = ids.select(col("file")).distinct()
        .collect().map(_.getString(0)).toSet
      if (files.isEmpty) None
      else {
        val rows = to.filter(r => files.contains(r._1))
        val scan = rowsOf(rows, withMeta = true)
        Some(scan.join(ids,
          scan(DvFileCol) === ids("file") &&
            scan(DvPosCol) === ids("row_index"), "left_semi")
          .drop(DvFileCol, DvPosCol)
          .withColumn("change", lit(tag)))
      }
    }

    val plusFresh =
      if (freshFiles.isEmpty) None
      else {
        val scan = rowsOf(freshFiles, withMeta = true)
        Some(applyDv(scan, dTo).drop(DvFileCol, DvPosCol)
          .withColumn("change", lit("+")))
      }
    // deletes that hit PRE-EXISTING rows only (fresh-file deletes
    // already cancelled inside plusFresh)
    val fromFilesDf = spark.createDataFrame(
      from.map(r => Tuple1(r._1))).toDF("file")
    val minusRows = materialize(
      newlyDeleted.join(fromFilesDf, Seq("file"), "left_semi"), "-")
    val plusBack = materialize(resurrected, "+")

    val legs = Seq(plusFresh, minusRows, plusBack).flatten
    if (legs.isEmpty) {
      val schema = stored.getOrElse(
        readAsOf(spark, tablePath, toVersion).schema)
      spark.createDataFrame(spark.sparkContext.emptyRDD[Row],
        schema.add("change", org.apache.spark.sql.types.StringType))
    } else legs.reduceLeft((a, b) =>
      a.unionByName(b, allowMissingColumns = true))
  }

  /** WRITE-AUDIT-PUBLISH: stage the batch's data files, run the audit
    * on the STAGED frame as read back from disk (what a reader would
    * actually see — not the in-memory input), and publish the manifest
    * generation only if the audit reports zero violations. On refusal
    * the staged files are deleted and the table is untouched — the bad
    * batch was never visible to any reader, because the manifest
    * append IS the publish point and it never happened (the WAP
    * pattern every ingest gate wants: audit between write and
    * publish, not after). The claimed version number stays burned — a
    * benign gap, the same one a crashed committer leaves, which the
    * gap-safe append lineage already tolerates.
    *
    * `audit` maps the staged frame to an expectation report with a
    * `n_violations` column — [[Stats.expectRows]] /
    * [[Stats.expectForeignKey]] / [[Stats.expectUniqueKey]] produce
    * exactly that shape, and their unions compose a suite. Returns
    * `Right(version)` on publish, `Left(report rows)` on refusal. */
  def commitAudited(
      spark: SparkSession,
      df: DataFrame,
      tablePath: String,
      audit: DataFrame => DataFrame,
      append: Boolean,
      ts: Option[Long] = None): Either[Seq[Row], Long] = {
    val observed = latestVersion(spark, tablePath)
    val version = claimVersion(spark, tablePath,
      observed.map(_ + 1L).getOrElse(0L))
    val dataPath = s"$tablePath/$DataDir/v$version"
    val prepared = prepareBatch(spark, tablePath, observed, df)
    toPhysical(spark, tablePath, observed, prepared)
      .write.mode("errorifexists").parquet(dataPath)
    val l2pAud = logicalToPhysical(observed
      .map(v => colMapAsOf(spark, tablePath, v)).getOrElse(Seq.empty))
    val staged = fromPhysical(spark.read
      .schema(physicalSchema(nullableTop(prepared.schema), l2pAud))
      .parquet(dataPath), l2pAud)
    val report = audit(staged)
    require(report.columns.contains("n_violations"),
      "commitAudited: the audit report must carry an n_violations column")
    val rows = report.collect().toSeq
    val clean = rows.forall { r =>
      val i = r.fieldIndex("n_violations")
      r.isNullAt(i) || r.getLong(i) == 0L
    }
    if (!clean) {
      fs(spark, tablePath).delete(new Path(dataPath), true)
      Left(rows)
    } else {
      val fresh = footerCounts(spark,
        listDataFiles(spark, dataPath).map((_, null: String)))
      Right(
        if (append)
          publishAppend(spark, tablePath, version, fresh, observed,
            prepared.schema, ts)
        else publish(spark, tablePath, version, fresh, None,
          prepared.schema, ts))
    }
  }

  /** RIGHT-TO-ERASURE purge: remove every row matching `keys` from the
    * WHOLE retained history — every version, not just the head. Privacy
    * law trumps snapshot immutability: a keyed delete via [[merge]]
    * only cleans the new head while the subject's rows stay readable AS
    * OF every older version, which is exactly what a GDPR/CCPA erasure
    * request forbids. This is the one verb that rewrites history in
    * place, and it does so at FILE granularity:
    *
    *  1. ONE distributed pass over the distinct files of all retained
    *     generations, reading ONLY the key columns (fixed key schema —
    *     no footer merge, no payload bytes), finds the files that
    *     contain a hit; clean files are never rewritten, their paths
    *     stay byte-identical in every manifest (spec-pinned).
    *  2. Each hit file is rewritten minus the matching rows into a
    *     fresh purge directory (partition fragment preserved so
    *     partition-column reconstruction and [[scanPartitionAsOf]]
    *     still work), and every generation referencing the old file is
    *     repointed to the replacement — shared files are rewritten
    *     ONCE no matter how many snapshots reference them, and the
    *     manifests' row counts are refreshed from the new footers.
    *  3. The full manifest is replaced via the crash-safe
    *     [[swapManifest]], then the old hit files are deleted. A crash
    *     after the swap leaves them unreferenced — [[removeOrphans]]'
    *     territory — never a readable copy of the purged rows in any
    *     manifest.
    *
    * Cost: O(table keys-only scan) to find hits + O(files containing
    * the subject) rewrite jobs — on a partitioned/clustered table the
    * second term is the handful of files the subject actually touches.
    * `keys` columns must exist with matching types in the data files
    * (partition columns are not purgeable keys). Returns the number of
    * rows removed across distinct files. */
  def purgeKeys(
      spark: SparkSession,
      tablePath: String,
      keys: DataFrame,
      keyCols: Seq[String]): Long = {
    require(keyCols.nonEmpty, "purgeKeys needs key columns")
    requireNoColMap(spark, tablePath, "purgeKeys")
    val m = manifest(spark, tablePath).collect()
    require(m.nonEmpty, s"$tablePath has no committed versions")
    // purge rewrites files under NEW paths; a live deletion-vector
    // entry pointing at an old path would die silently and resurrect
    // its deleted row in every governed version. Refuse loudly while
    // any DV entry references a manifest file — compact the deletes
    // away first (optimize + vacuum) or extend purge with DV
    // remapping. (Dead entries — files already replaced — are fine.)
    require(!liveDvEntriesExist(spark, tablePath,
      m.map(_.getString(1)).toSeq),
      s"purgeKeys: $tablePath carries live deletion-vector entries — " +
        "rewritten files would orphan them and resurrect deleted rows; " +
        "compact deletes first (optimize, then vacuum) or remap the " +
        "DV sidecars")
    def norm(p: String) = new Path(p).toUri.getPath
    val k = keys.select(keyCols.map(col): _*).distinct()
    val keySchema = org.apache.spark.sql.types.StructType(
      keyCols.map(c => k.schema(c)))
    val allFiles = m.map(_.getString(1)).distinct.toSeq.sorted
    val hitFiles = spark.read.schema(keySchema)
      .parquet(allFiles: _*)
      .withColumn("__f", input_file_name())
      .join(k, keyCols)
      .select(col("__f")).distinct()
      .collect().map(r => norm(r.getString(0))).toSet
    if (hitFiles.isEmpty) 0L
    else {
      val f = fs(spark, tablePath)
      // deterministic fresh purge root under the data dir
      val purgeRoot = Iterator.from(0)
        .map(i => s"$tablePath/$DataDir/purge$i")
        .find(d => !f.exists(new Path(d))).get
      var purged = 0L
      val mapping = hitFiles.toSeq.sorted.zipWithIndex.map {
        case (old, i) =>
          val row = m.find(r => norm(r.getString(1)) == old).get
          val frag = if (row.isNullAt(2)) null else row.getString(2)
          val outDir = if (frag == null) s"$purgeRoot/f$i"
            else s"$purgeRoot/f$i/$frag"
          spark.read.parquet(old)
            .join(k, keyCols.toSeq, "left_anti")
            .coalesce(1)
            .write.mode("errorifexists").parquet(outDir)
          val fresh = listDataFiles(spark, outDir)
          require(fresh.size == 1,
            s"purge rewrite of $old produced ${fresh.size} files")
          val oldRows = footerCounts(spark, Seq((old, frag))).head._3.get
          val newRows =
            footerCounts(spark, Seq((fresh.head, frag))).head._3.get
          purged += oldRows - newRows
          old -> (fresh.head, newRows)
      }.toMap
      requireHeadUnmoved(spark, tablePath,
        Some(m.map(_.getLong(0)).max), "purgeKeys")
      swapManifest(spark, tablePath, m.toSeq.map { r =>
        val part = if (r.isNullAt(2)) null else r.getString(2)
        val schemaJson = if (r.isNullAt(3)) null else r.getString(3)
        val ts = if (r.isNullAt(5)) None else Some(r.getLong(5))
        val par = if (r.isNullAt(6)) None else Some(r.getLong(6))
        mapping.get(norm(r.getString(1))) match {
          case Some((nf, nRows)) =>
            (r.getLong(0), nf, part, schemaJson, Some(nRows), ts, par)
          case None =>
            (r.getLong(0), r.getString(1), part, schemaJson,
              if (r.isNullAt(4)) None else Some(r.getLong(4)), ts, par)
        }
      })
      // per-version sidecars (clustered min/max stats, bloom
      // manifests) reference data files by path too: repoint them
      // (and refresh n_rows) BEFORE the old files die, so
      // scanRangeAsOf/scanPointAsOf never plan a deleted file. The
      // stored bounds and blooms stay valid — purging only REMOVES
      // rows, so both remain conservative supersets and pruning
      // remains sound (no false negatives can appear).
      Seq("_stats", "_bloom").map(r => new Path(s"$tablePath/$r"))
        .filter(f.exists).foreach { statsRoot =>
        f.listStatus(statsRoot).filter(_.isDirectory).foreach { d =>
          val sd = d.getPath.toString
          val rows = spark.read.parquet(sd).collect()
          val fileIx = rows.headOption.map(_.fieldIndex("file")).getOrElse(-1)
          val nIx = rows.headOption.map(_.fieldIndex("n_rows")).getOrElse(-1)
          if (rows.exists(r => mapping.contains(norm(r.getString(fileIx))))) {
            val fixed = rows.map { r =>
              mapping.get(norm(r.getString(fileIx))) match {
                case Some((nf, nRows)) =>
                  Row.fromSeq(r.toSeq.zipWithIndex.map {
                    case (_, i) if i == fileIx => nf
                    case (_, i) if i == nIx => nRows
                    case (v, _) => v
                  })
                case None => r
              }
            }
            val schema = spark.read.parquet(sd).schema
            val tmp = new Path(sd + "_staged")
            val prev = new Path(sd + "_prev")
            if (f.exists(tmp)) f.delete(tmp, true)
            if (f.exists(prev)) f.delete(prev, true)
            spark.createDataFrame(
              spark.sparkContext.parallelize(fixed.toSeq, 1), schema)
              .coalesce(1).write.parquet(tmp.toString)
            require(f.rename(d.getPath, prev) && f.rename(tmp, d.getPath),
              s"stats swap failed for $sd")
            f.delete(prev, true)
          }
        }
      }
      // clone-table externals are rewritten locally (repointed above)
      // but the OLD file belongs to the source table — leave it
      hitFiles.filter(ownsFile(tablePath, _))
        .foreach(file => f.delete(new Path(file), false))
      purged
    }
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
