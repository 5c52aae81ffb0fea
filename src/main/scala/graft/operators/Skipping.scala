package graft.operators

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._

/** File-level data skipping via an explicit min/max manifest — the
  * planning-time half of the lakehouse scan path (Delta/Iceberg file
  * statistics), expressed as plain Spark over plain parquet.
  *
  * Parquet row-group statistics already let Spark's reader skip data at
  * READ time, but only after the driver has listed the table and every
  * task has opened its files' footers. At 100 TB / millions of files
  * that listing-and-footer pass IS the latency floor for selective
  * queries. A manifest inverts it: one small table (a row per data
  * file, min/max per tracked column) answers "which files can contain
  * key ∈ [lo, hi]" BEFORE any data file is touched, and the scan is
  * planned over exactly that file list. Pruning power comes from the
  * physical layout: a range-clustered (or Z-ordered, [[Layout]]) write
  * gives each file a tight key interval, so the manifest's intervals
  * are near-disjoint and a selective predicate selects few files.
  *
  * The driver-side file-list collect is O(matching files) on a frame
  * that is O(total files) — the same order as Delta's log replay, and
  * the whole point: it replaces an O(files) remote listing + O(files)
  * footer reads with one local predicate over an already-compacted
  * table. The manifest build here is a one-pass aggregation over the
  * data (portable, engine-checkable); a production writer would fold
  * the same rows out of its commit statistics for free.
  */
object Skipping {

  /** Range-cluster `df` on `keyCol` into `numFiles` files at `path`:
    * one range exchange so each output file covers a compact, sorted
    * key interval — the layout that makes min/max manifests selective.
    * (For two-key pruning, Z-order via [[Layout.clusterByZOrder]] and
    * track both keys in the manifest.) */
  def writeClustered(
      df: DataFrame,
      keyCol: String,
      numFiles: Int,
      path: String): Unit = {
    require(numFiles >= 1, "numFiles must be positive")
    df.repartitionByRange(numFiles, col(keyCol))
      .sortWithinPartitions(col(keyCol))
      .write.mode("overwrite").parquet(path)
  }

  /** The manifest frame for the table at `tablePath`: one row per data
    * file — (file, n_rows, min_<c>/max_<c> for each tracked column).
    * One grouped aggregation keyed on `input_file_name()`; map-side
    * partial aggregation reduces each file's task to a single row
    * before the (tiny) shuffle. */
  def buildManifest(
      spark: SparkSession,
      tablePath: String,
      statsCols: Seq[String]): DataFrame = {
    require(statsCols.nonEmpty, "track at least one column")
    val aggs = count(lit(1)).as("n_rows") +:
      statsCols.flatMap(c =>
        Seq(min(col(c)).as(s"min_$c"), max(col(c)).as(s"max_$c")))
    spark.read.parquet(tablePath)
      .groupBy(input_file_name().as("file"))
      .agg(aggs.head, aggs.tail: _*)
  }

  /** Build and persist the manifest beside the table (parquet at
    * `manifestPath`). Separate from the data so a scan planner can read
    * it without listing the data directory. */
  def writeManifest(
      spark: SparkSession,
      tablePath: String,
      statsCols: Seq[String],
      manifestPath: String): Unit =
    buildManifest(spark, tablePath, statsCols)
      .coalesce(1)
      .write.mode("overwrite").parquet(manifestPath)

  /** The file list whose [min, max] interval on `keyCol` intersects
    * [lo, hi] — a driver-side collect over the manifest (O(files),
    * see object scaladoc). All-null files (min/max null) cannot match a
    * range predicate and are pruned. */
  def pruneFiles(
      manifest: DataFrame,
      keyCol: String,
      lo: Any,
      hi: Any): Seq[String] =
    manifest
      .filter(col(s"max_$keyCol") >= lit(lo) && col(s"min_$keyCol") <= lit(hi))
      .select(col("file"))
      .collect()
      .map(_.getString(0))
      .toSeq

  /** Per-file BLOOM membership manifest — the min/max statistics'
    * complement for HIGH-CARDINALITY POINT lookups on an UNCLUSTERED
    * column (Delta's bloom filter index): when every file's key
    * interval spans the whole domain (any layout not range-clustered
    * on this column), min/max pruning admits every file, but a
    * per-file bloom answers "can file F contain key = v"
    * probabilistically with NO false negatives — admitted ⊇ true
    * files, the exact row filter clears the false positives. One
    * grouped aggregation builds every file's bloom in a single data
    * pass (`BloomFilterAggregate` over `xxhash64(key)`, map-side
    * combined); bits sized by the standard `n·ln(1/fpp)/ln²2` from
    * `expectedPerFile` (size for the real per-file row count — an
    * undersized bloom only costs false positives, never misses). */
  def writeBloomManifest(
      spark: SparkSession,
      tablePath: String,
      keyCol: String,
      manifestPath: String,
      expectedPerFile: Long = 100000L,
      fpp: Double = 0.01): Unit = {
    require(expectedPerFile > 0, "expectedPerFile must be positive")
    require(fpp > 0 && fpp < 1, "fpp must be in (0, 1)")
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
    spark.read.parquet(tablePath)
      .groupBy(input_file_name().as("file"))
      .agg(count(lit(1)).as("n_rows"), agg.as("bf"))
      .coalesce(1)
      .write.mode("overwrite").parquet(manifestPath)
  }

  /** Bloom-pruned POINT scan: the manifest admits only the files whose
    * bloom might contain `value` — probed driver-side over the
    * metadata-scale manifest with the same sketch implementation the
    * aggregate serialized (`might_contain` as an EXPRESSION insists on
    * a foldable bloom, which a per-file column is not; the manifest is
    * O(files) rows either way, the same driver scale as
    * [[pruneFiles]]). No false negatives by construction; the exact
    * predicate clears false positives. Zero admitted files is an
    * answer (empty frame with the table's schema). */
  def scanPoint(
      spark: SparkSession,
      tablePath: String,
      manifestPath: String,
      keyCol: String,
      value: Any): DataFrame = {
    val files = pruneFilesPoint(spark, manifestPath, value)
    val schema = spark.read.parquet(tablePath).schema
    val base =
      if (files.isEmpty)
        spark.createDataFrame(spark.sparkContext.emptyRDD[Row], schema)
      else spark.read.schema(schema).parquet(files: _*)
    base.filter(col(keyCol) === lit(value))
  }

  /** The files a [[writeBloomManifest]] manifest admits for
    * `key = value`: Spark's own `xxhash64(value)` (computed by the
    * engine so seeds/encodings can never drift from the aggregate's
    * inserts) probed against each file's deserialized sketch. The
    * probe runs ON EXECUTORS (a deserialize-and-test UDF — the one
    * shape `might_contain` as an expression refuses, since a per-file
    * bloom column is not foldable) so the driver collects only the
    * admitted file NAMES: per-file blooms are ~100 KB each, and a
    * million-file manifest must never ship its sketch bytes to the
    * driver. */
  def pruneFilesPoint(
      spark: SparkSession,
      manifestPath: String,
      value: Any): Seq[String] = {
    val h = spark.range(1).select(xxhash64(lit(value))).head().getLong(0)
    val admits = udf { (bf: Array[Byte]) =>
      org.apache.spark.util.sketch.BloomFilter
        .readFrom(new java.io.ByteArrayInputStream(bf))
        .mightContainLong(h)
    }
    spark.read.parquet(manifestPath)
      .filter(admits(col("bf")))
      .select(col("file")).collect().map(_.getString(0)).toIndexedSeq
  }

  /** Manifest-pruned range scan: plan the parquet read over ONLY the
    * files whose stats admit `keyCol` ∈ [lo, hi], then apply the exact
    * row filter (file stats are necessary, not sufficient). Zero
    * matching files returns an empty frame with the table's schema —
    * a selective miss is an answer, not an error. */
  def scanRange(
      spark: SparkSession,
      tablePath: String,
      manifestPath: String,
      keyCol: String,
      lo: Any,
      hi: Any): DataFrame = {
    val manifest = spark.read.parquet(manifestPath)
    val files = pruneFiles(manifest, keyCol, lo, hi)
    val schema = spark.read.parquet(tablePath).schema
    val base =
      if (files.isEmpty)
        spark.createDataFrame(spark.sparkContext.emptyRDD[Row], schema)
      else spark.read.schema(schema).parquet(files: _*)
    base.filter(col(keyCol) >= lit(lo) && col(keyCol) <= lit(hi))
  }
}
