package graft.operators

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions.col

/** Small-file compaction — the table-maintenance operator every
  * long-lived parquet lake needs: streaming sinks, incremental appends
  * and fine-grained partitioning all accrete files far below the
  * scan-efficient size, and at 100 TB the cost is real (driver-side
  * listing, per-file open/footer overhead, undersized row groups that
  * defeat column-chunk skipping). Compaction is a rewrite: read, wash
  * through ONE round-robin repartition sized from the table's actual
  * bytes, write back. Round-robin (not hash) because the goal is
  * uniform file sizes, not a distribution — and reading+writing is the
  * only way to merge parquet row groups, so the one shuffle is the
  * operator, not overhead.
  *
  * The partitioned variant preserves the directory scheme and merges
  * WITHIN partitions: a hash repartition on the partition columns sends
  * every row of a partition value to one task, so each live partition
  * directory lands as exactly one file (the right shape when partitions
  * are pruning units — e.g. the IVF cell stores here). Content is
  * byte-for-byte the same rows either way, which is what the oracle row
  * checks; file-count arithmetic is pinned in `ScaleSpec`.
  *
  * In-place semantics are write-to-new-path on purpose: an atomic swap
  * (rename/catalog flip) is the metastore's job, and overwriting the
  * path being read is a correctness trap Spark itself rejects. */
object Compaction {

  /** Total bytes of all files under `path` (recursive, via the Hadoop
    * FS so it works on any supported filesystem). */
  def tableBytes(spark: SparkSession, path: String): Long = {
    val p = new Path(path)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val it = fs.listFiles(p, true)
    var total = 0L
    while (it.hasNext) {
      val f = it.next()
      if (!f.getPath.getName.startsWith("_")) total += f.getLen
    }
    total
  }

  /** Compact an UNPARTITIONED parquet table at `src` into
    * `ceil(bytes / targetBytes)` uniform files at `dst`. */
  def compact(
      spark: SparkSession,
      src: String,
      dst: String,
      targetBytes: Long): Unit = {
    require(targetBytes > 0, "targetBytes must be positive")
    val bytes = tableBytes(spark, src)
    val n = math.max(1L, (bytes + targetBytes - 1) / targetBytes).toInt
    spark.read.parquet(src)
      .repartition(n)
      .write.mode("overwrite").parquet(dst)
  }

  /** Compact a PARTITIONED parquet table, preserving the directory
    * scheme: each live partition value lands as exactly one file. */
  def compactPartitioned(
      spark: SparkSession,
      src: String,
      dst: String,
      partitionCols: Seq[String]): Unit = {
    require(partitionCols.nonEmpty,
      "partitionCols must be non-empty — use compact() for flat tables")
    spark.read.parquet(src)
      .repartition(partitionCols.map(col): _*)
      .write.partitionBy(partitionCols: _*).mode("overwrite").parquet(dst)
  }
}
