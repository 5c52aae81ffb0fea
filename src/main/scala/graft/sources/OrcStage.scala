package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}

/** ORC source/sink — the second columnar format a lakehouse ingests
  * beside parquet (Hive-era warehouses hand over ORC; some downstream
  * engines prefer it). Spark ships a native vectorized ORC reader
  * (`spark.sql.orc.impl=native`, the default), so column pruning and
  * predicate/partition pushdown behave exactly as on parquet — the
  * `orc_roundtrip` gate writes a hive-partitioned ORC store, reads it
  * back with a partition filter, and PlanSpec pins that the filter
  * prunes at planning time rather than scanning every directory.
  *
  * Deliberately thin: ORC is self-describing (schema embedded per
  * file), so unlike [[JsonStage]] there is no caller-pinned schema to
  * enforce — the format carries it. The wrapper exists so every
  * external format the engine speaks has one audited entry point. */
object OrcStage {

  /** Write `df` as ORC under `path` (zlib — the format's default,
    * splittable, universally readable), optionally hive-partitioned.
    * Returns the path for chaining. */
  def write(
      df: DataFrame,
      path: String,
      partitionBy: Seq[String] = Nil): String = {
    val w = df.write.mode("overwrite").format("orc")
      .option("compression", "zlib")
    (if (partitionBy.nonEmpty) w.partitionBy(partitionBy: _*) else w)
      .save(path)
    path
  }

  /** Read an ORC store (partition columns recovered from the paths as
    * usual). */
  def read(spark: SparkSession, path: String): DataFrame =
    spark.read.format("orc").load(path)
}
