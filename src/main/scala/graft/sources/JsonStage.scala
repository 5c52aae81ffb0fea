package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.types.StructType

/** JSON-lines (one object per line) source/sink — the raw-web ingest
  * format: crawl dumps, API exports, and log shippers all speak it, it's
  * line-splittable (each executor's split starts at a newline, so a
  * 100-TB directory parallelizes like text), and nested objects carry
  * typed sub-records without a schema registry.
  *
  * Reading takes an EXPLICIT schema: Spark's JSON inference is a full
  * extra pass over the data before the real one — at corpus scale the
  * contract is pinned by the caller instead (the same reasoning as the
  * events-table schema contract in `graft.Tables`). `FAILFAST` mode is
  * deliberate: the permissive default silently nulls every field of a
  * corrupt line, which reads as data loss downstream; an ingest gate
  * wants the loud failure (callers routing bad lines use `badRecordsPath`
  * or a permissive pre-pass explicitly, not by accident).
  */
object JsonStage {

  /** Sink: partitioned JSON-lines under `path` (one file per partition —
    * the scalable default, as with `CsvStage.writeStage`). Returns the
    * path the next stage reads. */
  def write(df: DataFrame, path: String): String = {
    df.write.mode("overwrite").json(path)
    path
  }

  /** Source: schema-pinned JSON-lines scan, loud on corrupt lines. */
  def read(spark: SparkSession, schema: StructType, path: String): DataFrame =
    spark.read.schema(schema).option("mode", "FAILFAST").json(path)
}
