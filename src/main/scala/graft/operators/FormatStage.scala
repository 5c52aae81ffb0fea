package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.model.ColumnRegistry

/** The `format` stage (reference: BatchUpdate.py:144-175), Spark-first.
  *
  * Reference semantics: resolve the column registry against the header,
  * project down to the registered columns in registry order, and prepend an
  * apostrophe to 'n'-flagged (numeric) values so spreadsheet round-trips
  * don't lossily re-encode large IDs in scientific notation
  * (BatchUpdate.py:159-168).
  *
  * Spark shape: a single narrow `select` — no shuffle, fully pushed into the
  * scan (column pruning); the numeric guard is a codegen'd `concat`. The
  * reference's O(n²) `data.index(row)` hazard (BatchUpdate.py:165)
  * disappears because the header is schema, not data.
  */
object FormatStage {

  /** Projection with reorder + add-in defaults + numeric guard (P1–P3). */
  def apply(registry: ColumnRegistry)(df: DataFrame): DataFrame = {
    val (present, toAdd) = registry.resolve(df.columns.toSeq)
    val nums = registry.expanded.numericNames
    val toAddNames = toAdd.map(_.name).toSet
    val cols: Seq[Column] = present.map { spec =>
      val base =
        if (toAddNames.contains(spec.name)) lit("") else col(spec.name)
      val guarded =
        if (nums.contains(spec.name)) concat(lit("'"), base) else base
      guarded.as(spec.name)
    }
    df.select(cols: _*)
  }

  /** Inverse of the numeric guard, applied before upload
    * (BatchUpdate.py:474 strips `value[1:]`). The reference blindly drops
    * the first character; we only drop a leading apostrophe, which is the
    * intended semantics. */
  def unguard(c: Column): Column = regexp_replace(c, "^'", "")
}
