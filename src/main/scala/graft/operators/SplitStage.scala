package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.functions.Description
import graft.model.{AlmaSchema, ColumnRegistry}

/** The `split` stage (reference: BatchUpdate.py:189-423) as one composed
  * DataFrame pipeline:
  *
  *   checkColumns → append Pattern/Notes → fill defaults → parse
  *   descriptions (R1) → natural sort (W1) → barcode checks → year
  *   inference (W2) → Chron J canonicalization (R2)
  *
  * Plan shape: everything up to the sort fuses into a single narrow
  * whole-stage-codegen pass over the scan. The only shuffle is the group
  * partitioning required by W1+W2 — we hash-partition on `MMS ID` and sort
  * within partitions instead of a global range sort, because W2 never
  * crosses group boundaries (BatchUpdate.py:346, :362); at cluster scale
  * that is one exchange instead of two.
  */
object SplitStage {

  /** `exactSequentialFidelity = false` (default): year inference runs as
    * the codegen'd window formulation — one hash exchange on the group
    * key, whole-stage codegen throughout. `true` opts into the
    * bug-compatible `flatMapGroups` re-enactment of the reference's
    * sequential loop (identical output whenever groups arrive in input
    * order, as in the golden fixture; kept for byte-fidelity audits). */
  def apply(
      df: DataFrame,
      registry: ColumnRegistry = AlmaSchema.default,
      exactSequentialFidelity: Boolean = false,
      novBugCompat: Boolean = false): DataFrame = {

    // checkColumns: verify mandatory presence and APPEND missing add-in
    // columns, but keep every input column — only format() projects down
    // to the registry; the reference's split preserves extras and appends
    // (BatchUpdate.py:652-664).
    val (_, toAdd) = registry.resolve(df.columns.toSeq)
    val projected = df.select(
      (df.columns.toSeq.map(col) ++
        toAdd.map(s => lit("").as(s.name))): _*)

    // Pattern + Notes always appended when absent (BatchUpdate.py:202-212).
    val withMeta = Seq("Pattern", "Notes").foldLeft(projected) { (d, c) =>
      if (d.columns.contains(c)) d else d.withColumn(c, lit(""))
    }

    val filled = FillStage.applyDefaults(registry)(withMeta)
    val parsed =
      if (filled.columns.contains("Description"))
        Description.withParsedDescription(filled)
      else filled
    val checked = FillStage.barcodeChecks(parsed)

    val inferred =
      if (checked.columns.contains("Description")) {
        val fixed =
          if (exactSequentialFidelity) YearInference.inferSequential(checked)
          else
            // one hash exchange on the group key; in-group order comes from
            // sortWithinPartitions via the window's own sort
            YearInference.inferWindowed(checked)
        fixed.withColumn(
          "Chron J",
          Description.canonicalizeChronJ(col("Chron J"), novBugCompat))
      } else checked

    // W1's user-visible global order for the written file.
    YearInference.naturalSort(inferred)
  }
}
