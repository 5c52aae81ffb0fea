package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.model.{CodeTables, ColumnRegistry}

/** Fill / validate / annotate operators (reference P4–P9).
  *
  * All are single-pass narrow transformations (no shuffle) except domain
  * validation, which is expressed as a broadcast anti-join against the code
  * dimension so invalid rows become error rows instead of the reference's
  * interactive re-prompt loop (BatchUpdate.py:669-682) — a distributed
  * engine cannot block executors on stdin.
  */
object FillStage {

  /** P4 — fill-if-blank (BatchUpdate.py:218-239): overwrite only empty
    * cells of optional columns with the configured default. */
  def fillBlank(colName: String, value: String)(df: DataFrame): DataFrame =
    if (!df.columns.contains(colName)) df
    else df.withColumn(
      colName,
      when(col(colName) === "" || col(colName).isNull, lit(value))
        .otherwise(col(colName)))

  /** P5 — constant overwrite (BatchUpdate.py:245-264): overwrite every
    * row's value of an add-in column. */
  def overwriteAll(colName: String, value: String)(df: DataFrame): DataFrame =
    df.withColumn(colName, lit(value))

  /** Apply the registry's defaults: optional columns fill-if-blank, add-in
    * columns overwrite-all — skipping 'x'-flagged derived columns
    * (BatchUpdate.py:220, :247). Values for code-table columns are
    * validated eagerly (driver-side `require` replaces the interactive
    * `_checkValue` loop). NB deliberate generalization: the reference's
    * write-back loops only execute for code-table columns (:231-239,
    * :256-264 sit inside `if colname in code_tables`); here any column
    * with a registry default is filled. The default registry's defaulted
    * columns are all code-table columns, so outputs coincide there. */
  def applyDefaults(registry: ColumnRegistry)(df: DataFrame): DataFrame = {
    val e = registry.expanded
    def checked(colName: String, v: String): String = {
      CodeTables.all.get(colName).foreach { table =>
        require(
          table.contains(v),
          s"Value '$v' for column '$colName' is not possible. " +
            s"Possible options: ${table.keys.mkString("'", "', '", "'")}")
      }
      v
    }
    val afterOpt = e.optional.filter(c => !c.derived && c.default.isDefined)
      .foldLeft(df) { (d, c) => fillBlank(c.name, checked(c.name, c.default.get))(d) }
    e.addIn.filter(c => !c.derived && c.default.isDefined)
      .foldLeft(afterOpt) { (d, c) => overwriteAll(c.name, checked(c.name, c.default.get))(d) }
  }

  /** P9 — note-append accumulator (BatchUpdate.py:309, :312, :413, :482,
    * :561): append "Err: ..." to Notes with "; " separator iff Notes is
    * non-empty. */
  def noteAppend(notes: Column, message: Column): Column =
    when(notes.isNull || notes === "", message)
      .otherwise(concat(notes, lit("; "), message))

  def noteAppendWhen(cond: Column, message: String, notesCol: String = "Notes")(
      df: DataFrame): DataFrame =
    df.withColumn(
      notesCol,
      when(cond, noteAppend(col(notesCol), lit(message))).otherwise(col(notesCol)))

  /** Barcode checks (BatchUpdate.py:305-312): missing barcode (bare
    * apostrophe guard or null) and i-barcodes get an error note. */
  def barcodeChecks(df: DataFrame): DataFrame = {
    val missing = col("Barcode").isNull || col("Barcode") === "'" ||
      col("Barcode") === ""
    val iBarcode = length(col("Barcode")) > 2 &&
      substring(col("Barcode"), 2, 1) === "i"
    noteAppendWhen(iBarcode, "Err: i-barcode")(
      noteAppendWhen(missing, "Err: Missing barcode")(df))
  }

  /** P6 — domain validation as a broadcast anti-join: rows whose value is
    * not in the code table get an error note (instead of the reference's
    * re-prompt loop). The dimension is tiny (≤12 rows) so this broadcasts
    * and never shuffles the fact side. */
  def validateDomain(
      spark: SparkSession,
      colName: String,
      notesCol: String = "Notes")(df: DataFrame): DataFrame = {
    val dim = CodeTables.dimension(spark, colName)
      .withColumnRenamed("description", "__valid_value")
      .select("__valid_value")
    val joined = df.join(
      broadcast(dim),
      df(colName) === col("__valid_value"),
      "left_outer")
    noteAppendWhen(
      // blank/null = missing, not invalid: the reference treats blanks as
      // fillable (P4) and only validates supplied values
      col("__valid_value").isNull &&
        col(colName).isNotNull && col(colName) =!= "",
      s"Err: Invalid value for $colName",
      notesCol)(joined).drop("__valid_value")
  }

  /** P7 — dictionary translation (value→code) on upload
    * (BatchUpdate.py:504, :517). Small fixed dimension → a literal map
    * lookup compiled into the plan; stays codegen-friendly and never
    * shuffles. */
  def translateCode(colName: String, table: Map[String, String]): Column = {
    val m = typedLit(table)
    element_at(m, col(colName))
  }

  /** P8 — skip-errored filter (BatchUpdate.py:467-472): rows already
    * flagged with an error or an unmatched description pattern. Null
    * cells coalesce to false — under three-valued logic a null Pattern
    * would make BOTH `filter(bad)` and `filter(!bad)` drop the row,
    * silently losing it from every routed sink. */
  def hasError(df: DataFrame): Column = {
    val errNote = coalesce(col("Notes").contains("Err"), lit(false))
    if (df.columns.contains("Pattern"))
      errNote || coalesce(col("Pattern") === "N/A", lit(false))
    else errNote
  }

  /** S5 — multi-way routed sink: one cached frame, two filtered outputs
    * (BatchUpdate.py:439-442, :558-566). */
  def route(df: DataFrame): (DataFrame, DataFrame) = {
    val bad = hasError(df)
    (df.filter(!bad), df.filter(bad))
  }
}
