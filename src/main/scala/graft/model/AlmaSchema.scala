package graft.model

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Column registry for the Alma item-record table.
  *
  * Mirrors the reference's `mand`/`opt`/`add` tuples and flag semantics
  * (reference: BatchUpdate.py:14-28) as a typed, immutable registry:
  *   - `numeric` ('n'): value gets an apostrophe guard in CSV output
  *     (BatchUpdate.py:159-168) that is stripped again before upload
  *     (BatchUpdate.py:474).
  *   - `derived` ('x'): computed from other columns, never prompted/filled
  *     (BatchUpdate.py:19, :220, :247).
  *
  * Column classes (BatchUpdate.py:570-583):
  *   - mandatory: must exist in the input or the plan fails.
  *   - optional: used when present; never added.
  *   - addIn: appended with a default ("" unless specified) when absent.
  */
final case class ColumnSpec(
    name: String,
    numeric: Boolean = false,
    derived: Boolean = false,
    default: Option[String] = None)

final case class ColumnRegistry(
    mandatory: Seq[ColumnSpec],
    optional: Seq[ColumnSpec],
    addIn: Seq[ColumnSpec]) {

  /** Dependent-column closure: declaring `Description` in opt/add pulls in
    * the four enumeration/chronology columns (BatchUpdate.py:604-622). */
  def expanded: ColumnRegistry = {
    val deps = Seq("Enum A", "Enum B", "Chron I", "Chron J")
      .map(n => ColumnSpec(n, derived = true))
    def expand(cols: Seq[ColumnSpec]): Seq[ColumnSpec] =
      if (cols.exists(_.name == "Description"))
        cols ++ deps.filterNot(d => cols.exists(_.name == d.name))
      else cols
    ColumnRegistry(mandatory, expand(optional), expand(addIn))
  }

  def numericNames: Set[String] =
    (mandatory ++ optional ++ addIn).filter(_.numeric).map(_.name).toSet

  /** Resolve against an actual schema: mandatory columns must exist
    * (BatchUpdate.py:626-630); optional columns are kept only if present
    * (:641-649); add-in columns are appended when missing (:652-657).
    * Returns (columns present after resolution in registry order,
    *          add-in columns that must be appended). */
  def resolve(actual: Seq[String]): (Seq[ColumnSpec], Seq[ColumnSpec]) = {
    val e = expanded
    val missingMand = e.mandatory.filterNot(c => actual.contains(c.name))
    require(
      missingMand.isEmpty,
      s"data must contain mandatory column(s): ${missingMand.map(_.name).mkString(", ")}")
    val present =
      e.mandatory ++
        e.optional.filter(c => actual.contains(c.name)) ++
        e.addIn
    val toAdd = e.addIn.filterNot(c => actual.contains(c.name))
    (present, toAdd)
  }
}

object AlmaSchema {
  /** The reference's default registry (BatchUpdate.py:26-28). */
  val default: ColumnRegistry = ColumnRegistry(
    mandatory = Seq(
      ColumnSpec("MMS ID", numeric = true),
      ColumnSpec("Barcode", numeric = true),
      ColumnSpec("title")),
    optional = Seq.empty,
    addIn = Seq(
      ColumnSpec("Material Type", default = Some("Bound Issue")),
      ColumnSpec("Item Policy", default = Some("non-circulating")),
      ColumnSpec("Description", derived = true)))
}

/** Enumerated-domain dimensions ("code tables", BatchUpdate.py:40-77).
  * Stored description→code, exactly as the reference keeps them reversed
  * for readability (:30-39). Exposed both as Scala maps (for expression
  * building) and as broadcastable DataFrames (for anti-join validation). */
object CodeTables {
  val status: Map[String, String] = Map(
    "Item not in place" -> "0",
    "Item in place" -> "1")

  val materialType: Map[String, String] = Map(
    "Book" -> "BOOK",
    "Compact Disc" -> "CD",
    "CD-ROM" -> "CDROM",
    "Computer Disk" -> "DISK",
    "DVD" -> "DVD",
    "DVD-ROM" -> "DVDRM",
    "Bound Issue" -> "ISSBD",
    "Issue" -> "ISSUE",
    "Thesis" -> "THESIS")

  val itemPolicy: Map[String, String] = Map(
    "general circulation" -> "0",
    "non-circulating" -> "1",
    "24-hour circulation" -> "2",
    "3-day circulation" -> "3",
    "7-day circulation" -> "4",
    "2-hour library use only" -> "5",
    "3-hour video" -> "6",
    "6-hour media loan" -> "7",
    "WCat-ShortLoan" -> "30",
    "WCat-LongLoan" -> "31",
    "3-hour loan" -> "33")

  val processType: Map[String, String] = Map(
    "Acquisition" -> "ACQ",
    "Loan" -> "LOAN",
    "Claimed Returned" -> "CLAIM_RETURNED_LOAN",
    "Lost" -> "LOST_LOAN",
    "Hold Shelf" -> "HOLDSHELF",
    "Transit" -> "TRANSIT",
    "In Process" -> "WORK_ORDER_DEPARTMENT",
    "Missing" -> "MISSING",
    "Technical - Migration" -> "TECHNICAL",
    "Resource Sharing Request" -> "ILL",
    "Requested" -> "REQUESTED",
    "In Transit to Remote Storage" -> "TRANSIT_TO_REMOTE_STORAGE")

  val all: Map[String, Map[String, String]] = Map(
    "Status" -> status,
    "Material Type" -> materialType,
    "Item Policy" -> itemPolicy,
    "Process type" -> processType)

  /** A code table as a small dimension DataFrame — intended to sit on the
    * build side of a broadcast join at any scale. */
  def dimension(spark: SparkSession, table: String): DataFrame = {
    import spark.implicits._
    all(table).toSeq.toDF("description", "code")
  }
}
