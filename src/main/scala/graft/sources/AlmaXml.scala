package graft.sources

import scala.xml.{Elem, Node, Text, XML}

import graft.model.CodeTables

/** Pure XML merge for the Alma item payload (reference:
  * BatchUpdate.py:484-553). Given the fetched item XML and the row's
  * fields, update-or-insert each child of `item_data`:
  *
  *   - `physical_material_type` — text = code, `desc` attr = display value
  *     (code translated via the Material Type code table, :499-505)
  *   - `policy` — likewise via the Item Policy table (:507-518)
  *   - `enumeration_a/b`, `chronology_i/j` — text only, and ONLY when the
  *     row value is non-empty (:520-550)
  *
  * Pure function (no I/O) so it unit-tests without a server and runs
  * inside executors without shared state.
  */
object AlmaXml {

  final case class ItemFields(
      materialType: Option[String],
      itemPolicy: Option[String],
      enumA: Option[String],
      enumB: Option[String],
      chronI: Option[String],
      chronJ: Option[String])

  private def nonBlank(v: Option[String]): Option[String] =
    v.filter(s => s != null && s.nonEmpty)

  /** Update-or-insert one child element under item_data. An EXISTING
    * element keeps its other attributes — the reference mutates via
    * `elem.text = ...` / `elem.set('desc', ...)` (BatchUpdate.py:503-505),
    * which preserves whatever attributes the server sent; replacing the
    * element wholesale would silently strip them from the PUT body. */
  private def upsert(
      itemData: Elem,
      tag: String,
      text: String,
      desc: Option[String]): Elem = {
    val attr = desc.map(d =>
      scala.xml.Attribute(None, "desc", Text(d), scala.xml.Null))
    def withDesc(e: Elem): Elem = attr.map(e % _).getOrElse(e)
    val existing = (itemData \ tag).headOption
    val children =
      if (existing.isDefined)
        itemData.child.map {
          case e: Elem if e.label == tag => withDesc(e.copy(child = Text(text)))
          case n => n
        }
      else itemData.child :+ withDesc(
        Elem(null, tag, scala.xml.Null, scala.xml.TopScope,
          minimizeEmpty = false, Text(text)))
    itemData.copy(child = children)
  }

  /** Parse once; pass the Elem to [[merge]] and [[updateUrl]] so the hot
    * path doesn't DOM-parse the same payload twice. */
  def parse(fetchedXml: String): Elem = XML.loadString(fetchedXml)

  /** Merge row fields into the fetched item XML, returning the PUT body. */
  def merge(fetchedXml: String, fields: ItemFields): String =
    merge(parse(fetchedXml), fields)

  def merge(root: Elem, fields: ItemFields): String = {
    val itemData = (root \ "item_data").headOption match {
      case Some(e: Elem) => e
      case _ => throw new IllegalArgumentException("item_data element missing")
    }
    var updated: Elem = itemData

    nonBlank(fields.materialType).foreach { v =>
      updated = upsert(updated, "physical_material_type",
        CodeTables.materialType.getOrElse(
          v, throw new NoSuchElementException(s"Unknown Material Type '$v'")),
        Some(v))
    }
    nonBlank(fields.itemPolicy).foreach { v =>
      updated = upsert(updated, "policy",
        CodeTables.itemPolicy.getOrElse(
          v, throw new NoSuchElementException(s"Unknown Item Policy '$v'")),
        Some(v))
    }
    nonBlank(fields.enumA).foreach(v => updated = upsert(updated, "enumeration_a", v, None))
    nonBlank(fields.enumB).foreach(v => updated = upsert(updated, "enumeration_b", v, None))
    nonBlank(fields.chronI).foreach(v => updated = upsert(updated, "chronology_i", v, None))
    nonBlank(fields.chronJ).foreach(v => updated = upsert(updated, "chronology_j", v, None))

    val newRoot = root.copy(child = root.child.map {
      case c: Elem if c.label == "item_data" => updated
      case n => n
    })
    newRoot.toString()
  }

  /** The update URL Alma supplies on the root's `link` attribute
    * (BatchUpdate.py:487). */
  def updateUrl(fetchedXml: String): Option[String] =
    updateUrl(parse(fetchedXml))

  def updateUrl(root: Elem): Option[String] =
    root.attribute("link").map(_.text)
}
