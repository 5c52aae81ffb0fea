package graft

import scala.collection.concurrent.TrieMap

import graft.sources.{AlmaConnector, AlmaXml}

/** S3–S5: XML merge fidelity + the mapPartitions connector against an
  * in-memory stub store. */
class AlmaConnectorSpec extends SparkSuite {
  import spark.implicits._

  private val itemXml =
    """<item link="http://stub/items/42"><item_data>
      |<barcode>312</barcode>
      |<physical_material_type desc="Issue">ISSUE</physical_material_type>
      |</item_data></item>""".stripMargin.replace("\n", "")

  test("XML merge: update-existing and insert-missing paths") {
    val merged = AlmaXml.merge(itemXml, AlmaXml.ItemFields(
      materialType = Some("Bound Issue"),
      itemPolicy = Some("non-circulating"),
      enumA = Some("v.12"), enumB = Some(""),
      chronI = Some("1998"), chronJ = None))
    val xml = scala.xml.XML.loadString(merged)
    val item = xml \ "item_data"
    // existing element updated: text = code, desc attr = display value
    assert((item \ "physical_material_type").text == "ISSBD")
    assert((item \ "physical_material_type").head.attribute("desc").get.text == "Bound Issue")
    // missing elements inserted (policy code-translated too)
    assert((item \ "policy").text == "1")
    assert((item \ "enumeration_a").text == "v.12")
    assert((item \ "chronology_i").text == "1998")
    // blank/None fields NOT touched (BatchUpdate.py:521, :545)
    assert((item \ "enumeration_b").isEmpty)
    assert((item \ "chronology_j").isEmpty)
  }

  test("XML merge preserves attributes of updated elements") {
    // the reference mutates elem.text / elem.set('desc', ...), keeping any
    // other attributes the server sent
    val xml = """<item link="u"><item_data>""" +
      """<enumeration_a internal_id="7">1</enumeration_a>""" +
      """<physical_material_type desc="Issue" keep="x">ISSUE</physical_material_type>""" +
      """</item_data></item>"""
    val merged = AlmaXml.merge(xml, AlmaXml.ItemFields(
      materialType = Some("Book"), itemPolicy = None,
      enumA = Some("2"), enumB = None, chronI = None, chronJ = None))
    assert(merged.contains("""internal_id="7""""), merged)
    assert(merged.contains(">2</enumeration_a>"), merged)
    assert(merged.contains("""keep="x""""), merged)
    assert(merged.contains(">BOOK</physical_material_type>"), merged)
    assert(merged.contains("""desc="Book""""), merged)
  }

  test("update URL read from the root link attribute") {
    assert(AlmaXml.updateUrl(itemXml).contains("http://stub/items/42"))
  }

  test("connector: routing across success / fetch-error / put-error / skips") {
    import AlmaConnectorSpec.StubStore
    val df = Seq(
      // (MMS, Barcode, Material, Policy, EnumA, EnumB, ChronI, ChronJ, Pattern, Notes)
      ("1", "'100", "Bound Issue", "non-circulating", "v.1", "", "1998", "", "StdMatch", ""),
      ("1", "'404", "Bound Issue", "non-circulating", "v.2", "", "1999", "", "StdMatch", ""),
      ("1", "'500", "Bound Issue", "non-circulating", "v.3", "", "2000", "", "StdMatch", ""),
      ("1", "'101", "Bound Issue", "non-circulating", "", "", "", "", "N/A", ""),
      ("1", "'102", "Bound Issue", "non-circulating", "v.4", "", "2001", "", "StdMatch", "Err: i-barcode"))
      .toDF("MMS ID", "Barcode", "Material Type", "Item Policy",
        "Enum A", "Enum B", "Chron I", "Chron J", "Pattern", "Notes")

    val annotated = AlmaConnector.update(df, () => new StubStore).cache()
    val status = annotated.collect()
      .map(r => (r.getString(1), r.getString(annotated.columns.length - 1))).toMap
    assert(status("'100") == "success")
    assert(status("'404") == "error")
    assert(status("'500") == "error")
    assert(status("'101") == "skipped_unmatched")
    assert(status("'102") == "skipped_error")

    val notes = annotated.collect()
      .map(r => (r.getString(1), r.getString(9))).toMap
    assert(notes("'404").contains("Problem fetching item information. Code 404"))
    assert(notes("'500").contains("#Problem with Networking request. Code 500"))

    val (ok, err) = AlmaConnector.routeUpdateResult(annotated)
    assert(ok.count() == 1 && err.count() == 4)
    // the apostrophe guard must be stripped before the fetch
    assert(StubStore.puts.keySet.contains("http://stub/items/100"))
  }
}

object AlmaConnectorSpec {
  /** Serializable stub (top-level so the closure doesn't capture the
    * non-serializable suite instance): records PUTs, fails designated
    * barcodes. Single-JVM only — fine under local[*]. */
  class StubStore extends AlmaConnector.ItemStore with Serializable {
    def fetch(barcode: String): (Int, String) =
      if (barcode == "404") (404, "not found")
      else (200, s"""<item link="http://stub/items/$barcode"><item_data><barcode>$barcode</barcode></item_data></item>""")
    def put(url: String, xml: String): Int = {
      StubStore.puts.put(url, xml)
      if (url.endsWith("/500")) 500 else 200
    }
  }
  object StubStore {
    val puts = new TrieMap[String, String]()
  }
}
