package graft

import org.apache.spark.sql.functions.{col, lit}

import graft.model.{AlmaSchema, ColumnRegistry, ColumnSpec}
import graft.operators.{FillStage, FormatStage}

/** P1–P9 unit coverage. */
class FormatFillSpec extends SparkSuite {
  import spark.implicits._

  private def items = Seq(
    ("991", "312", "A title", "extra"),
    ("992", "313", "B title", "junk"))
    .toDF("MMS ID", "Barcode", "title", "Unregistered")

  test("P1/P3: projection drops unregistered columns, adds add-ins") {
    val out = FormatStage(AlmaSchema.default)(items)
    assert(out.columns.toSeq == Seq("MMS ID", "Barcode", "title",
      "Material Type", "Item Policy", "Description",
      "Enum A", "Enum B", "Chron I", "Chron J"))
    assert(!out.columns.contains("Unregistered"))
  }

  test("P2: numeric guard prepends apostrophe; unguard strips it") {
    val out = FormatStage(AlmaSchema.default)(items)
    val row = out.orderBy(col("MMS ID")).head()
    assert(row.getString(0) == "'991")
    assert(row.getString(1) == "'312")
    assert(row.getString(2) == "A title") // 't' flag untouched
    val back = out.select(FormatStage.unguard(col("MMS ID"))).orderBy(col("MMS ID")).head()
    assert(back.getString(0) == "991")
  }

  test("mandatory column missing fails the plan") {
    val bad = Seq(("1", "t")).toDF("Barcode", "title")
    val e = intercept[IllegalArgumentException] {
      FormatStage(AlmaSchema.default)(bad)
    }
    assert(e.getMessage.contains("MMS ID"))
  }

  test("P4: fillBlank only overwrites empty cells") {
    val df = Seq(("", "keep")).toDF("a", "b")
      .union(Seq(("x", "")).toDF("a", "b"))
    val out = FillStage.fillBlank("a", "DEF")(df).collect()
      .map(r => (r.getString(0), r.getString(1))).toSet
    assert(out == Set(("DEF", "keep"), ("x", "")))
  }

  test("P5: overwriteAll replaces every value") {
    val df = Seq("x", "").toDF("a")
    val out = FillStage.overwriteAll("a", "V")(df)
      .collect().map(_.getString(0)).toSet
    assert(out == Set("V"))
  }

  test("applyDefaults rejects values outside the code table") {
    val reg = ColumnRegistry(
      Seq(ColumnSpec("MMS ID")), Seq.empty,
      Seq(ColumnSpec("Material Type", default = Some("Not A Type"))))
    val df = Seq("1").toDF("MMS ID")
    val e = intercept[IllegalArgumentException] {
      FillStage.applyDefaults(reg)(df).collect()
    }
    assert(e.getMessage.contains("Not A Type"))
  }

  test("P6: domain validation notes invalid values via anti-join semantics") {
    val df = Seq(("Book", ""), ("Nonsense", ""))
      .toDF("Material Type", "Notes")
    val out = FillStage.validateDomain(spark, "Material Type")(df)
      .collect().map(r => (r.getString(0), r.getString(1))).toMap
    assert(out("Book") == "")
    assert(out("Nonsense") == "Err: Invalid value for Material Type")
  }

  test("P8: null Pattern/Notes rows route to the error sink, never vanish") {
    val df = Seq(
      ("1", "", "StdMatch"),
      ("2", null, null),
      ("3", "Err: bad", "StdMatch"),
      ("4", "", "N/A"))
      .toDF("id", "Notes", "Pattern")
    val (ok, bad) = FillStage.route(df)
    val okIds = ok.select("id").as[String].collect().toSet
    val badIds = bad.select("id").as[String].collect().toSet
    assert(okIds == Set("1", "2"))
    assert(badIds == Set("3", "4"))
    assert(okIds.size + badIds.size == 4, "three-valued logic must not drop rows")
  }

  test("P6: blank/null values are missing (fillable), not invalid") {
    val df = Seq(("1", "Book"), ("2", ""), ("3", null), ("4", "Scroll"))
      .toDF("id", "Material Type").withColumn("Notes", lit(""))
    val out = FillStage.validateDomain(spark, "Material Type")(df)
      .select(col("id"), col("Notes")).as[(String, String)].collect().toMap
    assert(out("1") == "")
    assert(out("2") == "")
    assert(out("3") == "")
    assert(out("4") == "Err: Invalid value for Material Type")
  }

  test("P7: code translation") {
    import graft.model.CodeTables
    val df = Seq("Bound Issue", "DVD").toDF("Material Type")
    val out = df.select(
      FillStage.translateCode("Material Type", CodeTables.materialType))
      .collect().map(_.getString(0)).toSeq
    assert(out == Seq("ISSBD", "DVD"))
  }

  test("P8/P9/S5: barcode checks, note accumulation, routing") {
    // NB: the i-barcode test inspects the SECOND character
    // (BatchUpdate.py:311, barcode[1]) — so an apostrophe-guarded
    // "'3i..." is NOT flagged; the golden fixture confirms this.
    val df = Seq(
      ("'", ""), ("3i23", ""), ("'3123", ""), ("'3i23", ""),
      ("3i23", "prior"))
      .toDF("Barcode", "Notes")
    val checked = FillStage.barcodeChecks(df)
    val notes = checked.collect()
      .map(r => (r.getString(0), r.getString(1))).toSeq
    assert(notes.contains(("'", "Err: Missing barcode")))
    assert(notes.contains(("3i23", "Err: i-barcode")))
    assert(notes.contains(("'3123", "")))
    assert(notes.contains(("'3i23", ""))) // guard hides the i
    assert(notes.contains(("3i23", "prior; Err: i-barcode")))
    val (ok, err) = FillStage.route(checked)
    assert(ok.count() == 2 && err.count() == 3)
  }
}
