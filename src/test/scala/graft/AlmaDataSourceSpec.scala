package graft

import org.apache.spark.sql.functions._

import graft.sources.v2.AlmaBatchWrite

/** DataSource V2 connector: `format("alma")` read fan-out and write
  * commit accounting against the stub store. */
class AlmaDataSourceSpec extends SparkSuite {
  import spark.implicits._

  private val stubClass = classOf[AlmaConnectorSpec.StubStore].getName

  test("read: barcodes fan out, statuses and XML come back") {
    val df = spark.read.format("alma")
      .option("storeClass", stubClass)
      .option("barcodes", "100, 200, 404, 300")
      .option("numPartitions", "2")
      .load()
    assert(df.schema.fieldNames.toSeq == Seq("barcode", "http_status", "item_xml"))
    val rows = df.orderBy("barcode")
      .as[(String, Int, String)].collect().toSeq
    assert(rows.map(_._1) == Seq("100", "200", "300", "404"))
    assert(rows.count(_._2 == 200) == 3)
    assert(rows.find(_._1 == "404").get._2 == 404)
    assert(rows.find(_._1 == "100").get._3.contains("<barcode>100</barcode>"))
  }

  test("read: empty barcode list plans zero partitions") {
    val df = spark.read.format("alma")
      .option("storeClass", stubClass)
      .option("barcodes", "")
      .load()
    assert(df.count() == 0L)
  }

  test("write: per-task PUTs aggregate into the commit") {
    val out = Seq(
      ("http://stub/items/1", "<item/>"),
      ("http://stub/items/2", "<item/>"),
      ("http://stub/items/500", "<item/>")) // stub fails urls ending /500
      .toDF("url", "xml")
    out.write.format("alma")
      .option("storeClass", stubClass)
      .mode("append")
      .save()
    assert(AlmaBatchWrite.lastCommitted == ((2L, 1L)))
  }
}
