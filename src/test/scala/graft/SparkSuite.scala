package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** One shared local session for the whole test run. */
object SparkSuite {
  lazy val spark: SparkSession = {
    val s = SparkSession.builder()
      .withExtensions(new GraftExtensions)
      .master("local[4]")
      .appName("graft-test")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    s
  }
}

trait SparkSuite extends AnyFunSuite {
  lazy val spark: SparkSession = SparkSuite.spark

  /** Naive comma-split reader matching the reference's CSV dialect
    * (BatchUpdate.py:762-780) — the golden files contain a raw `"` (the
    * reference's Nov typo), which a quoting CSV parser would mangle. */
  def readNaiveCsv(resource: String): (Seq[String], Seq[Seq[String]]) = {
    val src = scala.io.Source.fromInputStream(
      getClass.getResourceAsStream(resource), "UTF-8")
    val lines = try src.getLines().toList finally src.close()
    (lines.head.split(",", -1).toSeq,
      lines.tail.map(_.split(",", -1).toSeq))
  }
}
