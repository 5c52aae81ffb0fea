package graft

import org.apache.spark.sql.functions.col

import graft.operators.SplitStage

/** End-to-end `split` stage vs the golden produced by executing the
  * reference script on the same fixture (src/test/resources/alma/
  * fixture.csv → s_fixture.csv, generated with BatchUpdate.py -s).
  *
  * The reference preserves the input file's column order and appends
  * add-ins; our SplitStage projects in registry order — so the comparison
  * is by column NAME. Row order must match exactly (W1 natural sort).
  * novBugCompat=true reproduces the reference's Nov→`"` typo
  * (BatchUpdate.py:322), which is why the golden is parsed with the
  * reference's naive comma-split, not a quoting CSV reader. */
class SplitGoldenSpec extends SparkSuite {
  import spark.implicits._

  test("split pipeline reproduces the reference golden byte-for-byte") {
    val (inHeader, inRows) = readNaiveCsv("/alma/fixture.csv")
    val (goldHeader, goldRows) = readNaiveCsv("/alma/s_fixture.csv")

    val input = inRows.map {
      case Seq(a, b, c, d) => (a, b, c, d)
    }.toDF(inHeader: _*)

    val out = SplitStage(input, exactSequentialFidelity = true,
      novBugCompat = true)
    val cols = out.columns
    assert(cols.toSet == goldHeader.toSet,
      s"column sets differ: got ${cols.mkString(",")}")

    val got = out.select(goldHeader.map(col): _*).collect()
      .map(_.toSeq.map(_.asInstanceOf[String]))
    assert(got.length == goldRows.length)
    got.zip(goldRows).zipWithIndex.foreach { case ((g, w), i) =>
      assert(g == w, s"row $i differs\n got=  ${g.mkString(",")}\n want= ${w.mkString(",")}")
    }
  }

  test("windowed variant agrees with sequential on the fixture") {
    val (inHeader, inRows) = readNaiveCsv("/alma/fixture.csv")
    val input = inRows.map { case Seq(a, b, c, d) => (a, b, c, d) }
      .toDF(inHeader: _*)
    val seqOut = SplitStage(input, exactSequentialFidelity = true,
      novBugCompat = true).collect().map(_.toSeq)
    val winOut = SplitStage(input, exactSequentialFidelity = false,
      novBugCompat = true).collect().map(_.toSeq)
    assert(seqOut.toSeq == winOut.toSeq)
  }
}
