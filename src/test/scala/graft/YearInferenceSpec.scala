package graft

import org.apache.spark.sql.functions.col

import graft.operators.YearInference

/** W2 branch coverage (reference BatchUpdate.py:327-413) on hand-built
  * groups, plus the sequential-vs-windowed divergence case. */
class YearInferenceSpec extends SparkSuite {
  import spark.implicits._

  private def run(
      rows: Seq[(String, String, String)],
      sequential: Boolean): Map[String, (String, String)] = {
    // (mms, barcode, chronI); Description constant so in-group order is
    // driven by the barcode tie-break
    val df = rows.map { case (m, b, c) => (m, b, "t", "d", c, "") }
      .toDF("MMS ID", "Barcode", "title", "Description", "Chron I", "Notes")
    val out =
      if (sequential) YearInference.inferSequential(df)
      else YearInference.inferWindowed(df)
    out.select(col("Barcode"), col("Chron I"), col("Notes")).collect()
      .map(r => r.getString(0) -> (r.getString(1), r.getString(2))).toMap
  }

  private val branchCases = Seq(
    // both neighbors, prev prefix fits: 1996 <= 1997 <= 1998
    (Seq(("a", "1", "1996"), ("a", "2", "97"), ("a", "3", "1998")),
      "2", "1997"),
    // both neighbors, century fallback via neighbor average:
    // prev=2002,next=2004, year=98 -> 1998 (reference fixture case)
    (Seq(("b", "1", "2002"), ("b", "2", "98-99"), ("b", "3", "2004")),
      "2", "1998-99"),
    // next-only with century wrap: ?<'98<2003 -> 1898... reference math:
    // 2003 - 03 - 100 + 98 = 1998
    (Seq(("c", "1", "98"), ("c", "2", "2003")), "1", "1998"),
    // next-only without wrap: ?<'95<1998 -> 1995
    (Seq(("d", "1", "95"), ("d", "2", "1998")), "1", "1995"),
    // prev-only with wrap: 1998<'03<? -> 2003
    (Seq(("e", "1", "1998"), ("e", "2", "03")), "2", "2003"),
    // prev-only without wrap: 1992<'95<? -> 1995
    (Seq(("f", "1", "1992"), ("f", "2", "95")), "2", "1995"),
    // same digits: 1943<'43<? -> 1943
    (Seq(("g", "1", "1943"), ("g", "2", "43")), "2", "1943"),
    // 3-digit year, prev prefix: digits=1
    (Seq(("h", "1", "1996"), ("h", "2", "997"), ("h", "3", "1998")),
      "2", "1997"))

  test("century arithmetic branches (sequential)") {
    branchCases.foreach { case (rows, barcode, want) =>
      val got = run(rows, sequential = true)
      assert(got(barcode)._1 == want, s"rows=$rows")
    }
  }

  test("century arithmetic branches (windowed)") {
    branchCases.foreach { case (rows, barcode, want) =>
      val got = run(rows, sequential = false)
      assert(got(barcode)._1 == want, s"rows=$rows")
    }
  }

  test("no neighbors -> error note, value unchanged") {
    Seq(true, false).foreach { seq =>
      val got = run(Seq(("x", "1", "97")), sequential = seq)
      assert(got("1")._1 == "97")
      assert(got("1")._2 == "Err: Problem interpreting Chron I")
    }
  }

  test("note appends with separator when Notes non-empty") {
    val df = Seq(("x", "1", "t", "d", "97", "Err: i-barcode"))
      .toDF("MMS ID", "Barcode", "title", "Description", "Chron I", "Notes")
    val out = YearInference.inferSequential(df)
      .select(col("Notes")).head().getString(0)
    assert(out == "Err: i-barcode; Err: Problem interpreting Chron I")
  }

  test("rows without leading digits or with 4+ digits are untouched") {
    Seq(true, false).foreach { seq =>
      val got = run(Seq(("y", "1", "1996"), ("y", "2", ""), ("y", "3", "abc"),
        ("y", "4", "12345")), sequential = seq)
      assert(got("2") == ("", ""))
      assert(got("3") == ("abc", ""))
      assert(got("4") == ("12345", ""))
    }
  }

  test("sequential fidelity: later rows see earlier FIXES (divergence case)") {
    // non-monotone group 1950,'60,'55: the reference fixes '60 -> 1960,
    // then '55 sees prev=1960 (60 > 55) -> wrap -> 2055. The windowed
    // variant reads the ORIGINAL prev=1950 (50 < 55) -> 1955.
    val rows = Seq(("z", "1", "1950"), ("z", "2", "60"), ("z", "3", "55"))
    val seqGot = run(rows, sequential = true)
    val winGot = run(rows, sequential = false)
    assert(seqGot("2")._1 == "1960" && winGot("2")._1 == "1960")
    assert(seqGot("3")._1 == "2055") // reference behavior
    assert(winGot("3")._1 == "1955") // documented divergence
  }

  test("group boundaries respected (scan never crosses MMS ID)") {
    Seq(true, false).foreach { seq =>
      val got = run(Seq(("g1", "1", "1996"), ("g2", "2", "97")), sequential = seq)
      assert(got("2")._1 == "97")
      assert(got("2")._2 == "Err: Problem interpreting Chron I")
    }
  }
}
