package graft

import graft.functions.Description

/** R1 against the reference-derived corpus: every (description → fields)
  * expectation in desc_corpus.psv was produced by executing the reference's
  * `_matchDescriptions` (BatchUpdate.py:684-760) over the corpus. */
class DescriptionSpec extends SparkSuite {

  private def corpus: Seq[(String, Description.Parsed)] = {
    val src = scala.io.Source.fromInputStream(
      getClass.getResourceAsStream("/alma/desc_corpus.psv"), "UTF-8")
    val lines = try src.getLines().toList finally src.close()
    lines.map { l =>
      val p = l.split("\\|", -1)
      (p(0), Description.Parsed(p(1), p(2), p(3), p(4), p(5)))
    }
  }

  private def assigned(p: Description.Parsed): Description.Parsed =
    // the psv expectations were produced with empty starting cells, where
    // "not assigned" (null) and "assigned empty" both read back as ""
    Description.Parsed(
      Option(p.enumA).getOrElse(""), Option(p.enumB).getOrElse(""),
      Option(p.chronI).getOrElse(""), Option(p.chronJ).getOrElse(""),
      p.pattern)

  test("R1 parse matches the reference on the whole corpus") {
    corpus.foreach { case (desc, expected) =>
      val got = assigned(Description.parse(desc))
      assert(got == expected, s"for description '$desc'")
    }
  }

  test("R1 preserves existing cells for non-participating groups") {
    import spark.implicits._
    import org.apache.spark.sql.functions.col
    val df = Seq(
      ("v.3", "1998", "keepJ"),          // StdMatch, chron section absent
      ("junk text", "1997", "alsoKeep"), // no match at all
      ("v.4 (1999)", "x", "y"))          // chron participates: overwritten
      .toDF("Description", "Chron I", "Chron J")
    val out = Description.withParsedDescription(df)
      .select(col("Description"), col("Chron I"), col("Chron J"), col("Pattern"))
      .as[(String, String, String, String)].collect()
      .map(r => r._1 -> ((r._2, r._3, r._4))).toMap
    assert(out("v.3") == (("1998", "keepJ", "StdMatch")))
    assert(out("junk text") == (("1997", "alsoKeep", "N/A")))
    assert(out("v.4 (1999)") == (("1999", "", "StdMatch")))
  }

  test("R1 null-safety") {
    assert(Description.parse(null).pattern == "N/A")
    assert(Description.parse("").pattern == "N/A")
  }

  test("R1 as a Column over a DataFrame") {
    import spark.implicits._
    val df = corpus.map(_._1).toDF("Description")
    val got = Description.withParsedDescription(df)
      .select("Description", "Enum A", "Enum B", "Chron I", "Chron J", "Pattern")
      .collect()
      .map(r => (r.getString(0), Description.Parsed(
        r.getString(1), r.getString(2), r.getString(3), r.getString(4), r.getString(5))))
      .toMap
    corpus.foreach { case (desc, expected) =>
      assert(got(desc) == expected, s"for description '$desc'")
    }
  }

  test("R1 native expression agrees with the scala UDF, incl. nulls and SQL") {
    import spark.implicits._
    val df = (corpus.map(_._1) :+ null).toDF("Description")
    val native = df
      .select(Description.parseDescription($"Description").as("p"))
      .select("p.enumA", "p.enumB", "p.chronI", "p.chronJ", "p.pattern")
      .collect().map(_.toSeq).toSeq
    val viaUdf = df.select(Description.parseUdf($"Description").as("p"))
      .select("p.enumA", "p.enumB", "p.chronI", "p.chronJ", "p.pattern")
      .collect().map(_.toSeq).toSeq
    assert(native == viaUdf)

    GraftExtensions.register(spark)
    val sql = spark.sql(
      "SELECT parse_description('v.3 no.2 (Oct 1998)') AS p")
      .select("p.enumA", "p.chronI", "p.chronJ", "p.pattern")
      .collect().head.toSeq
    assert(sql == Seq("v.3", "1998", "Oct ", "StdMatch"))
  }

  test("R3 natural-sort keys: v2 < v10, series prefix, missing -> 0") {
    import spark.implicits._
    val df = Seq("v.2 (1999)", "v.10 (1999)", "ser.3 v.1", "no vol").toDF("d")
    val keys = df.select(
      Description.seriesKey($"d").as("s"),
      Description.volumeKey($"d").as("v")).collect()
      .map(r => (r.getInt(0), r.getInt(1)))
    assert(keys.toSeq == Seq((0, 2), (0, 10), (3, 1), (0, 0)))
  }

  test("R2 month canonicalization: faithful chain incl. lookahead") {
    import org.apache.spark.sql.functions.col
    import spark.implicits._
    val cases = Seq(
      "january-february" -> "Jan-Feb",
      "SEPT./october" -> "Sep./Oct",
      "winter" -> "Win",
      "spring-summer" -> "Spr-Sum",
      "june, nov. and december" -> "Jun, Nov. and Dec",
      "autumn" -> "Fal",
      // the lookahead guards: august is a month, author is not Fall
      "august" -> "Aug",
      "author" -> "author")
    val df = cases.map(_._1).toDF("cj")
    val got = df.select(col("cj"),
      Description.canonicalizeChronJ(col("cj")).as("out")).collect()
      .map(r => r.getString(0) -> r.getString(1)).toMap
    cases.foreach { case (in, want) => assert(got(in) == want, s"for '$in'") }
  }

  test("R2 novBugCompat reproduces the reference's Nov typo") {
    import org.apache.spark.sql.functions.{col, lit}
    val df = spark.range(1).select(lit("Nov-Jan").as("cj"))
    val got = df.select(
      Description.canonicalizeChronJ(col("cj"), novBugCompat = true))
      .head().getString(0)
    assert(got == "\"-Jan") // BatchUpdate.py:322 replaces Nov with `"`
  }
}
