package graft.operators

import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import org.scalatest.funsuite.AnyFunSuite

import graft.functions.Description

/** Property-based invariants (SURVEY.md §5.3) over generated inputs:
  * description-grammar sentences plus junk parse to exactly one outcome,
  * natural-sort keys order numerically, and the year-inference result
  * respects its neighbor bounds. All properties exercise the same pure
  * Scala the catalyst expressions call, so hundreds of cases run
  * sub-second with no Spark jobs. */
class PropertySpec extends AnyFunSuite {

  private def forSamples[A](gen: Gen[A], n: Int = 300)(f: A => Unit): Unit =
    (0 until n).foreach { i =>
      gen(Gen.Parameters.default, Seed(i.toLong)).foreach(f)
    }

  // ---- generators over the reference grammars ------------------------

  private val genVol = Gen.choose(0, 120)
  private val genNo = Gen.choose(0, 30)
  private val genYear4 = Gen.choose(1800, 2099)
  private val genYear2 = Gen.choose(0, 99).map(y => f"$y%02d")
  private val genMonth = Gen.oneOf(
    "Jan", "Feb", "Mar", "Apr", "May", "Jun", "Jul", "Aug",
    "Sep", "Oct", "Nov", "Dec", "Spring", "Summer", "Fall", "Winter")

  private val genStd: Gen[String] = for {
    v <- genVol; n <- genNo; m <- genMonth; y <- genYear4
  } yield s"v.$v no.$n ($m $y)"

  private val genYbm: Gen[String] = for {
    v <- genVol; y <- genYear4; m <- genMonth
  } yield s"vol $v ($y $m)"

  private val genSplit: Gen[String] = for {
    v <- genVol; m1 <- genMonth; m2 <- genMonth
    y1 <- genYear2; y2 <- genYear2
  } yield s"v.$v ($m1 $y1-$m2 $y2)"

  private val genJunk: Gen[String] = Gen.oneOf(
    Gen.alphaStr.map("x" + _), // never starts with ser/vol
    Gen.const(""),
    Gen.numStr.map("(" + _))

  test("R1: every generated description yields exactly one outcome") {
    forSamples(Gen.oneOf(genStd, genYbm, genSplit, genJunk)) { desc =>
      val p = Description.parse(desc)
      val named = Seq("StdMatch", "YearBeforeMonth", "SplitYears")
      assert(named.contains(p.pattern) || p.pattern == "N/A", s"'$desc' -> $p")
      if (p.pattern == "N/A")
        // no-match assigns nothing: all fields null (preserve-existing)
        assert(p == Description.Parsed(null, null, null, null, "N/A"),
          s"'$desc' -> $p")
    }
  }

  test("R1: grammar sentences parse with consistent chronology fields") {
    forSamples(genStd) { d =>
      val p = Description.parse(d)
      assert(p.pattern == "StdMatch", s"'$d' -> $p")
      assert(p.chronI.matches("\\d{4}"), s"'$d' -> $p")
    }
    forSamples(genYbm) { d =>
      val p = Description.parse(d)
      assert(p.pattern == "YearBeforeMonth", s"'$d' -> $p")
      assert(p.chronI.matches("\\d{4}"), s"'$d' -> $p")
      assert(p.chronJ.nonEmpty, s"'$d' -> $p")
    }
    forSamples(genSplit) { d =>
      val p = Description.parse(d)
      // two-digit split years: StdMatch can't take "98-Feb", SplitYears wins
      assert(p.pattern == "SplitYears", s"'$d' -> $p")
      assert(p.chronI.matches("\\d{2}-\\d{2}"), s"'$d' -> $p")
      assert(p.chronJ.contains("-"), s"'$d' -> $p")
    }
  }

  test("R3: volume keys order numerically for every pair") {
    val volOf = (s: String) =>
      Description.volPattern.r.findFirstMatchIn(s)
        .flatMap(m => Option(m.group(2))).map(_.toInt).getOrElse(0)
    forSamples(Gen.zip(genVol, genVol)) { case (a, b) =>
      val va = volOf(s"v.$a no.1"); val vb = volOf(s"v.$b no.1")
      assert(va == a && vb == b)
      assert((va < vb) == (a < b))
    }
  }

  test("W2: inferred year respects neighbor bounds / stays near the average") {
    val gen = for {
      prev <- Gen.choose(1850, 2050)
      span <- Gen.choose(0, 30)
      y2 <- Gen.choose(0, 99)
    } yield (prev, prev + span, f"$y2%02d")
    forSamples(gen) { case (prev, next, y2) =>
      val fixed = YearInference.fixChronI(y2, y2, prev.toString, next.toString)
      assert(fixed != null)
      val v = fixed.toInt
      val cand1 = (prev.toString.take(2) + y2).toInt
      val cand2 = (next.toString.take(2) + y2).toInt
      if ((prev <= cand1 && cand1 <= next) || (prev <= cand2 && cand2 <= next))
        assert(prev <= v && v <= next, s"'$y2' in [$prev,$next] -> $v")
      else {
        val avg = (prev + next) / 2.0
        assert(math.abs(avg - v) <= 100.0, s"'$y2' in [$prev,$next] -> $v")
      }
    }
  }

  test("W2: one-sided inference reproduces the reference arithmetic") {
    forSamples(Gen.zip(Gen.choose(1850, 2050), Gen.choose(0, 99))) {
      case (next, y2i) =>
        val y2 = f"$y2i%02d"
        val nd = next % 100
        val expect = if (y2i > nd) next - nd - 100 + y2i else next - nd + y2i
        assert(YearInference.fixChronI(y2, y2, null, next.toString) ==
          expect.toString)
        val pd = next % 100 // reuse as prev's low digits
        val expectP = if (pd > y2i) next - pd + 100 + y2i else next - pd + y2i
        assert(YearInference.fixChronI(y2, y2, next.toString, null) ==
          expectP.toString)
    }
  }
}
