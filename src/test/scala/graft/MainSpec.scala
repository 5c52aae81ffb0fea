package graft

import java.nio.file.Files

import graft.operators.Pipeline

/** CLI dispatch contract (reference BatchUpdate.py:114-136): usage errors,
  * flag-order independence, the un-reviewed-update guard, and one command
  * end-to-end over the golden fixture. */
class MainSpec extends SparkSuite {

  test("parse: fewer than two args is a usage error") {
    assert(Main.parse(Seq.empty) == Left(Main.usage))
    assert(Main.parse(Seq("items.csv")) == Left(Main.usage))
  }

  test("parse: at least one stage flag is required") {
    assert(Main.parse(Seq("items.csv", "--yes")) == Left(Main.usage))
    // unknown tokens are ignored (like the reference's membership tests),
    // so junk alone still fails the stage-flag requirement
    assert(Main.parse(Seq("items.csv", "-x")) == Left(Main.usage))
  }

  test("parse: flag order does not matter, stages always run f->s->u") {
    val Right(cfg) = Main.parse(Seq("items.csv", "-u", "-f", "-s")): @unchecked
    assert(cfg.flags == Pipeline.StageFlags(format = true, split = true, update = true))
    val Right(single) = Main.parse(Seq("items.csv", "-s")): @unchecked
    assert(single.flags == Pipeline.StageFlags(split = true))
  }

  test("parse: dangling option value is a usage error") {
    assert(Main.parse(Seq("items.csv", "-u", "--base-url")) == Left(Main.usage))
    assert(Main.parse(Seq("items.csv", "-u", "--api-key")) == Left(Main.usage))
  }

  test("run: update combined with format/split requires --yes") {
    val Right(cfg) = Main.parse(Seq("items.csv", "-f", "-u")): @unchecked
    val res = Main.run(spark, cfg,
      Some(() => new AlmaConnectorSpec.StubStore))
    assert(res.isLeft)
    assert(res.swap.exists(_.startsWith("Halting processes")))
  }

  test("run: update alone needs a transport") {
    val Right(cfg) = Main.parse(Seq("items.csv", "-u")): @unchecked
    assert(Main.run(spark, cfg).isLeft)
  }

  test("one command over the fixture chains f_/s_/suc_/err_ like the reference") {
    val dir = Files.createTempDirectory("graft-main").toFile.getAbsolutePath
    val src = scala.io.Source.fromInputStream(
      getClass.getResourceAsStream("/alma/fixture.csv"), "UTF-8")
    val content = try src.mkString finally src.close()
    Files.writeString(java.nio.file.Paths.get(s"$dir/items.csv"), content)

    // flags deliberately out of order: the chain is still f -> s -> u
    val Right(cfg) = Main.parse(
      Seq(s"$dir/items.csv", "-u", "-s", "-f", "--yes")): @unchecked
    val Right(res) = Main.run(spark, cfg,
      Some(() => new AlmaConnectorSpec.StubStore)): @unchecked

    assert(res.formatted.contains(s"$dir/f_items.csv"))
    assert(res.split.contains(s"$dir/s_items.csv"))
    assert(res.success.contains(s"$dir/suc_items.csv"))
    assert(res.error.contains(s"$dir/err_items.csv"))

    val suc = graft.sources.CsvStage.read(spark, res.success.get)
    val err = graft.sources.CsvStage.read(spark, res.error.get)
    val total = graft.sources.CsvStage.read(spark, res.split.get).count()
    assert(suc.count() + err.count() == total)
    assert(suc.count() > 0)
  }
}
