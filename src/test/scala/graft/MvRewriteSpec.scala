package graft

import java.nio.file.Files

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._

import graft.operators.IncrementalAgg
import graft.plans.MvRewrite

/** MV redirection ([[MvRewrite]]): a plain aggregate over the registered
  * base table is rewritten to re-aggregate the IncrementalAgg state
  * frame — same rows, same types, base never scanned — and every
  * soundness guard (filters, doubles, DISTINCT, unregistered paths,
  * conf kill-switch) leaves the plan alone. */
class MvRewriteSpec extends SparkSuite {
  import spark.implicits._

  private lazy val root = Files.createTempDirectory("graft-mv").toString
  private lazy val factPath = s"$root/fact"
  private lazy val mvPath = s"$root/mv"

  /** Fact table: 1000 rows, long measure, two keys. */
  private lazy val setUp: Unit = {
    (1 to 1000).map(i =>
      (i.toLong, i.toLong % 7, s"t${i % 3}", (i * 13 % 101).toLong))
      .toDF("event_id", "user_id", "event_type", "cents")
      .write.mode("overwrite").parquet(factPath)
    IncrementalAgg.aggregate(spark.read.parquet(factPath),
      keys = Seq("user_id", "event_type"), sums = Seq("cents"),
      mins = Seq("cents"), maxes = Seq("cents"))
      .write.mode("overwrite").parquet(mvPath)
    MvRewrite.install(spark)
    MvRewrite.register(spark, factPath, mvPath,
      keys = Seq("user_id", "event_type"), sums = Seq("cents"),
      mins = Seq("cents"), maxes = Seq("cents"))
  }

  private def fact = { setUp; spark.read.parquet(factPath) }

  private def scannedPaths(df: DataFrame): Seq[String] =
    df.queryExecution.optimizedPlan.collectLeaves().collect {
      case r: org.apache.spark.sql.execution.datasources.LogicalRelation =>
        r.relation match {
          case fs: org.apache.spark.sql.execution.datasources.HadoopFsRelation =>
            fs.location.rootPaths.map(_.toUri.getPath)
          case _ => Nil
        }
    }.flatten

  private def q(df: DataFrame): DataFrame =
    df.groupBy($"user_id", $"event_type")
      .agg(count(lit(1)).as("n"), sum($"cents").as("s"),
        min($"cents").as("mn"), max($"cents").as("mx"))

  test("exact-key aggregate is redirected to the MV and returns the " +
    "base aggregate's rows with preserved types") {
    val redirected = q(fact)
    assert(scannedPaths(redirected).exists(_.contains("/mv")),
      s"plan still scans the base:\n${redirected.queryExecution.optimizedPlan}")
    assert(!scannedPaths(redirected).exists(_.contains("/fact")))

    // ground truth computed with the rewrite disabled
    spark.conf.set("spark.graft.mv.rewrite", "false")
    val want =
      try q(spark.read.parquet(factPath)).collect().toSeq
        .map(r => (r.getLong(0), r.getString(1), r.getLong(2),
          r.getLong(3), r.getLong(4), r.getLong(5))).sorted
      finally spark.conf.unset("spark.graft.mv.rewrite")
    val got = redirected.collect().toSeq
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2),
        r.getLong(3), r.getLong(4), r.getLong(5))).sorted
    assert(got == want)
  }

  test("key-subset aggregate ROLLS UP over the MV (counts sum n_rows, " +
    "mins re-min) and an orderBy above it still resolves") {
    val rolled = fact.groupBy($"user_id")
      .agg(count(lit(1)).as("n"), sum($"cents").as("s"),
        min($"cents").as("mn"), max($"cents").as("mx"))
      .orderBy($"user_id")
    assert(scannedPaths(rolled).exists(_.contains("/mv")))
    spark.conf.set("spark.graft.mv.rewrite", "false")
    val want =
      try spark.read.parquet(factPath).groupBy($"user_id")
        .agg(count(lit(1)).as("n"), sum($"cents").as("s"),
          min($"cents").as("mn"), max($"cents").as("mx"))
        .orderBy($"user_id").collect().toSeq
      finally spark.conf.unset("spark.graft.mv.rewrite")
    assert(rolled.collect().toSeq == want)
  }

  test("soundness guards: filter, untracked measure, DISTINCT, computed " +
    "grouping, and the conf kill-switch all leave the base scan alone") {
    def scansBase(df: DataFrame): Boolean =
      scannedPaths(df).exists(_.contains("/fact"))
    // a filter over a MEASURE between aggregate and scan (key-only
    // filters rewrite — see the dedicated filter test)
    assert(scansBase(fact.filter($"cents" > 50)
      .groupBy($"user_id", $"event_type").agg(sum($"cents"))))
    // event_id is not a tracked sum
    assert(scansBase(fact.groupBy($"user_id", $"event_type")
      .agg(sum($"event_id"))))
    // DISTINCT aggregates have no state algebra
    assert(scansBase(fact.groupBy($"user_id", $"event_type")
      .agg(countDistinct($"cents"))))
    // computed grouping key
    assert(scansBase(fact.groupBy(($"user_id" % 2).as("p"), $"event_type")
      .agg(sum($"cents"))))
    // kill-switch
    spark.conf.set("spark.graft.mv.rewrite", "false")
    try assert(scansBase(q(fact)))
    finally spark.conf.unset("spark.graft.mv.rewrite")
  }

  test("MV-key filters between aggregate and scan rewrite to a filter " +
    "on the state frame; measure/mixed/non-deterministic filters refuse") {
    def scansBase(df: DataFrame): Boolean =
      scannedPaths(df).exists(_.contains("/fact"))
    def expected(df: DataFrame): Seq[Row] = {
      spark.conf.set("spark.graft.mv.rewrite", "false")
      try df.collect().toSeq
      finally spark.conf.unset("spark.graft.mv.rewrite")
    }
    def sorted(rs: Seq[Row]): Seq[String] = rs.map(_.toString).sorted
    // WHERE over both keys: rewrites, and answers match the base compute
    val both = fact.filter($"user_id" < 3 && $"event_type" =!= "t1")
      .groupBy($"user_id", $"event_type")
      .agg(count(lit(1)).as("n"), sum($"cents").as("s"))
    assert(!scansBase(both) && scannedPaths(both).exists(_.contains("/mv")),
      s"key-only filter did not redirect:\n${both.queryExecution.optimizedPlan}")
    assert(sorted(both.collect().toSeq) == sorted(expected(both)))
    // filter on the key the query does NOT group by: rolls up + filters
    val roll = fact.filter($"event_type" === "t2")
      .groupBy($"user_id").agg(sum($"cents").as("s"))
    assert(!scansBase(roll), "non-grouped MV-key filter must still rewrite")
    assert(sorted(roll.collect().toSeq) == sorted(expected(roll)))
    // HAVING-style filter ABOVE the aggregate: the optimizer pushes it
    // below, so it rides the same path
    val having = q(fact).filter($"user_id" === 1L)
    assert(!scansBase(having))
    assert(sorted(having.collect().toSeq) == sorted(expected(having)))
    // a predicate touching a measure — even OR-ed with a key — refuses
    assert(scansBase(fact.filter($"user_id" < 3 || $"cents" > 50)
      .groupBy($"user_id", $"event_type").agg(sum($"cents"))))
    // non-deterministic predicates keep their per-row semantics
    assert(scansBase(fact.filter($"user_id" > rand() * 2)
      .groupBy($"user_id", $"event_type").agg(sum($"cents"))))
  }

  test("deregister restores the base scan") {
    MvRewrite.register(spark, s"$root/other", mvPath,
      keys = Seq("user_id", "event_type"))
    MvRewrite.deregister(s"$root/other")
    val d = fact.groupBy($"user_id", $"event_type").agg(sum($"cents"))
    assert(scannedPaths(d).exists(_.contains("/mv")),
      "original registration must survive unrelated deregistration")
  }

  test("refresh lifecycle: a delta appends to the fact, the MV absorbs " +
    "it by merge (no fact rescan), and the re-registered view answers " +
    "the full recompute") {
    val fact2 = s"$root/fact2"
    val mvA = s"$root/mv_a"
    val mvB = s"$root/mv_b"
    val all = (1 to 1000).map(i =>
      (i.toLong, i.toLong % 7, s"t${i % 3}", (i * 13 % 101).toLong))
      .toDF("event_id", "user_id", "event_type", "cents")
    val keys = Seq("user_id", "event_type")
    all.filter($"event_id" % 4 =!= 0)
      .write.mode("overwrite").parquet(fact2)
    IncrementalAgg.aggregate(spark.read.parquet(fact2), keys,
      sums = Seq("cents"), mins = Seq("cents"), maxes = Seq("cents"))
      .write.mode("overwrite").parquet(mvA)
    val delta = all.filter($"event_id" % 4 === 0)
    delta.write.mode("append").parquet(fact2)
    IncrementalAgg.merge(
      IncrementalAgg.loadState(spark, mvA, keys, sums = Seq("cents"),
        mins = Seq("cents"), maxes = Seq("cents")),
      IncrementalAgg.aggregate(delta, keys, sums = Seq("cents"),
        mins = Seq("cents"), maxes = Seq("cents")),
      keys, sums = Seq("cents"), mins = Seq("cents"), maxes = Seq("cents"))
      .write.mode("overwrite").parquet(mvB)
    MvRewrite.install(spark)
    MvRewrite.register(spark, fact2, mvB, keys, sums = Seq("cents"),
      mins = Seq("cents"), maxes = Seq("cents"))
    try {
      val served = q(spark.read.parquet(fact2))
      assert(scannedPaths(served).exists(_.contains("/mv_b")),
        s"refresh not redirected:\n${served.queryExecution.optimizedPlan}")
      val expect = q(all).orderBy($"user_id", $"event_type")
        .collect().toSeq
      assert(served.orderBy($"user_id", $"event_type").collect().toSeq
        == expect)
    } finally MvRewrite.deregister(fact2)
  }
}
