package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.operators.Skew

/** Scale-path mechanics: salted joins match unsalted semantics and spread
  * hot keys; bucketed tables co-locate their join (no shuffle exchange on
  * either side). */
class ScaleSpec extends SparkSuite {
  import spark.implicits._

  test("saltedJoin: inner and left results match the plain join") {
    // key "hot" is 100x skewed
    val skewed = ((1 to 200).map(i => ("hot", i)) ++
      Seq(("a", 1), ("b", 2), ("c", 3), ("orphan", 9)))
      .toDF("k", "v")
    val dim = Seq(("hot", "H"), ("a", "A"), ("b", "B"), ("d", "D"))
      .toDF("k", "attr")

    val plainInner = skewed.join(dim, Seq("k")).orderBy("k", "v")
      .collect().map(_.toSeq).toSeq
    val saltedInner = Skew.saltedJoin(skewed, dim, Seq("k"), salts = 8)
      .orderBy("k", "v").collect().map(_.toSeq).toSeq
    assert(saltedInner == plainInner)

    val plainLeft = skewed.join(dim, Seq("k"), "left").orderBy("k", "v")
      .collect().map(_.toSeq).toSeq
    val saltedLeft = Skew.saltedJoin(skewed, dim, Seq("k"), salts = 8, "left")
      .orderBy("k", "v").collect().map(_.toSeq).toSeq
    assert(saltedLeft == plainLeft)
  }

  test("saltedJoin: single 100%-hot key still joins completely") {
    val skewed = (1 to 1000).map(i => ("hot", i)).toDF("k", "v")
    val dim = Seq(("hot", "H")).toDF("k", "attr")
    assert(Skew.saltedJoin(skewed, dim, Seq("k"), salts = 8).count() == 1000L)
  }

  test("bucketed tables: co-located sort-merge join without exchanges") {
    val wh = Files.createTempDirectory("graft-bucketed").toFile.getAbsolutePath
    val left = (1 to 1000).map(i => (i.toLong, s"l$i")).toDF("id", "lv")
    val right = (1 to 1000).map(i => (i.toLong, s"r$i")).toDF("id", "rv")
    spark.sql(s"CREATE DATABASE IF NOT EXISTS graftbuck LOCATION '$wh'")
    try {
      left.write.format("parquet").bucketBy(8, "id").sortBy("id")
        .mode("overwrite").saveAsTable("graftbuck.bl")
      right.write.format("parquet").bucketBy(8, "id").sortBy("id")
        .mode("overwrite").saveAsTable("graftbuck.br")
      // bucketed scans satisfy the join's distribution: no shuffle
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      try {
        val joined = spark.table("graftbuck.bl")
          .join(spark.table("graftbuck.br"), Seq("id"))
        val plan = joined.queryExecution.executedPlan.toString
        assert(!plan.contains("Exchange hashpartitioning"),
          s"bucketed join still shuffles:\n$plan")
        assert(joined.count() == 1000L)
      } finally spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
    } finally {
      spark.sql("DROP DATABASE IF EXISTS graftbuck CASCADE")
    }
  }
}
