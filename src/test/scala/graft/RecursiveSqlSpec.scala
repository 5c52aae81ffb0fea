package graft

/** SQL-surface parity for WITH RECURSIVE (Spark 4's UnionLoop): the
  * iterative closure queries the graph family runs as explicit loops
  * ([[graft.functions.Dedup.connectedComponents]] et al.) are also
  * expressible declaratively; this pins that the surface exists and
  * answers a closed-form closure. */
class RecursiveSqlSpec extends SparkSuite {
  import spark.implicits._

  test("WITH RECURSIVE computes a bounded-hop transitive closure over " +
    "a local edge relation") {
    Seq(("a", "b"), ("b", "c"), ("c", "d"))
      .toDF("src", "dst").createOrReplaceTempView("edges_rec_spec")
    val got = spark.sql(
      """WITH RECURSIVE reach(src, dst, hops) AS (
        |  SELECT src, dst, CAST(1 AS BIGINT) AS hops FROM edges_rec_spec
        |  UNION ALL
        |  SELECT r.src, e.dst, r.hops + 1
        |  FROM reach r JOIN edges_rec_spec e ON r.dst = e.src
        |  WHERE r.hops < 3
        |)
        |SELECT src, dst, min(hops) AS min_hops
        |FROM reach GROUP BY src, dst ORDER BY src, dst""".stripMargin)
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2)))
      .toSeq
    assert(got == Seq(
      ("a", "b", 1L), ("a", "c", 2L), ("a", "d", 3L),
      ("b", "c", 1L), ("b", "d", 2L),
      ("c", "d", 1L)))
  }
}
