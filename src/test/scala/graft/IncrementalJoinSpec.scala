package graft

import graft.operators.IncrementalJoin

/** The join-maintenance identity and its scale plan: old ∪ joinDelta ==
  * full recompute, with the base tables never shuffling. */
class IncrementalJoinSpec extends SparkSuite {
  import spark.implicits._

  private val a = Seq((1L, "a1"), (1L, "a2"), (2L, "a3"), (3L, "a4"),
    (5L, "a5")).toDF("k", "av")
  private val da = Seq((1L, "a6"), (4L, "a7")).toDF("k", "av")
  private val b = Seq((1L, "b1"), (2L, "b2"), (4L, "b3")).toDF("k", "bv")
  private val db = Seq((1L, "b4"), (3L, "b5")).toDF("k", "bv")

  test("old join ∪ joinDelta equals the full recompute, bag semantics") {
    val maintained = a.join(b, Seq("k"))
      .unionByName(IncrementalJoin.joinDelta(a, da, b, db, Seq("k")))
    val full = a.unionByName(da).join(b.unionByName(db), Seq("k"))
    // bag equality: sort both and compare row lists (duplicates matter —
    // key 1 fans out 3×2)
    val m = maintained.orderBy($"k", $"av", $"bv").collect().toSeq
    val f = full.orderBy($"k", $"av", $"bv").collect().toSeq
    assert(m == f)
    assert(m.count(_.getLong(0) == 1L) == 6, "key 1 must fan out 3x2")
  }

  test("delta terms plan as broadcast joins; the base tables never " +
    "shuffle for maintenance") {
    // disable AQE-side auto-broadcast so the pin tests the operator's
    // OWN hints, not a size estimate that disappears at 100 TB
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val delta = IncrementalJoin.joinDelta(a, da, b, db, Seq("k"))
      val plan = delta.queryExecution.executedPlan.toString
      assert(!plan.contains("Exchange hashpartitioning"),
        s"maintenance shuffled a base table:\n$plan")
      assert("BroadcastHashJoin".r.findAllIn(plan).size == 3,
        s"expected all three delta terms as broadcast joins:\n$plan")
    } finally spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
  }

  test("colliding non-key columns fail loudly") {
    val e = intercept[IllegalArgumentException] {
      IncrementalJoin.joinDelta(a, da,
        b.withColumnRenamed("bv", "av"),
        db.withColumnRenamed("bv", "av"), Seq("k"))
    }
    assert(e.getMessage.contains("both sides"))
  }

  test("mismatched base/delta schemas fail loudly") {
    intercept[IllegalArgumentException] {
      IncrementalJoin.joinDelta(a, da.withColumnRenamed("av", "x"),
        b, db, Seq("k"))
    }
  }
}
