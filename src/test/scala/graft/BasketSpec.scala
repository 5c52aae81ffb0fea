package graft

import graft.operators.Basket

/** Association rules: hand-computed support/confidence/lift, Apriori
  * item pruning before pairs, and duplicate-row collapse. */
class BasketSpec extends SparkSuite {
  import spark.implicits._

  // 4 baskets: {a,b}, {a,b}, {a,c}, {a}; c appears once
  private val rows = Seq(
    (1L, "a"), (1L, "b"),
    (2L, "a"), (2L, "b"),
    (3L, "a"), (3L, "c"),
    (4L, "a"),
    (3L, "a")) // duplicate (basket, item) row — must not inflate counts
    .toDF("bk", "item")

  test("hand-computed measures; both rule directions emitted") {
    val got = Basket.associationRules(rows, "bk", "item", minSupport = 2)
      .select($"ante", $"cons", $"n_ante", $"n_cons", $"n_pair",
        $"confidence", $"lift")
      .as[(String, String, Long, Long, Long, Double, Double)]
      .collect().toSeq.sorted
    // n=4 baskets; a:4, b:2; pair(a,b)=2 → conf(a→b)=2/4, conf(b→a)=2/2,
    // lift both = (2·4)/(4·2) = 1.0
    assert(got == Seq(
      ("a", "b", 4L, 2L, 2L, 0.5, 1.0),
      ("b", "a", 2L, 4L, 2L, 1.0, 1.0)))
  }

  test("min-support prunes infrequent items before any pair survives") {
    val got = Basket.associationRules(rows, "bk", "item", minSupport = 3)
      .count()
    assert(got == 0L) // only 'a' is frequent at 3 — no pairs
    // and at 1, the once-seen 'c' forms pairs with 'a'
    val withC = Basket.associationRules(rows, "bk", "item", minSupport = 1)
      .select($"ante", $"cons").as[(String, String)].collect().toSet
    assert(withC == Set(("a", "b"), ("b", "a"), ("a", "c"), ("c", "a")))
  }
}
