package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Market-basket association rules: for item pairs that co-occur in at
  * least `minSupport` baskets, the directed rules `ante → cons` with
  * support counts, confidence P(cons|ante), and lift — the Apriori
  * staple (Agrawal & Srikant, VLDB 1994) behind "frequently bought
  * together".
  *
  * Scale shape: the Apriori min-support pushdown happens BEFORE pair
  * generation — baskets are first semi-joined to the frequent-item set,
  * so pair expansion only ever sees baskets of frequent items. Pairs
  * come from the bucket shape (one groupBy collecting each basket's
  * sorted surviving items, sorted-prefix expansion in-bucket — a basket
  * with b surviving items emits b·(b−1)/2 ordered pairs), NOT a basket
  * self-join: the self-join form recomputes the distinct-basket subtree
  * on both sides and shuffles it twice (the README self-join lesson).
  * The (basket, item) frame feeds three consumers (total, frequent
  * items, expansion), so it is materialized once
  * ([[graft.functions.Materialize]]). Pair counts are
  * map-side-combinable; directional rules are the unordered counts
  * emitted both ways, then decorated by two joins against the (item
  * vocabulary)-sized frequency frame — NO broadcast hint (AQE sizes it
  * at runtime); the one-row basket total is hint-broadcast per the repo
  * policy on provably bounded frames.
  *
  * Measures stay engine-exact: all counts are longs; confidence is ONE
  * IEEE division of exact integers; lift is computed as
  * `(n_pair·n) / (n_ante·n_cons)` with both products done in DOUBLE
  * (exactly-rounded IEEE multiplies — portable at any count, where a
  * long product would overflow once both sides pass ~3·10⁹).
  */
object Basket {

  /** @param df        one row per (basket, item) occurrence; duplicates
    *                   are collapsed (support counts baskets, not rows)
    * @param minSupport minimum basket count for an item AND for a pair
    * @return (ante, cons, n_ante, n_cons, n_pair, confidence, lift) */
  def associationRules(
      df: DataFrame,
      basketCol: String,
      itemCol: String,
      minSupport: Long): DataFrame = {
    require(minSupport >= 1, "minSupport must be at least 1")
    val b = graft.functions.Materialize(
      df.select(col(basketCol).as("__bk"), col(itemCol).as("__item"))
        .distinct())
    val total = b.select(countDistinct(col("__bk")).as("n"))
    val freq = b.groupBy(col("__item"))
      .agg(count(lit(1)).as("n_item"))
      .filter(col("n_item") >= minSupport)
    // Apriori pushdown: only frequent items enter pair expansion
    val unordered = b.join(freq.select(col("__item")), Seq("__item"))
      .groupBy(col("__bk"))
      .agg(sort_array(collect_list(col("__item"))).as("items"))
      .select(explode(
        graft.functions.Dedup.sortedPairs(col("items"), "i1", "i2")).as("p"))
      .groupBy(col("p.i1").as("i1"), col("p.i2").as("i2"))
      .agg(count(lit(1)).as("n_pair"))
      .filter(col("n_pair") >= minSupport)
    val directed = unordered
      .select(col("i1").as("ante"), col("i2").as("cons"), col("n_pair"))
      .unionByName(unordered
        .select(col("i2").as("ante"), col("i1").as("cons"), col("n_pair")))
    directed
      .join(freq.select(col("__item").as("ante"), col("n_item").as("n_ante")),
        Seq("ante"))
      .join(freq.select(col("__item").as("cons"), col("n_item").as("n_cons")),
        Seq("cons"))
      .join(broadcast(total))
      .select(col("ante"), col("cons"), col("n_ante"), col("n_cons"),
        col("n_pair"),
        (col("n_pair").cast("double") / col("n_ante")).as("confidence"),
        ((col("n_pair").cast("double") * col("n").cast("double")) /
          (col("n_ante").cast("double") * col("n_cons").cast("double")))
          .as("lift"))
  }
}
