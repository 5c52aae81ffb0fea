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
  * so the pair self-join (an equi-join on the basket key) only ever
  * expands baskets of frequent items; a basket with b surviving items
  * emits b·(b−1) pairs, and the downstream pair count is
  * map-side-combinable. Without the pushdown the join would square the
  * raw basket width. The frequent-item frame scales with the item
  * vocabulary, so it carries NO broadcast hint (AQE sizes it at
  * runtime); the one-row basket total is hint-broadcast per the repo
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
    val b = df.select(col(basketCol).as("__bk"), col(itemCol).as("__item"))
      .distinct()
    val total = b.select(countDistinct(col("__bk")).as("n"))
    val freq = b.groupBy(col("__item"))
      .agg(count(lit(1)).as("n_item"))
      .filter(col("n_item") >= minSupport)
    // Apriori pushdown: only frequent items enter the pair join
    val fb = b.join(freq, Seq("__item"))
    val pairs = fb.select(col("__bk"), col("__item").as("ante"),
        col("n_item").as("n_ante"))
      .join(fb.select(col("__bk"), col("__item").as("cons"),
        col("n_item").as("n_cons")), Seq("__bk"))
      .filter(col("ante") =!= col("cons"))
      .groupBy(col("ante"), col("cons"), col("n_ante"), col("n_cons"))
      .agg(count(lit(1)).as("n_pair"))
      .filter(col("n_pair") >= minSupport)
    pairs.join(broadcast(total))
      .select(col("ante"), col("cons"), col("n_ante"), col("n_cons"),
        col("n_pair"),
        (col("n_pair").cast("double") / col("n_ante")).as("confidence"),
        ((col("n_pair").cast("double") * col("n").cast("double")) /
          (col("n_ante").cast("double") * col("n_cons").cast("double")))
          .as("lift"))
  }
}
