package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions.broadcast

/** Incremental view maintenance for inner equi-joins — the join-side
  * sibling of [[IncrementalAgg]]: keep the materialized join `J = A ⋈ B`
  * current under append deltas WITHOUT re-joining the base tables.
  *
  * The algebra is the classic bilinear expansion: with `A' = A ∪ ΔA`
  * and `B' = B ∪ ΔB` (all four pairwise disjoint on their rows),
  *
  *   `A' ⋈ B'  =  (A ⋈ B)  ∪  ΔA ⋈ B  ∪  A ⋈ ΔB  ∪  ΔA ⋈ ΔB`
  *
  * so the maintenance step is [[joinDelta]] (the three delta terms)
  * unioned onto the stored `J`. Nothing here is approximate — for
  * bag-semantics inner joins the identity is exact, which is what the
  * oracle row checks against a full recompute.
  *
  * The 100-TB contract: deltas are small BY DEFINITION (a day's
  * arrivals against years of history), so both delta sides carry an
  * explicit `broadcast()` hint — the three delta terms then plan as
  * broadcast-hash joins over ONE scan each of the base tables and the
  * base tables never shuffle (`IncrementalJoinSpec` pins the plan: no
  * Exchange on either base side). Combined with partition pruning on
  * the stored `J` (append-only union) the daily cost is two pruned
  * base scans, not a 100-TB shuffle. Retractions are out of scope for
  * the same reason they are in [[IncrementalAgg]]: deleting a base row
  * needs the matching join rows identified, which is a keyed anti-join
  * on `J` — the caller's one-liner, not a rescan.
  */
object IncrementalJoin {

  /** The three delta terms of `A' ⋈ B'` (see object doc): every join
    * row involving at least one delta row, exactly once. `keys` are the
    * equi-join columns shared by both sides; all other column names
    * must be disjoint between A and B (the usual pre-aliasing contract,
    * enforced loudly). */
  def joinDelta(
      baseA: DataFrame,
      deltaA: DataFrame,
      baseB: DataFrame,
      deltaB: DataFrame,
      keys: Seq[String]): DataFrame = {
    require(keys.nonEmpty, "joinDelta needs at least one join key")
    require(baseA.columns.sameElements(deltaA.columns),
      "baseA and deltaA must share a schema")
    require(baseB.columns.sameElements(deltaB.columns),
      "baseB and deltaB must share a schema")
    val overlap = (baseA.columns.toSet & baseB.columns.toSet) -- keys
    require(overlap.isEmpty,
      s"non-key columns ${overlap.toSeq.sorted.mkString(", ")} appear on " +
        "both sides — alias them before maintenance or the union is ambiguous")
    broadcast(deltaA).join(baseB, keys)
      .unionByName(baseA.join(broadcast(deltaB), keys))
      .unionByName(broadcast(deltaA).join(deltaB, keys))
  }
}
