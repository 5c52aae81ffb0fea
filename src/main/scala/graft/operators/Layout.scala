package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Data-layout clustering for multi-dimensional scan pruning: Z-order
  * (Morton) interleaving maps two key columns onto one dimension so that
  * rows close in BOTH keys land in the same file/partition. Range
  * pruning on a single sort key serves only that key; a Z-ordered
  * layout lets min/max file statistics prune selective predicates on
  * EITHER of the interleaved keys — the standard layout optimization a
  * 100-TB table runs before writing (the OPTIMIZE ZORDER pattern of the
  * lakehouse table formats, expressed here as plain Spark).
  *
  * The Z-value is pure integer arithmetic — bit k of each key moves to
  * bit 2k / 2k+1 via `(x div 2^k) mod 2 · 4^k` terms — so it is exact,
  * portable (same truncating arithmetic in any engine), and
  * codegen-friendly (a fixed sum of ~2·bits multiply-adds, no UDF, no
  * loop). Keys are first masked into the `bits`-bit range: callers pick
  * `bits` to cover their key domain (21 bits each → the interleave
  * fills 42 of the 63 positive long bits).
  */
object Layout {

  /** The Morton interleave of two integer keys: bit k of `x` lands at
    * position 2k, bit k of `y` at 2k+1. Keys are reduced into
    * [0, 2^bits) first via `pmod` — NOT `%`, whose Spark semantics keep
    * the sign of the dividend: a negative key under `%` would stay
    * negative and the shift/mask terms would then interleave garbage
    * silently. With `pmod` a negative key wraps into the valid range,
    * so ordering across the sign boundary is modular rather than
    * monotone — callers with genuinely signed domains should size
    * `bits` past the magnitude and pre-offset if they need monotone
    * order. (Callers size `bits` to the key domain — the reduction only
    * guards against overflow, it is not a hash.) */
  def zValue2(x: Column, y: Column, bits: Int = 21): Column =
    zValueN(Seq(x, y), bits)

  /** The N-dimensional Morton interleave: bit k of key i lands at
    * position N·k + i, so every key contributes equally at every scale
    * and rows close in ALL keys land close on the curve. Same exact
    * integer arithmetic as the 2-D form (a fixed sum of N·bits
    * multiply-adds, codegen'd, no UDF); `N·bits` must fit the 63
    * positive long bits, so higher dimensions trade per-key resolution
    * (3 keys → up to 21 bits each, 4 → 15) — the right trade, since
    * file-level min/max pruning only needs the TOP bits to separate
    * files. Past ~4 keys the curve's locality decays (every key's bits
    * spread N apart); a Hilbert curve preserves locality better at
    * high dims but costs state-machine arithmetic — N ≤ 4 is where
    * lakehouse OPTIMIZE ZORDER lives in practice. */
  def zValueN(keys: Seq[Column], bits: Int = 21): Column = {
    val n = keys.size
    require(n >= 2, s"zValueN needs at least 2 keys, got $n")
    require(bits >= 1 && n * bits <= 63,
      s"$n keys × $bits bits = ${n * bits} interleaved bits — must fit " +
        "the 63 positive long bits (lower `bits` for more keys)")
    val mask = 1L << bits
    val reduced = keys.map(k => pmod(k.cast("long"), lit(mask)))
    (0 until bits).flatMap { k =>
      reduced.zipWithIndex.map { case (c, i) =>
        shiftleft(shiftright(c, k).bitwiseAND(lit(1L)), n * k + i)
      }
    }.reduce(_ + _)
  }

  /** The N-dimensional HILBERT index of the keys — [[zValueN]]'s
    * locality refinement for 3+ keys (see
    * [[graft.functions.HilbertIndex]]): same `pmod` reduction into
    * [0, 2^bits), same N·bits ≤ 63 budget, but consecutive index
    * values are grid-ADJACENT, so curve ranges stay compact in every
    * key where Morton's bit spreading fattens file rectangles as N
    * grows. Evaluated by a native codegen'd expression (the transform
    * is a per-row state machine no fixed column arithmetic unrolls). */
  def hilbertValueN(keys: Seq[Column], bits: Int = 21): Column = {
    val n = keys.size
    require(n >= 2, s"hilbertValueN needs at least 2 keys, got $n")
    require(bits >= 1 && n * bits <= 63,
      s"$n keys × $bits bits = ${n * bits} index bits — must fit the " +
        "63 positive long bits (lower `bits` for more keys)")
    val mask = 1L << bits
    val reduced = keys.map(k => pmod(k.cast("long"), lit(mask)))
    org.apache.spark.sql.GraftSqlShim.column(
      graft.functions.HilbertIndex(
        org.apache.spark.sql.GraftSqlShim.expression(
          array(reduced: _*)),
        bits))
  }

  /** [[clusterByZOrderN]] on the Hilbert curve — identical exchange
    * and in-partition sort, better range compactness at 3+ keys. */
  def clusterByHilbertN(
      df: DataFrame,
      keyCols: Seq[String],
      numPartitions: Int,
      bits: Int = 21,
      hCol: String = "hkey"): DataFrame = {
    require(numPartitions >= 1, "numPartitions must be positive")
    require(!df.columns.contains(hCol),
      s"input already carries a '$hCol' column")
    df.withColumn(hCol, hilbertValueN(keyCols.map(col), bits))
      .repartitionByRange(numPartitions, col(hCol))
      .sortWithinPartitions(col(hCol))
  }

  /** Re-layout `df` so co-Z-ordered rows are co-located: append the
    * Z-value of the two cluster keys and range-partition on it. Written
    * out as parquet, each file's (kx, ky) min/max statistics then cover
    * a compact rectangle, so a selective predicate on either key prunes
    * most files — range-partitioning on kx alone can only prune kx.
    * One exchange; downstream writers inherit the layout. */
  def clusterByZOrder(
      df: DataFrame,
      kxCol: String,
      kyCol: String,
      numPartitions: Int,
      bits: Int = 21,
      zCol: String = "zkey"): DataFrame =
    clusterByZOrderN(df, Seq(kxCol, kyCol), numPartitions, bits, zCol)

  /** [[clusterByZOrder]] over N cluster keys ([[zValueN]]) — written
    * out as parquet, each file's per-key min/max statistics cover a
    * compact N-rectangle, so a selective predicate on ANY key (or any
    * subset box) prunes most files. Rows also SORT by the Z-value
    * inside each partition (free — it rides the range exchange's
    * local sort), so parquet ROW-GROUP statistics tighten the same
    * way: at 100 TB a file is many row groups, and the group-level
    * min/max skip is where most of the scan reduction lives once the
    * file-level prune has done its part. One exchange. */
  def clusterByZOrderN(
      df: DataFrame,
      keyCols: Seq[String],
      numPartitions: Int,
      bits: Int = 21,
      zCol: String = "zkey"): DataFrame = {
    require(numPartitions >= 1, "numPartitions must be positive")
    require(!df.columns.contains(zCol),
      s"input already carries a '$zCol' column")
    df.withColumn(zCol, zValueN(keyCols.map(col), bits))
      .repartitionByRange(numPartitions, col(zCol))
      .sortWithinPartitions(col(zCol))
  }
}
