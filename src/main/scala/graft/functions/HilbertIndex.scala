package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}

/** The N-dimensional HILBERT index — [[graft.operators.Layout.zValueN]]'s
  * locality refinement: on the Morton curve every key's bits sit N
  * positions apart, so past ~3 keys a unit step in one key can jump far
  * along the curve and file rectangles fatten; the Hilbert curve visits
  * every cell of the N-cube with UNIT steps (consecutive indexes are
  * grid-adjacent — spec-pinned as a bijection + adjacency walk over a
  * full grid), so co-located curve ranges stay compact in every key at
  * any dimension count. The cost Morton avoids is the per-row state
  * machine (Skilling's transpose transform, 2004) — a genuine loop with
  * data-dependent updates that pure column arithmetic cannot unroll
  * without exponential expression blow-up, which is exactly the case for
  * a native expression: evaluation is one static JVM call on the unsafe
  * array data, inside whole-stage codegen, allocating one small long[]
  * per row.
  *
  * Input: an `array<long>` of N keys already reduced into [0, 2^bits)
  * (callers go through [[graft.operators.Layout.hilbertValueN]], which
  * applies the same `pmod` reduction as the Morton form). Null array or
  * any null element → null, mirroring the arithmetic null propagation
  * of the Morton expression. N·bits ≤ 63 keeps the index a positive
  * long. */
case class HilbertIndex(child: Expression, bits: Int)
    extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    child.dataType match {
      case ArrayType(LongType, _) if bits >= 1 =>
        TypeCheckResult.TypeCheckSuccess
      case _ => TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires an array<long> argument and bits >= 1, " +
          s"got ${child.dataType.catalogString}, bits = $bits")
    }

  override def dataType: DataType = LongType
  override def nullable: Boolean = true
  override def prettyName: String = "hilbert_index"

  override def nullSafeEval(a: Any): Any = {
    val xs = a.asInstanceOf[ArrayData]
    val n = xs.numElements()
    var i = 0
    while (i < n) {
      if (xs.isNullAt(i)) return null
      i += 1
    }
    HilbertCurve.indexOf(xs, bits)
  }

  override protected def doGenCode(
      ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      s"""
         |final int $n = $a.numElements();
         |for (int $i = 0; $i < $n; $i++) {
         |  if ($a.isNullAt($i)) { ${ev.isNull} = true; break; }
         |}
         |if (!${ev.isNull}) {
         |  ${ev.value} =
         |    graft.functions.HilbertCurve.indexOf($a, $bits);
         |}
       """.stripMargin
    })

  override protected def withNewChildInternal(
      newChild: Expression): HilbertIndex = copy(child = newChild)
}

/** The pure-JVM Hilbert transform both the interpreted and generated
  * paths of [[HilbertIndex]] call — Skilling's axes→transpose algorithm
  * followed by the bit pack (bit k of transposed axis i lands at index
  * position k·N + (N−1−i), so axis 0 carries each group's most
  * significant bit). */
object HilbertCurve {

  def indexOf(arr: ArrayData, bits: Int): Long = {
    val n = arr.numElements()
    val xs = new Array[Long](n)
    var i = 0
    while (i < n) { xs(i) = arr.getLong(i); i += 1 }
    index(xs, bits)
  }

  /** MUTATES `xs`. Callers pass a fresh copy. */
  def index(xs: Array[Long], bits: Int): Long = {
    val n = xs.length
    require(n >= 1 && bits >= 1 && n * bits <= 63,
      s"$n keys × $bits bits must fit the 63 positive long bits")
    // axes → transpose (Skilling): per bit plane, invert or exchange
    // the lower planes so each recursion level's sub-cube is entered
    // through the face the previous level exited
    var q = 1L << (bits - 1)
    while (q > 1) {
      val p = q - 1
      var i = 0
      while (i < n) {
        if ((xs(i) & q) != 0L) xs(0) ^= p
        else {
          val t = (xs(0) ^ xs(i)) & p
          xs(0) ^= t; xs(i) ^= t
        }
        i += 1
      }
      q >>= 1
    }
    // Gray encode across axes
    var i = 1
    while (i < n) { xs(i) ^= xs(i - 1); i += 1 }
    var t = 0L
    q = 1L << (bits - 1)
    while (q > 1) {
      if ((xs(n - 1) & q) != 0L) t ^= q - 1
      q >>= 1
    }
    i = 0
    while (i < n) { xs(i) ^= t; i += 1 }
    // pack the transposed form: MSB-first groups, axis 0 most significant
    var h = 0L
    var k = 0
    while (k < bits) {
      var j = 0
      while (j < n) {
        h |= ((xs(j) >> k) & 1L) << (k * n + (n - 1 - j))
        j += 1
      }
      k += 1
    }
    h
  }
}
