package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String
import org.apache.spark.util.sketch.CountMinSketch

/** Native count-min-sketch point estimate over a string column:
  * `estimate(x) = min_d counts[d][h_d(x)]` against a sketch trained by
  * Spark's own `count_min_sketch` aggregate — the probe half that Spark
  * ships no expression for (`BloomFilterMightContain`'s CMS sibling).
  *
  * The trained sketch rides the expression as its serialized BYTES (a
  * plan literal shipped once per executor with the task binary, exactly
  * like the bloom probe at [[Dedup.bloomProbe]]) and is deserialized
  * lazily per JVM. Codegen calls straight into the sketch's primitive
  * probe via an object reference — no UDF wrapping, no boxing, and the
  * expression stays inside whole-stage codegen.
  *
  * The CMS guarantee this engine leans on: estimates NEVER undercount
  * (hash collisions only add), so `cms_estimate(x) >= T` keeps every
  * truly-heavy item — a gate with false positives but zero false
  * negatives, cleared downstream by an exact count over the surviving
  * sliver ([[TextAnalysis.heavyGrams]]).
  *
  * Input grams are probed by their UTF-8 bytes, matching how
  * `CountMinSketchAgg` feeds string columns into the sketch
  * (`addBinary(utf8.getBytes)`) — probe and build MUST hash the same
  * byte stream or estimates are garbage; the spec pins agreement
  * against exact counts.
  */
case class CmsEstimate(child: Expression, sketchBytes: Array[Byte])
    extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires a string argument, got " +
        child.dataType.catalogString)

  override def dataType: DataType = LongType
  override def prettyName: String = "cms_estimate"

  @transient private lazy val sketch: CountMinSketch =
    CountMinSketch.readFrom(sketchBytes)

  /** Probe entry point for both eval modes (public: generated code
    * calls it through the expression reference). */
  def estimate(s: UTF8String): Long = sketch.estimateCount(s.getBytes)

  override def nullSafeEval(v: Any): Any =
    estimate(v.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("cmsExpr", this, classOf[CmsEstimate].getName)
    nullSafeCodeGen(ctx, ev, c => s"${ev.value} = $ref.estimate($c);")
  }

  override protected def withNewChildInternal(newChild: Expression): CmsEstimate =
    copy(child = newChild)
}
