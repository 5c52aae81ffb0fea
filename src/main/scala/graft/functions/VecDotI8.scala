package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, ByteType, DataType, LongType}

/** Native catalyst dot product over two `array<tinyint>` columns:
  * Σ aᵢ·bᵢ accumulated in long — the int8 ANN inner loop.
  *
  * EXACT integer arithmetic end to end (|aᵢ·bᵢ| ≤ 127² and realistic
  * dimensionalities keep the sum far inside long range), which is what
  * makes quantized similarity scores bit-reproducible across engines —
  * the float path's one concession to IEEE is a final correctly-rounded
  * sqrt/division in the caller. Same generated-loop shape as [[VecDotF]]:
  * stays inside whole-stage codegen, allocates nothing.
  *
  * Null semantics mirror [[VecDotF]]: null input array → null; length
  * mismatch → null; any null element → null.
  */
case class VecDotI8(left: Expression, right: Expression)
    extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    if (children.forall(_.dataType match {
      case ArrayType(ByteType, _) => true
      case _ => false
    })) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires two array<tinyint> arguments, got " +
        children.map(_.dataType.catalogString).mkString(", "))

  override def dataType: DataType = LongType
  override def nullable: Boolean = true
  override def prettyName: String = "vec_dot_i8"

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = x.numElements()
    if (n != y.numElements()) return null
    var acc = 0L
    var i = 0
    while (i < n) {
      if (x.isNullAt(i) || y.isNullAt(i)) return null
      acc += x.getByte(i).toLong * y.getByte(i).toLong
      i += 1
    }
    acc
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val acc = ctx.freshName("acc")
      s"""
         |final int $n = $a.numElements();
         |if ($n != $b.numElements()) {
         |  ${ev.isNull} = true;
         |} else {
         |  long $acc = 0L;
         |  for (int $i = 0; $i < $n; $i++) {
         |    if ($a.isNullAt($i) || $b.isNullAt($i)) { ${ev.isNull} = true; break; }
         |    $acc += ((long) $a.getByte($i)) * ((long) $b.getByte($i));
         |  }
         |  if (!${ev.isNull}) ${ev.value} = $acc;
         |}
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): VecDotI8 =
    copy(left = newLeft, right = newRight)
}
