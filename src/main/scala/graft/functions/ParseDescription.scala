package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode, FalseLiteral}
import org.apache.spark.sql.catalyst.expressions.codegen.Block._
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** R1 as a native catalyst expression:
  * `parse_description(desc) -> struct<enumA,enumB,chronI,chronJ,pattern>`
  * (reference BatchUpdate.py:684-760 via [[Description.parse]]).
  *
  * Same semantics as the Scala-UDF formulation, minus the UDF machinery: a
  * struct-returning `ScalaUDF` round-trips every row through
  * CatalystTypeConverters (external Row allocation + per-field conversion),
  * while this expression writes the result `InternalRow` directly and its
  * `doGenCode` is a single static call that keeps the enclosing projection
  * inside whole-stage codegen. The regex matching itself — three compiled
  * `java.util.regex` patterns tried in order — is shared with the UDF path
  * through [[Description.parse]].
  */
case class ParseDescription(child: Expression) extends UnaryExpression {

  // fail at analysis, not with a mid-job ClassCastException — the
  // expression is SQL-registered, so any argument type can reach it
  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires a string argument, got " +
        child.dataType.catalogString)

  override def dataType: DataType = ParseDescription.schema
  override def nullable: Boolean = false
  override def prettyName: String = "parse_description"

  // Null input parses like the reference's missing description: all-empty
  // fields with Pattern = "N/A" — so this expression is non-nullable and
  // handles null itself rather than going through nullSafeEval.
  override def eval(input: InternalRow): Any = {
    val v = child.eval(input)
    ParseDescription.parseRow(
      if (v == null) null else v.asInstanceOf[UTF8String])
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val c = child.genCode(ctx)
    // graft.functions.ParseDescription$.MODULE$ — the static singleton
    val helper = ParseDescription.getClass.getName
    ev.copy(
      code = code"""
        ${c.code}
        InternalRow ${ev.value} = $helper.MODULE$$.parseRow(
          ${c.isNull} ? null : ${c.value});
      """,
      isNull = FalseLiteral)
  }

  override protected def withNewChildInternal(newChild: Expression): ParseDescription =
    copy(child = newChild)
}

object ParseDescription {
  // field null = "group did not participate; preserve the existing cell"
  val schema: StructType = StructType(Seq(
    StructField("enumA", StringType, nullable = true),
    StructField("enumB", StringType, nullable = true),
    StructField("chronI", StringType, nullable = true),
    StructField("chronJ", StringType, nullable = true),
    StructField("pattern", StringType, nullable = false)))

  /** Static entry shared by interpreted eval and generated code. */
  def parseRow(s: UTF8String): InternalRow = {
    val p = Description.parse(if (s == null) null else s.toString)
    InternalRow(
      UTF8String.fromString(p.enumA),
      UTF8String.fromString(p.enumB),
      UTF8String.fromString(p.chronI),
      UTF8String.fromString(p.chronJ),
      UTF8String.fromString(p.pattern))
  }
}
