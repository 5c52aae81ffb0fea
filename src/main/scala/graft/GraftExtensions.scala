package graft

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.ExpressionInfo

import graft.functions.VecDotF

/** Catalyst extension entry point: registers the library's native
  * expressions with the session so they are usable from SQL text as well
  * as the Column API.
  *
  * Wire up with either
  * `SparkSession.builder.withExtensions(new GraftExtensions)` or
  * `spark.sql.extensions=graft.GraftExtensions` (config-driven, works for
  * spark-submit / thrift-server sessions that never touch our Scala API).
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit =
    GraftExtensions.functions.foreach(ext.injectFunction)
}

object GraftExtensions {
  import org.apache.spark.sql.SparkSession
  import org.apache.spark.sql.catalyst.expressions.Expression

  /** (identifier, info, builder) triples — the same shape
    * `injectFunction` and the live `FunctionRegistry` consume. */
  val functions: Seq[(FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression)] =
    Seq((
      new FunctionIdentifier("vec_dot_f"),
      new ExpressionInfo(
        classOf[VecDotF].getName, null, "vec_dot_f",
        "vec_dot_f(a, b) - dot product of two array<float> vectors, " +
          "accumulated left-to-right in double; null on length mismatch " +
          "or null element.",
        "", "", "", "math_funcs", "0.1.0", "", "scala_udf"),
      (children: Seq[Expression]) => {
        require(children.length == 2, "vec_dot_f takes exactly 2 arguments")
        VecDotF(children.head, children(1))
      }),
      (
        new FunctionIdentifier("parse_description"),
        new ExpressionInfo(
          classOf[graft.functions.ParseDescription].getName, null,
          "parse_description",
          "parse_description(desc) - parse a journal item description " +
            "into struct<enumA, enumB, chronI, chronJ, pattern> using the " +
            "ordered multi-pattern grammar; pattern = 'N/A' on no match.",
          "", "", "", "string_funcs", "0.1.0", "", "scala_udf"),
        (children: Seq[Expression]) => {
          require(children.length == 1, "parse_description takes 1 argument")
          graft.functions.ParseDescription(children.head)
        }))

  /** Register into an already-built session (tests, notebooks). */
  def register(spark: SparkSession): Unit =
    functions.foreach { case (ident, info, builder) =>
      spark.sessionState.functionRegistry
        .registerFunction(ident, info, builder)
    }
}
