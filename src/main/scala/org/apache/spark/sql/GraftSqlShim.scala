package org.apache.spark.sql

import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Spark 4 moved the `Column` ↔ catalyst `Expression` bridge behind
  * `private[sql]` (`org.apache.spark.sql.classic.ExpressionUtils`). Extension
  * libraries that ship native catalyst expressions (as this one does for the
  * vector kernels) need that bridge, so we expose it from inside the package —
  * the same approach used by other Spark-native extension libraries.
  */
object GraftSqlShim {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)
}
