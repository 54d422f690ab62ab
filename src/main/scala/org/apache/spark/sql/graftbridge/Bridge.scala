package org.apache.spark.sql.graftbridge

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Spark 4 removed the public `new Column(expr)` constructor; the
  * supported path for libraries shipping native Catalyst expressions is
  * `classic.ExpressionUtils.column`, which is `private[sql]`. This bridge
  * lives inside the `org.apache.spark.sql` package namespace to re-export
  * it — the standard extension-library pattern.
  */
object Bridge {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)
}
