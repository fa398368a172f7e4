package org.apache.spark.sql.graftshim

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Bridge from a raw Catalyst [[Expression]] to the public [[Column]]
  * API. Spark 4 made the constructor backend-agnostic and `private[sql]`;
  * this shim lives inside the `org.apache.spark.sql` package solely to
  * re-export that one conversion for graft's custom expressions. */
object ColumnShim {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)
}
