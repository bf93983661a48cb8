package org.apache.spark.sql.graftbridge

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Column ⇄ catalyst Expression bridge. Spark 4 hides the classic
  * Column(Expression) constructors behind `private[sql]`
  * (ExpressionUtils); this shim lives under org.apache.spark.sql solely
  * to re-export the two conversions the graft custom expressions need.
  * No Spark internals are modified or shadowed. */
object Bridge {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)
}
