package org.apache.spark.sql.graftbridge

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Column <-> Expression bridge. Spark 4 made these converters
  * `private[sql]` (`org.apache.spark.sql.classic.ExpressionUtils`); this
  * subpackage re-exports the two calls a library registering custom
  * Catalyst expressions needs. No Spark internals are reimplemented. */
object Bridge {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)
}
