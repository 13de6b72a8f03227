package org.apache.spark.sql.graftshim

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Access shim: Spark 4 made the Column <-> catalyst Expression conversions
  * `private[sql]` (`org.apache.spark.sql.classic.ExpressionUtils`). Living in
  * a subpackage of org.apache.spark.sql is the standard extension-library
  * idiom for reaching them (same trick frameworks like Delta use).
  */
object Bridge {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)
}
