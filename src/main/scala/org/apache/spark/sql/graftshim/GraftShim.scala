package org.apache.spark.sql.graftshim

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Minimal bridge to Spark's package-private Column↔Expression
  * converters (org.apache.spark.sql.classic.ExpressionUtils), needed
  * to expose custom Catalyst expressions as user-facing Columns in
  * Spark 4's ColumnNode world.
  */
object GraftShim {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)
}
