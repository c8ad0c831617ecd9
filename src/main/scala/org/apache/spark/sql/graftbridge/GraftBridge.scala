package org.apache.spark.sql.graftbridge

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Column ↔ catalyst Expression bridge. Spark 4 made the converters
  * (`classic.ExpressionUtils`) private[sql], so extension libraries host a
  * forwarder inside the org.apache.spark.sql namespace — the same pattern
  * community Spark-extension libraries use. Nothing else in this repo may
  * live under org.apache.spark.*.
  */
object GraftBridge {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)
}
