package org.apache.spark.sql

import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Column <-> catalyst Expression bridge. Spark 4 marks the conversion
  * helpers `private[sql]`, so extension libraries place this one-file
  * shim inside the sql package — the conventional pattern for
  * registering custom Catalyst expressions from outside Spark.
  */
object GraftSqlBridge {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)
}
