package org.apache.spark.sql.graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Column <-> Expression bridge. `ExpressionUtils` is private[sql], so
  * this one-file shim lives under the org.apache.spark.sql package — the
  * standard pattern for extension libraries shipping native Catalyst
  * expressions. */
object bridge {
  def toColumn(e: Expression): Column = ExpressionUtils.column(e)
  def toExpression(c: Column): Expression = ExpressionUtils.expression(c)

  /** Deterministic listener-bus drain (`SparkContext.listenerBus` is
    * private[spark], same shim rationale as above): lets metric capture
    * wait for all task-end events instead of sleeping a guessed beat. */
  def waitListenerBusEmpty(sc: org.apache.spark.SparkContext,
                           timeoutMillis: Long = 60000L): Unit =
    sc.listenerBus.waitUntilEmpty(timeoutMillis)
}
