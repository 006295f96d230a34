package org.apache.spark.sql
package graftbridge

import org.apache.spark.sql.catalyst.expressions.Expression

/** Column <-> Expression bridge. `classic.ExpressionUtils` is
  * private[sql] in Spark 4, so this one-liner lives under the sql package
  * to expose the conversion to our expression library.
  */
object Bridge {
  def column(e: Expression): Column = classic.ExpressionUtils.column(e)
  def expression(c: Column): Expression = classic.ExpressionUtils.expression(c)

  /** Block until queued listener events are delivered (`listenerBus` is
    * private[spark]) — needed before reading a listener-backed counter
    * right after an action.
    */
  def drainListenerBus(sc: org.apache.spark.SparkContext): Unit =
    sc.listenerBus.waitUntilEmpty()
}
