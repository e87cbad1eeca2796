package org.apache.spark.graft

import org.apache.spark.SparkContext

/** Bridge to the `private[spark]` listener bus so bench diagnostics can
  * flush pending events before snapshotting task metrics (the bus is
  * async; without the flush, a query's tail task events attribute to
  * the NEXT query's delta).
  */
object BusFlush {
  def flush(sc: SparkContext, timeoutMs: Long): Unit =
    sc.listenerBus.waitUntilEmpty(timeoutMs)
}
