package org.apache.spark.graft

import org.apache.spark.SparkContext

/** Bridge to the `private[spark]` listener bus so bench diagnostics can
  * flush pending events before snapshotting task metrics.
  *
  * Why this file sits under `org.apache.spark`: `SparkContext.listenerBus`
  * and `LiveListenerBus.waitUntilEmpty` are both `private[spark]` — there
  * is no public API that blocks until queued listener events are
  * delivered (`SparkListener` registration is public, but delivery is
  * asynchronous with no drain hook). Declaring this one object inside
  * the `org.apache.spark` package tree grants it that package-private
  * access; no Spark internals are modified or shadowed, and the object
  * contains nothing but this delegation.
  *
  * What breaks without it: [[graft.BenchDiag]] accumulates per-task
  * metrics (GC time, shuffle bytes, spill) from `onTaskEnd` events and
  * reports per-query DELTAS. The bus dispatches those events on its own
  * thread, typically a few ms behind task completion — so without a
  * drain barrier, the tail tasks of query N land in the delta window of
  * query N+1 and every per-query attribution in `bench_diag.json` is
  * skewed by whatever the bus had in flight at the snapshot instant
  * (worst for short queries following heavy ones). The 2s timeout keeps
  * a wedged listener from hanging the bench; on timeout the snapshot
  * proceeds with at-most-that-stale data.
  */
object BusFlush {
  def flush(sc: SparkContext, timeoutMs: Long): Unit =
    sc.listenerBus.waitUntilEmpty(timeoutMs)
}
