package org.apache.spark.graftbench

import org.apache.spark.SparkContext

/** Bridge to the `private[spark]` listener-bus drain: per-query metric
  * attribution in [[graft.Bench]] snapshots listener counters after each
  * query's action returns, but stage-completed events are delivered
  * asynchronously — without a drain the last stages of query N can be
  * charged to query N+1. `waitUntilEmpty` is exactly the hook Spark's own
  * test harness uses for this; it is package-private, hence this one-line
  * shim in the `org.apache.spark` namespace (no other internals touched).
  */
object ListenerDrain {
  /** Block until all posted listener events are dispatched (10 s cap —
    * falls through rather than failing the bench on a stuck queue). */
  def drain(sc: SparkContext): Unit =
    try sc.listenerBus.waitUntilEmpty(10000L)
    catch { case _: java.util.concurrent.TimeoutException => () }
}
