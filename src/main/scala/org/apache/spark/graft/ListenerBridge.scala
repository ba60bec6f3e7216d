package org.apache.spark.graft

import org.apache.spark.SparkContext

/** Bench-harness-only bridge into `private[spark]` surface: the
  * listener bus delivers task/query events asynchronously, so a bench
  * that reads listener-accumulated shuffle tallies right after an
  * action races event delivery. `SparkContext.listenerBus` is
  * `private[spark]` (its `waitUntilEmpty` is public but unreachable
  * without the bus reference), hence this one-method object in the
  * `org.apache.spark` namespace — the standard test-harness pattern,
  * used by nothing in the operator library.
  */
object ListenerBridge {
  /** Block until all queued listener events are delivered (or timeout). */
  def flush(sc: SparkContext, timeoutMillis: Long): Unit =
    try sc.listenerBus.waitUntilEmpty(timeoutMillis)
    catch { case _: java.util.concurrent.TimeoutException => () }
}
