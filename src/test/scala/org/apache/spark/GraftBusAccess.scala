package org.apache.spark

/** Test-only access to the `private[spark]` listener bus: lets a spec
  * wait until every queued listener event has been delivered, so a
  * SparkListener-based job counter reads exact per-step deltas
  * instead of racing the async event queues.
  */
object GraftBusAccess {
  def drain(sc: SparkContext): Unit =
    try sc.listenerBus.waitUntilEmpty()
    catch { case _: java.util.concurrent.TimeoutException => () }
}
