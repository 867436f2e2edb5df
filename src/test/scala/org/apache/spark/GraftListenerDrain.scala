package org.apache.spark

/** Test-only bridge into the private[spark] listener bus: lets a spec
  * block until every queued listener event (including the async
  * QueryExecutionListener bus) has been delivered, so assertions over
  * recorded events are deterministic instead of sleep-based.
  */
object GraftListenerDrain {
  def drain(sc: SparkContext): Unit = sc.listenerBus.waitUntilEmpty()
}
