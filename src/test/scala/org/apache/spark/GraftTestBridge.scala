package org.apache.spark

/** Test-only bridge into `private[spark]` surface: the listener bus is
  * asynchronous, so a job-counting SparkListener must drain it before its
  * counter is read — the same pattern Spark's own test utilities use
  * (`SparkContext.listenerBus.waitUntilEmpty()`). The production shim
  * precedent is graft's Column⇄Expression bridge; this one is test-scoped
  * only.
  */
object GraftTestBridge {
  def waitListenerBusEmpty(sc: SparkContext): Unit =
    sc.listenerBus.waitUntilEmpty()
}
