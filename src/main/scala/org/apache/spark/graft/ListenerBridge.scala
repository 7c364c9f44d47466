package org.apache.spark.graft

import org.apache.spark.SparkContext

/** `SparkContext.listenerBus` is `private[spark]`; progress metrics are
  * delivered asynchronously, so a deterministic read needs a drain. */
object ListenerBridge {
  def drain(sc: SparkContext): Unit = sc.listenerBus.waitUntilEmpty()

  /** Post a synthetic application-end event and drain — lets a spec
    * prove an `onApplicationEnd` hook fires end-to-end through the
    * real bus without stopping the (shared) test SparkContext. */
  def postApplicationEnd(sc: SparkContext): Unit = {
    sc.listenerBus.post(
      org.apache.spark.scheduler.SparkListenerApplicationEnd(
        System.currentTimeMillis()))
    sc.listenerBus.waitUntilEmpty()
  }
}
