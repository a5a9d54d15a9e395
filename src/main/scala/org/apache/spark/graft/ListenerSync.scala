package org.apache.spark.graft

import org.apache.spark.SparkContext

/** One-method shim in the `org.apache.spark` namespace: the listener
  * bus delivers events ASYNCHRONOUSLY, so per-query metric attribution
  * (graft.Bench's shuffle-byte accounting) must drain the bus between
  * queries or bytes bleed into the next query's bucket. The drain call
  * (`LiveListenerBus.waitUntilEmpty`) is `private[spark]` — this shim
  * is the standard way third-party instrumentation reaches it, and the
  * ONLY private API the project touches (bench/probe instrumentation,
  * never the data path).
  */
object ListenerSync {
  def drain(sc: SparkContext): Unit = sc.listenerBus.waitUntilEmpty()
}
