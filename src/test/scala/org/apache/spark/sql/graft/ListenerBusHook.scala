package org.apache.spark.sql.graft

import org.apache.spark.SparkContext

/** Test-only bridge to the private[spark] listener bus so specs that
  * meter per-job task metrics (shuffle records etc.) can deterministically
  * wait for all pending events instead of sleeping.
  */
object ListenerBusHook {
  def drain(sc: SparkContext): Unit = sc.listenerBus.waitUntilEmpty()
}
