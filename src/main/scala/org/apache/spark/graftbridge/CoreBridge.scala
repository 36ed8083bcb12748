package org.apache.spark.graftbridge

import org.apache.spark.SparkContext

/** Bridge to `private[spark]` core internals (the sql-side twin lives in
  * `org.apache.spark.sql.graftbridge.Bridge`). */
object CoreBridge {
  /** Block until the async listener bus has delivered every queued
    * event — without this, metrics read immediately after an action can
    * miss its final stages. */
  def waitUntilListenerBusEmpty(sc: SparkContext): Unit =
    sc.listenerBus.waitUntilEmpty()
}
