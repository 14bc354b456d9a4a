package org.apache.spark.graftbridge

import org.apache.spark.SparkContext

/** `LiveListenerBus.waitUntilEmpty` is private[spark]; Bench needs it
  * to flush the async listener bus before reading its shuffle meter,
  * or the per-query shuffle bytes would race the event delivery. Same
  * package-bridge pattern as sql.graftbridge.ColumnBridge. */
object ListenerBridge {
  def drain(sc: SparkContext, timeoutMs: Long = 10000L): Unit =
    try sc.listenerBus.waitUntilEmpty(timeoutMs)
    catch { case _: java.util.concurrent.TimeoutException => () }
}
