package org.apache.spark.graftbridge

import org.apache.spark.SparkContext

/** `LiveListenerBus.waitUntilEmpty` is `private[spark]`; the bench
  * needs it to drain in-flight task-end events before snapshotting
  * per-query metrics (listener delivery is async — without a drain a
  * query's last tasks can be charged to the next query). Same
  * pattern as [[org.apache.spark.sql.graftbridge.ColumnBridge]]: a
  * one-file re-export, no Spark internals modified or shadowed.
  */
object ListenerBridge {
  def drain(sc: SparkContext): Unit = sc.listenerBus.waitUntilEmpty()
}
