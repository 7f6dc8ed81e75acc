package org.apache.spark.graft

import org.apache.spark.sql.SparkSession

/** Bridge to the `private[spark]` listener-bus drain.
  *
  * Queries that write into a temp directory and delete it before
  * returning (q64/q65) race the async `ExecutionListenerBus`: the bus
  * resolves the written path AFTER the directory is gone and logs a
  * spurious `PATH_NOT_FOUND` ERROR on every run. Draining the shared
  * listener queue before deletion removes the race at the source —
  * the same call Spark's own test harness uses between jobs.
  */
object ListenerDrain {
  def drain(spark: SparkSession): Unit =
    try spark.sparkContext.listenerBus.waitUntilEmpty()
    catch { case _: Throwable => () } // a drain failure must never fail the query
}
