package org.apache.spark
package graftshim

/** Access shim for `private[spark]` listener-bus draining (same pattern
  * as [[org.apache.spark.sql.graftshim.GraftSql]]): `Dataset.observe`
  * metrics are harvested by a QueryExecutionListener dispatched
  * ASYNCHRONOUSLY on the shared LiveListenerBus, so a driver-side read of
  * the Observed registry right after an action races the harvest — in
  * both directions (a late harvest reads as zero drops; a stale in-flight
  * event from a previous query reads as this query's drops). A bounded
  * drain before the read gives read-your-writes for the no-silent-caps
  * counters.
  */
object GraftCore {

  /** Block until the shared listener bus has dispatched every queued
    * event, or the timeout elapses.
    *
    * @return true if the bus drained within the timeout
    */
  def drainListenerBus(sc: SparkContext, timeoutMs: Long): Boolean =
    try { sc.listenerBus.waitUntilEmpty(timeoutMs); true }
    catch { case _: java.util.concurrent.TimeoutException => false }
}
