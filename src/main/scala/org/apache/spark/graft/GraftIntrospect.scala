package org.apache.spark.graft

import org.apache.spark.SparkContext
import org.apache.spark.{MapOutputTrackerMaster, SparkEnv}

/** Read-only views of Spark-private driver state for the JvmDrift
  * diagnostic (round-16 verdict task 2: name the mechanism behind the
  * residual per-JVM slowdown accumulation at 10× scale). Lives under
  * `org.apache.spark` solely to read `private[spark]` members — the
  * standard extension-point pattern; nothing here mutates anything.
  */
object GraftIntrospect {

  /** Registered shuffle count on the driver's MapOutputTrackerMaster.
    * Shuffles unregister only when the ContextCleaner collects their
    * ShuffleDependency (weak-ref + GC driven), so unbounded growth
    * here means shuffle files + MapStatus arrays are accumulating
    * faster than the cleaner reaps them.
    */
  def shuffleCount(sc: SparkContext): Int =
    SparkEnv.get.mapOutputTracker match {
      case m: MapOutputTrackerMaster => m.shuffleStatuses.size
      case _ => -1
    }

  /** (block count, storage memory used bytes) in the local block
    * manager — leaked broadcasts/cached blocks show up here.
    */
  def blockStats(sc: SparkContext): (Int, Long) = {
    val bm = SparkEnv.get.blockManager
    val ids = bm.getMatchingBlockIds(_ => true)
    val used = bm.master.getMemoryStatus.values
      .map { case (max, remaining) => max - remaining }.sum
    (ids.size, used)
  }

  /** Blocks until the listener bus has delivered every queued event
    * (or the timeout passes) — lets tests read listener-accumulated
    * metrics without racing the async delivery thread.
    */
  def drainListenerBus(sc: SparkContext, timeoutMs: Long = 30000): Unit =
    sc.listenerBus.waitUntilEmpty(timeoutMs)

  /** Total events dropped across all listener-bus queues (nonzero =
    * metrics/attribution lossy AND listeners falling behind).
    */
  def droppedEvents(sc: SparkContext): Long = {
    import scala.jdk.CollectionConverters._
    sc.listenerBus.metrics.metricRegistry.getCounters().asScala
      .collect { case (name, c) if name.endsWith("numDroppedEvents") => c.getCount }
      .sum
  }
}
