package graft

import java.lang.management.ManagementFactory

import scala.jdk.CollectionConverters._

/** Process-level gauges shared by the measurement mains ([[Bench]],
  * [[QTime]]) — one definition so the two ledgers cannot drift. */
object Telemetry {
  /** Total collector time (ms) across every GarbageCollectorMXBean. */
  def gcMsNow: Long =
    ManagementFactory.getGarbageCollectorMXBeans.asScala.map(_.getCollectionTime).sum
  /** 1-minute system load average. */
  def loadNow: Double =
    ManagementFactory.getOperatingSystemMXBean.getSystemLoadAverage
  /** Currently used heap, MB. */
  def heapMbNow: Double = {
    val rt = Runtime.getRuntime
    (rt.totalMemory - rt.freeMemory) / 1e6
  }
}
