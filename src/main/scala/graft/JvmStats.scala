package graft

/** Shared JVM telemetry helpers for the measurement harnesses
  * ([[Bench]], [[graft.tools.HeapSmoke]]) — one definition so a future
  * refinement (per-collector breakdown, exotic-collector -1 handling)
  * lands everywhere at once.
  */
object JvmStats {

  /** Total GC time across all collectors, ms (collectors reporting -1 are
    * counted as 0).
    */
  def gcMs: Long = {
    import scala.jdk.CollectionConverters._
    java.lang.management.ManagementFactory.getGarbageCollectorMXBeans
      .asScala.map(b => math.max(0L, b.getCollectionTime)).sum
  }
}
