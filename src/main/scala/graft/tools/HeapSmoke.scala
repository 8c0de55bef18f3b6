package graft.tools

import org.apache.spark.sql.SparkSession

/** Memory-pressure smoke: run named SparkEntry queries once in THIS JVM
  * and report completion + GC cost — designed to be forked with a
  * deliberately small `-Xmx` (see HeapConstrainedSpec) as the empirical
  * leg of the 100 TB spill story: every operator family claims "spills,
  * doesn't OOM" and this is the harness that demonstrates it instead of
  * asserting it.
  *
  * Usage: runMain graft.tools.HeapSmoke <sfDir> <q1,q2,...>
  * Prints one `HEAPSMOKE OK <name> rows=<n> sec=<s> gc_ms=<ms>` line per
  * query; any failure prints `HEAPSMOKE FAIL <name> <err>` and exits 1.
  */
object HeapSmoke {
  def main(args: Array[String]): Unit = {
    val Array(sfDir, names) = args
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def gcMs: Long = graft.JvmStats.gcMs
    val maxMb = Runtime.getRuntime.maxMemory >> 20
    println(s"HEAPSMOKE HEAP max_mb=$maxMb cpus=$cpus sf=$sfDir")
    var failed = false
    names.split(",").foreach { name =>
      try {
        val gc0 = gcMs
        val t0 = System.nanoTime()
        val n = graft.SparkEntry.queries(name)(spark, sfDir).count()
        val dt = (System.nanoTime() - t0) / 1e9
        println(f"HEAPSMOKE OK $name rows=$n sec=$dt%.2f gc_ms=${gcMs - gc0}")
      } catch {
        case e: Throwable =>
          failed = true
          println(s"HEAPSMOKE FAIL $name " +
            Option(e.getMessage).getOrElse(e.getClass.getName).take(300))
      }
    }
    spark.stop()
    if (failed) sys.exit(1)
  }
}
