package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.SparkPlan
import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, QueryStageExec}

/** Dev scratch: execute one SparkEntry query and print the executed plan
  * tree with per-operator SQL metrics (rows out, operator time) — the
  * Spark-UI SQL tab's per-node attribution, on stdout.
  *
  * Usage: runMain graft.tools.ProfileMetrics <queryName> [sfDir]
  */
object ProfileMetrics {
  def main(args: Array[String]): Unit = {
    val name = args(0)
    val sfDir = if (args.length > 1) args(1) else "/root/testdata/sf0.1"
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val fn = graft.SparkEntry.queries(name)
    fn(spark, sfDir).queryExecution.toRdd.count() // warm
    spark.catalog.clearCache()
    val df = fn(spark, sfDir)
    val t0 = System.nanoTime()
    // drive THIS dataframe's own queryExecution so AQE finalizes and the
    // per-node metrics below belong to the plan we walk (df.count() would
    // execute a separate aggregated plan and leave these metrics at zero)
    df.queryExecution.toRdd.count()
    println(f"=== $name executed in ${(System.nanoTime() - t0) / 1e9}%.3f s ===")

    def walk(p: SparkPlan, depth: Int): Unit = {
      val interesting = p.metrics.filter { case (k, _) =>
        k.contains("Time") || k == "numOutputRows" || k.contains("build") ||
          k.contains("spill") || k.contains("collect")
      }
      val ms = interesting.map { case (k, m) =>
        val v = m.value
        if (m.metricType == "timing" || m.metricType == "nsTiming" ||
          k.toLowerCase.contains("time"))
          s"$k=${if (m.metricType == "nsTiming") v / 1e6 else v.toDouble}ms"
        else s"$k=$v"
      }.mkString(" ")
      println("  " * depth + p.nodeName + "  " + ms)
      p match {
        case a: AdaptiveSparkPlanExec => walk(a.executedPlan, depth + 1)
        case q: QueryStageExec => walk(q.plan, depth + 1)
        case _ => p.children.foreach(walk(_, depth + 1))
      }
      p.subqueries.foreach(walk(_, depth + 1))
    }
    walk(df.queryExecution.executedPlan, 0)
    spark.stop()
  }
}
