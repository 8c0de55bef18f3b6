package graft.tools

import org.apache.spark.sql.SparkSession

/** Dev utility: time one SparkEntry query and dump its formatted plan.
  *
  * Usage: runMain graft.tools.ProfileQ <queryName> [sfDir] [reps]
  *
  * Prints the formatted physical plan once, then `reps` timed executions
  * (first one doubles as warmup) — the feedback loop for plan iteration
  * that the round briefs ask for ("explain, then iterate until it's the
  * plan you'd want").
  */
object ProfileQ {
  def main(args: Array[String]): Unit = {
    val name = args(0)
    val sfDir = if (args.length > 1) args(1) else "/root/testdata/sf0.1"
    val reps = if (args.length > 2) args(2).toInt else 3
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val builder = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
    // semicolon-separated extra confs for A/B plan experiments, e.g.
    // SPARK_GRAFT_CONF="spark.sql.adaptive.coalescePartitions.enabled=false"
    sys.env.get("SPARK_GRAFT_CONF").foreach(
      _.split(";").map(_.trim).filter(_.nonEmpty).foreach { kv =>
        val i = kv.indexOf('=')
        require(i > 0, s"SPARK_GRAFT_CONF entry needs key=value, got: '$kv'")
        builder.config(kv.take(i), kv.drop(i + 1))
      })
    val spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val fn = graft.SparkEntry.queries(name)
    println(s"=== $name plan ===")
    fn(spark, sfDir).explain("formatted")
    (1 to reps).foreach { i =>
      // cache-honesty (same rule as Bench): a persist()ing query must pay
      // its materialization every rep, not serve rep 2+ from rep 1's cache
      spark.catalog.clearCache()
      val t0 = System.nanoTime()
      val n = fn(spark, sfDir).count()
      println(f"=== $name run $i: ${(System.nanoTime() - t0) / 1e9}%.3f s ($n rows)")
    }
    spark.stop()
  }
}
