package graft.tools

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.SparkSession

/** Dump the id-normalized final physical plan of named queries to a file
  * — the forensic half of `Bench.planHash`: when the SAME commit hashes
  * differently across runs, diffing two dumps shows exactly which
  * run-varying token the hash normalization missed (the r11 lesson:
  * lambda counters and JVM closure identities; the r12 find: tmp-dir
  * artifact paths with the PID baked in).
  *
  * Usage: `sbt "runMain graft.tools.PlanDump out.txt q46_embed_quantize ..."`
  */
object PlanDump {

  def main(args: Array[String]): Unit = {
    require(args.length >= 2, "usage: PlanDump <outFile> <query...>")
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.001")
    val spark = SparkSession.builder()
      .master("local[8]")
      .config("spark.sql.shuffle.partitions", 8)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val sb = new StringBuilder
    args.drop(1).foreach { name =>
      val df = graft.SparkEntry.queries(name)(spark, sfDir)
      df.count()
      sb.append(s"===== $name =====\n")
      sb.append(graft.Bench.normalizePlan(df.queryExecution.executedPlan.toString))
      sb.append("\n")
    }
    Files.writeString(Paths.get(args(0)), sb.toString)
    spark.stop()
  }
}
