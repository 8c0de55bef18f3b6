package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev scratch: step-level timing of the q184 maintained-IVF cycle
  * (bootstrap → 6 appends with 2 in-place compactions → load → search) —
  * attributes the query's wall time to its constituent Spark jobs.
  */
object ProfileMaintainer {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.length > 0) args(0) else "/root/testdata/sf0.1"
    val reps = if (args.length > 1) args(1).toInt else 2
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def vectors = spark.read.parquet(s"$sfDir/embeddings.parquet")
      .select(col("vec_id"), col("embedding"))

    (1 to reps).foreach { rep =>
      println(s"--- rep $rep ---")
      val e = vectors
      val ivf = new graft.similarity.IvfCosineIndex(
        numCentroids = 16, nprobe = 4, dim = Some(64))
      val root = s"${System.getProperty("java.io.tmpdir")}/graft_q184_prof_${ProcessHandle.current().pid()}_$rep"
      val rootPath = new org.apache.hadoop.fs.Path(root)
      val fs = rootPath.getFileSystem(spark.sparkContext.hadoopConfiguration)
      if (fs.exists(rootPath)) fs.delete(rootPath, true)
      def t[A](label: String)(f: => A): A = {
        val t0 = System.nanoTime()
        val r = f
        println(f"### $label%-18s ${(System.nanoTime() - t0) / 1e9}%.3f s")
        r
      }
      val maintainer = new graft.streaming.IvfStreamMaintainer(
        ivf, root, maxFilesPerCell = 4)
      t("bootstrap") { maintainer.bootstrap(e.where(col("vec_id") < 200)) }
      (1 to 6).foreach { i =>
        t(s"append $i") {
          maintainer.appendBatch(
            e.where(col("vec_id") >= 200 && col("vec_id") % 6 === (i - 1)),
            batchId = i.toLong)
        }
      }
      val idx = t("load") { maintainer.load(spark) }
      t("search") {
        ivf.search(e.where(col("vec_id") < 5), idx, k = 5)
          .select(col("query_id"), col("vec_id"),
            round(col("cosine"), 6).as("cosine"), col("rank"))
          .count()
      }
      fs.delete(rootPath, true)
    }
    spark.stop()
  }
}
