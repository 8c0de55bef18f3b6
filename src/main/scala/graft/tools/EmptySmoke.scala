package graft.tools

import org.apache.spark.sql.SparkSession

/** Scratch: run every SparkEntry query against EMPTY copies of the tables. */
object EmptySmoke {
  def main(args: Array[String]): Unit = {
    val src = "/root/testdata/sf0.001"
    val dst = "/tmp/graft_empty_sf"
    val spark = SparkSession.builder()
      .master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val tables = Seq("region", "nation", "customer", "supplier", "part",
      "orders", "lineitem", "events", "documents", "embeddings")
    tables.foreach { t =>
      spark.read.parquet(s"$src/$t.parquet").limit(0)
        .write.mode("overwrite").parquet(s"$dst/$t.parquet")
    }
    graft.SparkEntry.queries.toSeq.sortBy(_._1).foreach { case (name, q) =>
      try {
        val n = q(spark, dst).count()
        println(s"EMPTYOK $name rows=$n")
      } catch {
        case e: Throwable =>
          println(s"EMPTYFAIL $name ${e.getClass.getSimpleName}: ${String.valueOf(e.getMessage).linesIterator.take(1).mkString}")
      }
    }
    spark.stop()
  }
}
