package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

object QFBench {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val docs = spark.read.parquet("/root/testdata/sf0.1/documents.parquet").cache()
    docs.count()
    def time(label: String)(f: => Long): Unit = {
      f // warm
      val t0 = System.nanoTime(); val n = f
      println(f"QF $label%-28s ${(System.nanoTime()-t0)/1e9}%6.2fs rows=$n")
    }
    import graft.text.TextFunctions
    val t = col("text")
    time("full-predicate (current)") {
      docs.where(
        TextFunctions.tokenCount(t).between(40, 100000) &&
        TextFunctions.punctRatio(t) <= 0.2 &&
        TextFunctions.stopwordRatio(t) >= 0.0 &&
        TextFunctions.qualityScore(t) >= 0.5).count()
    }
    time("tokenCount only") { docs.where(TextFunctions.tokenCount(t).between(40, 100000)).count() }
    time("qualityScore only") { docs.where(TextFunctions.qualityScore(t) >= 0.5).count() }
    time("tokens() once, size only") {
      docs.select(graft.dedup.TextNormalizer.tokens(t).as("tl")).where(size(col("tl")) > 40).count()
    }
    time("full-predicate (bound)") {
      docs.where(new graft.text.QualityFilter().setTextCol("text")
        .setMinTokens(40).setMaxTokens(100000)
        .setMaxPunctRatio(0.2).setMinQuality(0.5).keepCondition).count()
    }
    spark.stop()
  }
}
