package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables
import graft.dedup.MinHashDeduplicator

/** Dev scratch: stage-by-stage timing of the minhash dedup pipeline. */
object ProfileStages {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.length > 0) args(0) else "/root/testdata/sf0.1"
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def seeded(): DataFrame = {
      val d = Tables.documents(spark, sfDir).select(col("doc_id"), col("text"))
      d.union(
        d.where(col("doc_id") % 10 === 0)
          .select((col("doc_id") + 100000).as("doc_id"), col("text")))
        .union(
          d.where(col("doc_id") % 7 === 0)
            .select((col("doc_id") + 200000).as("doc_id"),
              concat(col("text"), lit(" graft near dup probe")).as("text")))
    }
    val m = new MinHashDeduplicator()
      .setIdCol("doc_id").setTextCol("text")
      .setShingleSize(8).setNumHashes(12).setNumBands(4).setThreshold(0.5)

    def time(label: String)(f: => Long): Unit = {
      // warm twice, time thrice
      f; f
      val ts = (1 to 3).map { _ =>
        val t0 = System.nanoTime(); val n = f; ((System.nanoTime() - t0) / 1e9, n)
      }
      println(f"### $label%-22s ${ts.map(_._1).min}%.3f s  (${ts.head._2} rows)")
    }

    if (args.length > 1 && args(1) == "setsim") {
      val sh = org.apache.spark.sql.GraftBridge.column(
        graft.sql.expressions.Shingles(
          org.apache.spark.sql.GraftBridge.expression(
            graft.dedup.TextNormalizer.normalize(col("text"))), 8))
      def sets() = seeded().select(col("doc_id"), sh.as("sh"))
      val j = new graft.dedup.SetSimilarityJoin(0.8, "doc_id", "sh")
      time("setsim_sets") { sets().count() }
      time("setsim_candidates") { j.candidates(sets()).count() }
      time("setsim_pairs_full") { j.pairs(sets()).count() }
    } else {
      time("scan_seeded") { seeded().count() }
      time("signatures") { m.signatures(seeded()).count() }
      time("bandSignatures") { m.bandSignatures(seeded()).count() }
      time("candidatePairs") { m.candidatePairs(seeded()).count() }
      time("transform_full") { m.transform(seeded()).count() }
    }
    spark.stop()
  }
}
