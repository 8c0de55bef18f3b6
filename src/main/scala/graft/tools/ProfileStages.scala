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
      // warm twice, time thrice; clear the cache per invocation exactly
      // like Bench's per-pass clear, so operators that persist() an
      // internal frame are measured at full materialization cost and the
      // profile doesn't accumulate stale cache entries across calls
      spark.catalog.clearCache(); f
      spark.catalog.clearCache(); f
      val ts = (1 to 3).map { _ =>
        spark.catalog.clearCache()
        val t0 = System.nanoTime(); val n = f; ((System.nanoTime() - t0) / 1e9, n)
      }
      println(f"### $label%-22s ${ts.map(_._1).min}%.3f s  (${ts.head._2} rows)")
    }

    if (args.length > 1 && args(1) == "setsim2") {
      // fine-grained decomposition of the candidates leg
      val sh = org.apache.spark.sql.GraftBridge.column(
        graft.sql.expressions.Shingles(
          org.apache.spark.sql.GraftBridge.expression(
            graft.dedup.TextNormalizer.normalize(col("text"))), 8))
      def sets() = seeded().select(col("doc_id"), sh.as("sh"))
      def base() = graft.sql.functions.spread(
        sets().select(col("doc_id").as("id"), array_distinct(col("sh")).as("ts0")),
        col("id")).persist()
      def ordered() = graft.dedup.SetSimilarityJoin.dfSortedFrom(base())
      val t = 0.8
      def prefix() = ordered().select(col("id"), col("sz"),
        posexplode_outer(expr(
          s"slice(ts, 1, sz - CAST(ceil($t * sz - 1e-9) AS INT) + 1)")))
        .select(col("id"), col("sz"), (col("pos") + 1).as("rn"), col("col").as("tok"))
      def joinRaw() = {
        val p = prefix()
        p.as("a").join(p.as("b"),
          col("a.tok") === col("b.tok") && col("a.id") < col("b.id") &&
            least(col("a.sz"), col("b.sz")).cast("double") >=
              lit(t) * greatest(col("a.sz"), col("b.sz")) - lit(1e-9) &&
            (least(col("a.sz") - col("a.rn"), col("b.sz") - col("b.rn")) + lit(1))
              .cast("double") >=
              ceil(lit(t / (1 + t)) * (col("a.sz") + col("b.sz")) - lit(1e-9)))
          .select(col("a.id").as("id_a"), col("b.id").as("id_b"))
      }
      time("base") { base().count() }
      time("ordered") { ordered().count() }
      time("prefix") { prefix().count() }
      time("joinRaw") { joinRaw().count() }
      time("cand_distinct") { joinRaw().distinct().count() }
    } else if (args.length > 1 && args(1) == "setsim") {
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
