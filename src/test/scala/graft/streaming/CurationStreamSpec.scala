package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import graft.SparkTestBase
import graft.text.{HashedNgramFeaturizer, QualityFilter}

/** The q104 scoring front-end (quality filter → row-local hashed-ngram
  * margin → sigmoid md5-coin acceptance) is stateless and row-local, so
  * the SAME plan runs under Structured Streaming with no state store and
  * no watermark — this spec pins that batch/stream parity. (The dedup and
  * packing stages are deliberately excluded: those are corpus-level and
  * live behind [[StreamingDedup]]'s windowed state instead.)
  */
case class CurationDoc(doc_id: Long, text: String)

class CurationStreamSpec extends SparkTestBase {
  import spark.implicits._

  private def scorePlan(df: DataFrame): DataFrame = {
    val filtered = new QualityFilter().setTextCol("text")
      .setMinTokens(5).setMaxTokens(100000)
      .setMaxPunctRatio(0.5).setMinQuality(0.0).transform(df)
    val scored = filtered.withColumn("margin",
      new HashedNgramFeaturizer(dim = 4096)
        .marginCol(col("text"), b => b % 7 - 3) / 10.0 - 0.3)
    val coin = graft.sql.functions.uniform32("clf", col("doc_id"))
    scored.where(coin.cast("double") <
        lit(4294967296.0) / (lit(1.0) + exp(-col("margin"))))
      .select($"doc_id", round($"margin", 6).as("margin"))
  }

  test("classifier scoring + acceptance is stateless row-local: stream == batch") {
    implicit val sqlCtx = spark.sqlContext
    val docs = (1L to 200L).map { i =>
      CurationDoc(i, s"sample document number $i with " +
        ("padding " * ((i % 13).toInt + 1)) + "trailing content here")
    }
    val input = MemoryStream[CurationDoc]
    val query = scorePlan(input.toDF()).writeStream
      .format("memory").queryName("cur_out").outputMode("append").start()
    try {
      input.addData(docs.take(100): _*)
      query.processAllAvailable()
      input.addData(docs.drop(100): _*)
      query.processAllAvailable()
      val streamed = spark.table("cur_out").as[(Long, Double)].collect().toSet
      val batch = scorePlan(docs.toDF()).as[(Long, Double)].collect().toSet
      assert(batch.nonEmpty && batch.size < docs.size) // the coin really rejects some
      assert(streamed === batch)
    } finally query.stop()
  }
}
