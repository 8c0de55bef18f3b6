package graft.examples

import scala.util.Random

import org.apache.spark.ml.feature.VectorAssembler
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.classification.LocalLogisticRegression
import graft.evaluation.BinaryModelMetrics
import graft.feature.{Gather, GatherEncoder, S2CellTransformer}

/** Runnable end-to-end audience-modeling example — the reference's example
  * app (sparkext-example/src/main/scala/com/collective/sparkext/example/
  * SparkMlExtExample.scala:29-145) re-expressed on this engine:
  *
  * impressions → Gather(sites) ‖ geo → S2CellTransformer → Gather(cells)
  * → 3-way join with the response table → GatherEncoder×2 →
  * VectorAssembler → LocalLogisticRegression → gains/lift/AUC.
  *
  * Signal is planted the same way the reference's DataGenerator does
  * (DataGenerator.scala:10-15): positive cookies visit one site pool and
  * city cluster, negatives another, with shared-site and cross-pool noise.
  *
  *   sbt "runMain graft.examples.AudienceModelingExample"
  */
object AudienceModelingExample {

  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master(sys.env.getOrElse("SPARK_MASTER", "local[4]"))
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._

    val rnd = new Random(42)
    val nCookies = 1000
    val posSites = (1 to 8).map(i => s"sports$i.com")
    val negSites = (1 to 8).map(i => s"news$i.com")
    val sharedSites = (1 to 6).map(i => s"portal$i.com")
    val (posCity, negCity) = ((40.7, -74.0), (34.0, -118.2))

    val response = (0 until nCookies)
      .map(c => (s"cookie$c", if (c % 2 == 0) 1.0 else 0.0))
      .toDF("cookie", "label")
    val impressions = (0 until nCookies).flatMap { c =>
      val own = if (c % 2 == 0) posSites else negSites
      val other = if (c % 2 == 0) negSites else posSites
      val visits = Seq.fill(6)(own(rnd.nextInt(own.size))) ++
        Seq.fill(3)(sharedSites(rnd.nextInt(sharedSites.size))) ++
        (if (rnd.nextDouble() < 0.3) Seq(other(rnd.nextInt(8))) else Nil)
      visits.map(s => (s"cookie$c", s, 1L + rnd.nextInt(5)))
    }.toDF("cookie", "site", "impressions")
    val geo = (0 until nCookies).map { c =>
      val (lat, lon) = if (c % 2 == 0) posCity else negCity
      (s"cookie$c", lat + rnd.nextGaussian() * 0.3, lon + rnd.nextGaussian() * 0.3)
    }.toDF("cookie", "lat", "lon")

    val gatheredSites = new Gather()
      .setPrimaryKeyCols("cookie").setKeyCol("site").setValueCol("impressions")
      .setValueAgg("sum").setOutputCol("sites")
      .transform(impressions)
    val gatheredCells = new Gather()
      .setPrimaryKeyCols("cookie").setKeyCol("cell").setValueCol("one")
      .setValueAgg("count").setOutputCol("cells")
      .transform(new S2CellTransformer()
        .setLatCol("lat").setLonCol("lon").setCellCol("cell").setLevel(7)
        .transform(geo).withColumn("one", lit(1L)))

    val dataset: DataFrame = response
      .join(gatheredSites, "cookie")
      .join(gatheredCells, "cookie")
      .cache()

    val siteEncoder = new GatherEncoder()
      .setInputCol("sites").setOutputCol("site_features")
      .setKeyCol("site").setValueCol("impressions")
      .setTransformation("top").setCover(95.0).setAllOther(true)
    val cellEncoder = new GatherEncoder()
      .setInputCol("cells").setOutputCol("cell_features")
      .setKeyCol("cell").setValueCol("one")
      .setTransformation("top").setCover(95.0).setAllOther(true)
    val assembled = new VectorAssembler()
      .setInputCols(Array("site_features", "cell_features")).setOutputCol("features")
      .transform(cellEncoder.fit(dataset).transform(
        siteEncoder.fit(dataset).transform(dataset)))
      .select(col("cookie"), col("label"), col("features"))

    val Array(train, test) = assembled.randomSplit(Array(0.8, 0.2), seed = 42)
    val model = new LocalLogisticRegression()
      .setMaxIter(50).setRegParam(0.01).setElasticNetParam(0.5)
      .fit(train.coalesce(1)) // single partition -> in-executor local training

    val scored = model.transform(test)
      .select(col("probability").as("score"), col("label"))
    val metrics = new BinaryModelMetrics(scored)
    println(f"test AUC = ${metrics.areaUnderROC()}%.4f")
    println("gains curve (reach, recall):")
    new BinaryModelMetrics(scored, numBins = 10).gains().collect()
      .foreach(r => println(f"  ${r.getDouble(0)}%.3f  ${r.getDouble(1)}%.3f"))
    spark.stop()
  }
}
