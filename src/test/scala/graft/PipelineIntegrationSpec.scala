package graft

import scala.util.Random

import org.apache.spark.ml.feature.VectorAssembler
import org.apache.spark.sql.functions._

import graft.classification.LocalLogisticRegression
import graft.evaluation.BinaryModelMetrics
import graft.feature.{Gather, GatherEncoder, S2CellTransformer}

/** End-to-end audience-modeling pipeline — the reference's integration
  * query (SparkMlExtExample.scala:29-145) re-run on our operators:
  *
  * impressions → Gather(sites) ‖ geo → S2CellTransformer → Gather(cells)
  * → 3-way join with the response table → GatherEncoder×2 →
  * VectorAssembler → LocalLogisticRegression → BinaryModelMetrics AUC.
  *
  * The synthetic corpus plants signal the same way the reference's
  * DataGenerator does (DataGenerator.scala:10-15): positive cookies visit
  * one site pool / city cluster, negatives another, with overlap noise.
  */
class PipelineIntegrationSpec extends SparkTestBase {
  import spark.implicits._

  private val rnd = new Random(42)
  private val nCookies = 400

  private val posSites = (1 to 8).map(i => s"sports$i.com")
  private val negSites = (1 to 8).map(i => s"news$i.com")
  private val sharedSites = (1 to 6).map(i => s"portal$i.com")

  // two geographic clusters ~1000 km apart
  private val posCity = (40.7, -74.0)
  private val negCity = (34.0, -118.2)

  lazy val response = (0 until nCookies).map { c =>
    (s"cookie$c", if (c % 2 == 0) 1.0 else 0.0)
  }.toDF("cookie", "label")

  lazy val impressions = (0 until nCookies).flatMap { c =>
    val positive = c % 2 == 0
    val own = if (positive) posSites else negSites
    val visits =
      Seq.fill(6)(own(rnd.nextInt(own.size))) ++
        Seq.fill(3)(sharedSites(rnd.nextInt(sharedSites.size))) ++
        // noise: occasional visit into the other pool
        (if (rnd.nextDouble() < 0.3)
          Seq((if (positive) negSites else posSites)(rnd.nextInt(8))) else Nil)
    visits.map(s => (s"cookie$c", s, 1L + rnd.nextInt(5)))
  }.toDF("cookie", "site", "impressions")

  lazy val geo = (0 until nCookies).map { c =>
    val (lat, lon) = if (c % 2 == 0) posCity else negCity
    (s"cookie$c", lat + rnd.nextGaussian() * 0.3, lon + rnd.nextGaussian() * 0.3)
  }.toDF("cookie", "lat", "lon")

  // shared feature-assembly front half (both tests consume it)
  lazy val assembledFeatures = {
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

    val dataset = response
      .join(gatheredSites, "cookie")
      .join(gatheredCells, "cookie")
      .cache()
    assert(dataset.count() === nCookies)

    val siteEncoder = new GatherEncoder()
      .setInputCol("sites").setOutputCol("site_features")
      .setKeyCol("site").setValueCol("impressions")
      .setTransformation("top").setCover(95.0).setAllOther(true)
    val cellEncoder = new GatherEncoder()
      .setInputCol("cells").setOutputCol("cell_features")
      .setKeyCol("cell").setValueCol("one")
      .setTransformation("top").setCover(95.0).setAllOther(true)

    val encoded = cellEncoder.fit(dataset).transform(
      siteEncoder.fit(dataset).transform(dataset))

    new VectorAssembler()
      .setInputCols(Array("site_features", "cell_features"))
      .setOutputCol("features")
      .transform(encoded)
      .select("cookie", "label", "features")
      .coalesce(1) // exercise the LOCAL training path
  }

  test("gather → encode → assemble → LR → AUC over 0.9") {
    val assembled = assembledFeatures
    val model = new LocalLogisticRegression()
      .setMaxIter(50).setRegParam(0.01).setElasticNetParam(0.5)
      .fit(assembled)

    val scored = model.transform(assembled)
      .select(col("probability").as("score"), col("label"))

    val auc = new BinaryModelMetrics(scored).areaUnderROC()
    assert(auc > 0.9, s"pipeline AUC $auc should separate the planted signal")

    // sanity: the other curve endpoints behave
    val gains = new BinaryModelMetrics(scored).gains().collect()
    assert(gains.head.getDouble(0) === 0.0 && gains.last.getDouble(1) === 1.0)
  }

  test("cross-validated Spark pipeline selects a model on the same features") {
    // the reference example's final leg (SparkMlExtExample.scala:111-129):
    // Pipeline[LogisticRegression] under CrossValidator with an
    // elastic-net grid, evaluated by areaUnderROC
    import org.apache.spark.ml.Pipeline
    import org.apache.spark.ml.classification.LogisticRegression
    import org.apache.spark.ml.evaluation.BinaryClassificationEvaluator
    import org.apache.spark.ml.tuning.{CrossValidator, ParamGridBuilder}

    val lr = new LogisticRegression().setMaxIter(25).setRegParam(0.01)
    val cv = new CrossValidator()
      .setEstimator(new Pipeline().setStages(Array(lr)))
      .setEvaluator(new BinaryClassificationEvaluator().setMetricName("areaUnderROC"))
      .setEstimatorParamMaps(new ParamGridBuilder()
        .addGrid(lr.elasticNetParam, Array(0.1, 0.5)).build())
      .setNumFolds(2)
      .setSeed(42L)

    val cvModel = cv.fit(assembledFeatures)
    assert(cvModel.avgMetrics.length === 2)
    assert(cvModel.avgMetrics.max > 0.85,
      s"best CV AUC ${cvModel.avgMetrics.max} should separate the planted signal")
  }
}
