package graft

import java.nio.file.Files

import org.apache.spark.ml.{Pipeline, PipelineModel}
import org.apache.spark.ml.linalg.Vectors
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.classification.{LocalLogisticRegression, LocalLogisticRegressionModel}
import graft.feature._
import graft.sampling.{Downsampling, DownsamplingModel}

/** ML persistence: every pipeline stage must `save`/`load` (the modern
  * Spark contract the reference predates) — params round-trip, learned
  * model state round-trips with exact types, and a whole fitted
  * `PipelineModel` containing our stages reloads and scores identically.
  */
class PersistenceSpec extends SparkTestBase {
  import spark.implicits._

  // MLWriter.save resolves the session via getOrCreate(): force the shared
  // local session into existence before any save-only test runs
  spark.sparkContext

  private def tmp(name: String): String =
    Files.createTempDirectory(s"graft_persist_$name").resolve("stage").toString

  private def collectSorted(df: DataFrame): Seq[String] =
    df.collect().map(_.toString).sorted.toSeq

  test("Gather round-trips params") {
    val g = new Gather().setPrimaryKeyCols("cookie").setKeyCol("site")
      .setValueCol("imp").setValueAgg("count").setOutputCol("sites")
    val path = tmp("gather")
    g.write.overwrite().save(path)
    val loaded = Gather.load(path)
    assert(loaded.uid === g.uid)
    def render(x: Gather) = x.extractParamMap().toSeq.map(p => p.param.name -> (p.value match {
      case a: Array[_] => a.toSeq
      case v => v
    })).toMap
    assert(render(loaded) === render(g))
  }

  test("fitted GatherEncoderModel keeps the ESTIMATOR's allOther default through save/load") {
    // regression: fit's copyValues propagates the estimator default
    // (allOther=false) into the model's defaultParamMap, but the model
    // CLASS defaults allOther=true — a reader that restores only explicit
    // params silently flipped it back, and the loaded model emitted
    // vectors one slot WIDER than the model it was saved from
    val df = Seq(
      (1L, Seq(("a", 1.0), ("b", 2.0))),
      (2L, Seq(("a", 3.0))))
      .toDF("id", "raw")
      .select(col("id"), expr("transform(raw, x -> struct(x._1 AS k, x._2 AS v))").as("kv"))
    val fitted = new GatherEncoder().setInputCol("kv").setOutputCol("f")
      .setKeyCol("k").setValueCol("v") // allOther left at the estimator default
      .fit(df)
    val path = tmp("gemDefaults")
    fitted.write.overwrite().save(path)
    val loaded = GatherEncoderModel.load(path)
    assert(loaded.getOrDefault(loaded.allOther) === fitted.getOrDefault(fitted.allOther))
    val sizeOf = (m: GatherEncoderModel) =>
      m.transform(df).select("f").head()
        .getAs[org.apache.spark.ml.linalg.Vector](0).size
    assert(sizeOf(loaded) === sizeOf(fitted),
      "loaded model must emit the same vector width as the model it was saved from")
  }

  test("GatherEncoderModel round-trips mixed-type keys with exact runtime types") {
    val model = new GatherEncoderModel(Array[Any]("siteA", 42L, 7, 3.5))
      .setInputCol("sites").setOutputCol("features")
      .setKeyCol("k").setValueCol("v").setAllOther(true)
    val path = tmp("gem")
    model.write.overwrite().save(path)
    val loaded = GatherEncoderModel.load(path)
    assert(loaded.modelKeys.toSeq === Seq("siteA", 42L, 7, 3.5))
    // typed equality: the Long key must come back as Long, not String/Int
    assert(loaded.modelKeys(1).getClass === classOf[java.lang.Long])
    assert(loaded.modelKeys(2).getClass === classOf[java.lang.Integer])

    val df = Seq(
      (1L, Seq(("siteA", 2.0), ("other", 5.0))),
      (2L, Seq.empty[(String, Double)]))
      .toDF("id", "raw")
      .select(col("id"), expr("transform(raw, x -> struct(x._1 AS k, x._2 AS v))").as("sites"))
    // string-keyed input: only "siteA" is a model key; "other" sums to all-other
    val strModel = new GatherEncoderModel(Array[Any]("siteA", "siteB"))
      .setInputCol("sites").setOutputCol("features")
      .setKeyCol("k").setValueCol("v").setAllOther(true)
    val p2 = tmp("gem2")
    strModel.write.overwrite().save(p2)
    val reloaded = GatherEncoderModel.load(p2)
    assert(collectSorted(reloaded.transform(df).select("id", "features")) ===
      collectSorted(strModel.transform(df).select("id", "features")))
  }

  test("GatherEncoderModel round-trips a large dictionary through the parquet data file") {
    // 100k mixed-type keys: the dictionary must ride the keys parquet file
    // (never one metadata JSON string) and come back in exact order
    val keys: Array[Any] = (0 until 100000).map { i =>
      if (i % 3 == 0) s"site$i" else if (i % 3 == 1) i.toLong else i
    }.toArray
    val model = new GatherEncoderModel(keys)
      .setInputCol("sites").setOutputCol("features")
      .setKeyCol("k").setValueCol("v")
    val path = tmp("gemBig")
    model.write.overwrite().save(path)
    assert(new java.io.File(s"$path/keys").exists(), "keys parquet dir missing")
    val metaLen = spark.read.text(s"$path/metadata")
      .collect().map(_.getString(0).length).sum
    assert(metaLen < 10000, s"metadata unexpectedly large ($metaLen chars)")
    val loaded = GatherEncoderModel.load(path)
    assert(loaded.modelKeys.length === 100000)
    assert(loaded.modelKeys.toSeq === keys.toSeq)
  }

  test("GatherEncoder estimator + excludeKeys round-trips") {
    val enc = new GatherEncoder().setInputCol("sites").setOutputCol("f")
      .setKeyCol("k").setValueCol("v").setCover(95.0)
      .setExcludeKeys(Set[Any]("bad", 13L))
    val path = tmp("genc")
    enc.write.overwrite().save(path)
    val loaded = GatherEncoder.load(path)
    assert(loaded.getExcludeKeys === Set[Any]("bad", 13L))
    assert(loaded.getOrDefault(loaded.cover) === 95.0)
  }

  test("StringToShortIndexerModel round-trips labels and transforms identically") {
    val model = new StringToShortIndexerModel(Array("c", "a", "b"))
      .setInputCol("s").setOutputCol("idx")
    val path = tmp("ssi")
    model.write.overwrite().save(path)
    val loaded = StringToShortIndexerModel.load(path)
    assert(loaded.labels.toSeq === Seq("c", "a", "b"))
    val df = Seq("a", "b", "c").toDF("s")
    assert(collectSorted(loaded.transform(df)) === collectSorted(model.transform(df)))
  }

  test("Binning model round-trips splits") {
    val b = new Binning().setSplits(Array(Double.NegativeInfinity, 0.0, 1.5, Double.PositiveInfinity))
      .setInputCol("x").setOutputCol("bins")
    val path = tmp("binning")
    b.write.overwrite().save(path)
    val loaded = Binning.load(path)
    assert(loaded.getSplits.toSeq === b.getSplits.toSeq)
    val df = Seq(-1.0, 0.5, 2.0).toDF("x")
    assert(collectSorted(loaded.transform(df)) === collectSorted(b.transform(df)))
  }

  test("DownsamplingModel round-trips both branches") {
    val noop = new DownsamplingModel(None).setLabelCol("label")
    val p1 = tmp("ds_noop")
    noop.write.overwrite().save(p1)
    assert(DownsamplingModel.load(p1).sampleFraction === None)

    val sampled = new DownsamplingModel(Some(0.25)).setLabelCol("label")
      .setDeterministicIdCol("id")
    val p2 = tmp("ds_frac")
    sampled.write.overwrite().save(p2)
    val loaded = DownsamplingModel.load(p2)
    assert(loaded.sampleFraction === Some(0.25))
    val df = (0 until 100).map(i => (i.toLong, if (i < 10) 1.0 else 0.0)).toDF("id", "label")
    assert(collectSorted(loaded.transform(df)) === collectSorted(sampled.transform(df)))
  }

  test("LocalLogisticRegressionModel round-trips coefficients and scores identically") {
    val model = new LocalLogisticRegressionModel(
      org.apache.spark.ml.util.Identifiable.randomUID("llr"),
      Vectors.dense(0.5, -1.25), 0.75)
    val path = tmp("llr")
    model.write.overwrite().save(path)
    val loaded = LocalLogisticRegressionModel.load(path)
    assert(loaded.coefficients === model.coefficients)
    assert(loaded.intercept === model.intercept)
    val df = Seq(Tuple1(Vectors.dense(1.0, 2.0)), Tuple1(Vectors.dense(-3.0, 0.5)))
      .toDF("features")
    assert(collectSorted(loaded.transform(df)) === collectSorted(model.transform(df)))
  }

  test("fitted Pipeline with graft stages saves, loads, and scores identically") {
    val train = Seq(
      ("u1", Seq(("a", 3.0), ("b", 1.0)), 1.0),
      ("u2", Seq(("a", 2.0), ("c", 4.0)), 1.0),
      ("u3", Seq(("b", 5.0), ("c", 1.0)), 0.0),
      ("u4", Seq(("c", 2.0), ("b", 2.0)), 0.0),
      ("u5", Seq(("a", 1.0), ("b", 1.0)), 1.0),
      ("u6", Seq(("c", 3.0)), 0.0))
      .toDF("user", "raw", "label")
      .select(col("user"), col("label"),
        expr("transform(raw, x -> struct(x._1 AS k, x._2 AS v))").as("kv"))
      .coalesce(1)

    val pipeline = new Pipeline().setStages(Array(
      new GatherEncoder().setInputCol("kv").setOutputCol("features")
        .setKeyCol("k").setValueCol("v").setAllOther(false),
      new LocalLogisticRegression().setLabelCol("label").setFeaturesCol("features")
        .setRegParam(0.1).setMaxIter(20)))

    val fitted = pipeline.fit(train)
    val path = tmp("pipeline")
    fitted.write.overwrite().save(path)
    val loaded = PipelineModel.load(path)
    assert(collectSorted(loaded.transform(train).select("user", "probability", "prediction")) ===
      collectSorted(fitted.transform(train).select("user", "probability", "prediction")))
  }
}
