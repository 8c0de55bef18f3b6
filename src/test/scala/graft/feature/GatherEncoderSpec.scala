package graft.feature

import org.apache.spark.ml.linalg.{SparseVector, Vector}
import org.apache.spark.sql.Row
import org.apache.spark.sql.types._

import graft.SparkTestBase

/** Mirrors the reference coverage-distribution fixture (FIXTURES.md A2,
  * GatherEncoderSpec.scala:10-165): 1000 key occurrences across 9 keys with
  * exact cumulative percentages.
  */
class GatherEncoderSpec extends SparkTestBase {

  val schema = StructType(Seq(
    StructField("cookie_id", StringType),
    StructField("sites", ArrayType(StructType(Seq(
      StructField("site", StringType),
      StructField("impressions", LongType))), containsNull = false), nullable = true)))

  def sites(kvs: (String, Long)*): Seq[Row] = kvs.map { case (k, v) => Row(k, v) }

  lazy val rows: Seq[Row] =
    Seq.fill(250)(Row("cookie1", sites("google.com" -> 12L, "cnn.com" -> 14L))) ++
    Seq.fill(100)(Row("cookie2", sites("bbc.com" -> 20L, "auto.com" -> 1L, "moto.com" -> 3L))) ++
    Seq.fill(80)(Row("cookie3", sites("sport.com" -> 100L))) ++
    Seq.fill(50)(Row("cookie3", sites("netflix.com" -> 1L))) ++
    Seq.fill(40)(Row("cookie3", sites("amazon.com" -> 1L))) ++
    Seq.fill(30)(Row("cookie3", sites("imdb.com" -> 1L))) ++
    Seq.fill(150)(Row("cookie4", Seq.empty[Row])) ++
    Seq.fill(150)(Row("cookie5", null))

  lazy val df = spark.createDataFrame(sc.parallelize(rows), schema)

  def encoder: GatherEncoder = new GatherEncoder()
    .setInputCol("sites").setOutputCol("features")
    .setKeyCol("site").setValueCol("impressions")

  def fitKeys(e: GatherEncoder): Set[String] =
    e.fit(df).modelKeys.map(_.toString).toSet

  val all9 = Set("google.com", "cnn.com", "bbc.com", "auto.com", "moto.com",
    "sport.com", "netflix.com", "amazon.com", "imdb.com")

  test("top, cover=100 keeps all 9 keys") {
    assert(fitKeys(encoder.setTransformation("top").setCover(100.0)) === all9)
  }
  test("top, cover=95 keeps 8 keys (drop imdb)") {
    assert(fitKeys(encoder.setTransformation("top").setCover(95.0)) === all9 - "imdb.com")
  }
  test("top, cover=90 keeps 7 keys") {
    assert(fitKeys(encoder.setTransformation("top").setCover(90.0)) ===
      all9 -- Set("imdb.com", "amazon.com"))
  }
  test("top, cover=85 keeps 6 keys (drop netflix)") {
    assert(fitKeys(encoder.setTransformation("top").setCover(85.0)) ===
      all9 -- Set("imdb.com", "amazon.com", "netflix.com"))
  }
  test("top, cover=75 keeps 5 keys (drop sport)") {
    assert(fitKeys(encoder.setTransformation("top").setCover(75.0)) ===
      all9 -- Set("imdb.com", "amazon.com", "netflix.com", "sport.com"))
  }
  test("index, support=1 keeps all 9") {
    assert(fitKeys(encoder.setTransformation("index").setSupport(1.0)) === all9)
  }
  test("index, support=3.1 drops imdb") {
    assert(fitKeys(encoder.setTransformation("index").setSupport(3.1)) === all9 - "imdb.com")
  }
  test("index, support=4.1 drops imdb+amazon") {
    assert(fitKeys(encoder.setTransformation("index").setSupport(4.1)) ===
      all9 -- Set("imdb.com", "amazon.com"))
  }
  test("excludeKeys filtered out of the model") {
    assert(fitKeys(encoder.setTransformation("top").setCover(100.0)
      .setExcludeKeys(Set("google.com"))) === all9 - "google.com")
  }

  test("mixed-type excludeKeys against a string key column neither throws nor cross-matches") {
    // 13L and 1 can never equal a string key: exclude semantics keep the
    // key — cross-family values must not reach the ANSI isin cast
    assert(fitKeys(encoder.setTransformation("top").setCover(100.0)
      .setExcludeKeys(Set[Any]("google.com", 13L, 1))) === all9 - "google.com")
  }

  test("excludeKeys on a numeric key column excludes across numeric widths") {
    val numSchema = StructType(Seq(
      StructField("id", StringType),
      StructField("kv", ArrayType(StructType(Seq(
        StructField("k", LongType),
        StructField("v", LongType))), containsNull = false))))
    val numRows = Seq(
      Row("a", Seq(Row(1L, 2L), Row(2L, 3L))),
      Row("b", Seq(Row(2L, 4L), Row(3L, 5L))))
    val numDf = spark.createDataFrame(sc.parallelize(numRows), numSchema)
    val keys = new GatherEncoder().setInputCol("kv").setOutputCol("f")
      .setKeyCol("k").setValueCol("v")
      .setTransformation("top").setCover(100.0)
      .setExcludeKeys(Set[Any](2, "nope")) // Int literal against LONG keys
      .fit(numDf).modelKeys.toSet
    assert(keys === Set[Any](1L, 3L))
  }

  test("all-empty/null input learns 0 keys; transform then fails or degenerates") {
    val emptySchema = schema
    val emptyRows = Seq.fill(5)(Row("c", Seq.empty[Row])) ++ Seq.fill(5)(Row("c", null))
    val emptyDf = spark.createDataFrame(sc.parallelize(emptyRows), emptySchema)
    val model = encoder.setTransformation("top").setCover(100.0).fit(emptyDf)
    assert(model.modelKeys.isEmpty)
    intercept[IllegalArgumentException] { model.transform(emptyDf).collect() }
    val lenient = model.copy(org.apache.spark.ml.param.ParamMap.empty)
      .setFailOnEmptyKeys(false)
    val out = lenient.transform(emptyDf).select("features").collect()
    assert(out.forall(_.getAs[Vector](0).size === 0))
  }

  test("model vectors carry AttributeGroup metadata incl. all other") {
    val model = encoder.setTransformation("top").setCover(75.0).setAllOther(true).fit(df)
    val out = model.transform(df)
    val group = org.apache.spark.ml.attribute.AttributeGroup
      .fromStructField(out.schema("features"))
    assert(group.size === 6) // 5 keys + all other
    assert(group.attributes.get.last.name === Some("all other"))
  }

  test("keepInputCol=false drops the input column") {
    val model = encoder.setTransformation("top").setKeepInputCol(false).fit(df)
    assert(!model.transform(df).schema.fieldNames.contains("sites"))
  }

  test("maxKeys bounds the driver collect without changing the selection") {
    // 5 selected keys at cover=75 fit a bound of 5 -> identical model
    val bounded = encoder.setTransformation("top").setCover(75.0).setMaxKeys(5)
    assert(fitKeys(bounded) === fitKeys(encoder.setTransformation("top").setCover(75.0)))
  }

  test("maxKeys overflow fails loudly instead of silently truncating") {
    val e = encoder.setTransformation("top").setCover(100.0).setMaxKeys(3)
    val ex = intercept[IllegalArgumentException](e.fit(df))
    assert(ex.getMessage.contains("maxKeys"))
    // selection needing > maxKeys keys at cover<100 also fails
    val e2 = encoder.setTransformation("top").setCover(99.0).setMaxKeys(2)
    intercept[IllegalArgumentException](e2.fit(df))
  }
}
