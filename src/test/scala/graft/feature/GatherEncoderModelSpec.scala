package graft.feature

import org.apache.spark.ml.linalg.{SparseVector, Vector, Vectors}
import org.apache.spark.sql.Row
import org.apache.spark.sql.types._

import graft.SparkTestBase

/** Mirrors the reference model-transform fixture (FIXTURES.md A3,
  * GatherEncoderModelSpec.scala:11-162): 5 cookies with keyed struct arrays,
  * model keys [google, bbc, cnn].
  */
class GatherEncoderModelSpec extends SparkTestBase {

  val schema = StructType(Seq(
    StructField("cookie_id", StringType),
    StructField("sites", ArrayType(StructType(Seq(
      StructField("site", StringType),
      StructField("site_id", IntegerType),
      StructField("impressions", LongType))), containsNull = true), nullable = true)))

  lazy val df = spark.createDataFrame(sc.parallelize(Seq(
    Row("cookie1", Seq(Row("google.com", 1, 12L), Row("cnn.com", 2, 14L))),
    Row("cookie2", Seq(Row("bbc.com", 3, 20L), Row("auto.com", 4, 1L), Row("moto.com", 5, 3L))),
    Row("cookie3", Seq(Row("sport.com", 6, 100L))),
    Row("cookie4", Seq.empty[Row]),
    Row("cookie5", null))), schema)

  def model(keys: Array[Any], allOther: Boolean): GatherEncoderModel =
    new GatherEncoderModel(keys)
      .setInputCol("sites").setOutputCol("features")
      .setKeyCol("site").setValueCol("impressions")
      .setAllOther(allOther)

  def collectVectors(m: GatherEncoderModel): Map[String, Vector] =
    m.transform(df).select("cookie_id", "features").collect()
      .map(r => r.getString(0) -> r.getAs[Vector](1)).toMap

  test("no all-other: size 3, unseen keys dropped, null/empty → empty sparse") {
    val vs = collectVectors(model(Array("google.com", "bbc.com", "cnn.com"), allOther = false))
    assert(vs("cookie1") === Vectors.sparse(3, Seq(0 -> 12.0, 2 -> 14.0)))
    assert(vs("cookie2") === Vectors.sparse(3, Seq(1 -> 20.0)))
    assert(vs("cookie3") === Vectors.sparse(3, Nil))
    assert(vs("cookie4") === Vectors.sparse(3, Nil))
    assert(vs("cookie5") === Vectors.sparse(3, Nil))
  }

  test("all-other: size 4, unseen values SUMMED into slot 3") {
    val vs = collectVectors(model(Array("google.com", "bbc.com", "cnn.com"), allOther = true))
    assert(vs("cookie1") === Vectors.sparse(4, Seq(0 -> 12.0, 2 -> 14.0)))
    // auto.com(1) + moto.com(3) summed into all-other
    assert(vs("cookie2") === Vectors.sparse(4, Seq(1 -> 20.0, 3 -> 4.0)))
    assert(vs("cookie3") === Vectors.sparse(4, Seq(3 -> 100.0)))
    assert(vs("cookie4") === Vectors.sparse(4, Nil))
    assert(vs("cookie5") === Vectors.sparse(4, Nil))
  }

  test("key type does not matter: integer site_id keys") {
    val m = new GatherEncoderModel(Array[Any](1, 3, 2))
      .setInputCol("sites").setOutputCol("features")
      .setKeyCol("site_id").setValueCol("impressions")
      .setAllOther(false)
    val vs = m.transform(df).select("cookie_id", "features").collect()
      .map(r => r.getString(0) -> r.getAs[Vector](1)).toMap
    assert(vs("cookie1") === Vectors.sparse(3, Seq(0 -> 12.0, 2 -> 14.0)))
    assert(vs("cookie2") === Vectors.sparse(3, Seq(1 -> 20.0)))
  }

  test("duplicate key in one row: LATEST value wins (not summed)") {
    val dupDf = spark.createDataFrame(sc.parallelize(Seq(
      Row("c1", Seq(Row("google.com", 1, 5L), Row("google.com", 1, 7L))))), schema)
    val m = model(Array("google.com"), allOther = false)
    val v = m.transform(dupDf).select("features").first().getAs[Vector](0)
    assert(v === Vectors.sparse(1, Seq(0 -> 7.0)))
  }

  test("empty model keys: fail by default, degenerate empty vector when lenient") {
    intercept[IllegalArgumentException] {
      model(Array.empty[Any], allOther = false).transform(df).collect()
    }
    val lenient = model(Array.empty[Any], allOther = false).setFailOnEmptyKeys(false)
    val v = lenient.transform(df).select("features").first().getAs[Vector](0)
    assert(v.size === 0)
  }
}
