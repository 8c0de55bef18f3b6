package graft.feature

import org.apache.spark.sql.Row
import org.apache.spark.sql.types._

import graft.SparkTestBase
import graft.sql.functions._

/** Mirrors the reference's 7-row impression log fixture
  * (ExtAggregatesSpec.scala:13-31, GatherSpec.scala:12-30) — see FIXTURES.md A1.
  */
class GatherSpec extends SparkTestBase {

  val schema = StructType(Seq(
    StructField("cookie_id", StringType),
    StructField("site", StringType),
    StructField("impressions", LongType, nullable = true)))

  lazy val impressionLog = spark.createDataFrame(sc.parallelize(Seq(
    Row("cookie1", "google.com", 10L),
    Row("cookie1", "cnn.com", 14L),
    Row("cookie1", "google.com", 2L),
    Row("cookie2", "bbc.com", 20L),
    Row("cookie2", "auto.com", null),
    Row("cookie2", "auto.com", 1L),
    Row("cookie3", "sport.com", 100L))), schema)

  test("collectArray collects all values: 7 total, 3 distinct cookies") {
    import org.apache.spark.sql.functions._
    val all = impressionLog.select(collectArray(col("cookie_id"))).first().getSeq[String](0)
    assert(all.size === 7)
    val distinct = impressionLog.select(col("cookie_id")).distinct()
      .select(collectArray(col("cookie_id"))).first().getSeq[String](0)
    assert(distinct.size === 3)
  }

  test("collectArray after groupBy: per-cookie site arrays of sizes 3/3/1") {
    import org.apache.spark.sql.functions._
    val sizes = impressionLog.groupBy(col("cookie_id"))
      .agg(collectArray(col("site")).as("sites"))
      .collect().map(r => r.getString(0) -> r.getSeq[String](1).size).toMap
    assert(sizes === Map("cookie1" -> 3, "cookie2" -> 3, "cookie3" -> 1))
  }

  test("gather with sum: null impressions skipped, value always Double") {
    val gathered = new Gather()
      .setPrimaryKeyCols("cookie_id")
      .setKeyCol("site")
      .setValueCol("impressions")
      .setValueAgg("sum")
      .setOutputCol("sites")
      .transform(impressionLog)

    val bySite = gathered.collect().map { r =>
      r.getString(0) -> r.getSeq[Row](1).map(s => s.getString(0) -> s.getDouble(1)).toMap
    }.toMap

    assert(bySite("cookie1") === Map("google.com" -> 12.0, "cnn.com" -> 14.0))
    assert(bySite("cookie2") === Map("bbc.com" -> 20.0, "auto.com" -> 1.0))
    assert(bySite("cookie3") === Map("sport.com" -> 100.0))
    // output value type is Double regardless of Long input
    val valueType = gathered.schema("sites").dataType
      .asInstanceOf[ArrayType].elementType.asInstanceOf[StructType]("impressions").dataType
    assert(valueType === DoubleType)
  }

  test("gather with count") {
    val gathered = new Gather()
      .setPrimaryKeyCols("cookie_id")
      .setKeyCol("site")
      .setValueCol("impressions")
      .setValueAgg("count")
      .setOutputCol("sites")
      .transform(impressionLog)
    val cookie2 = gathered.filter("cookie_id = 'cookie2'")
      .first().getSeq[Row](1).map(s => s.getString(0) -> s.getDouble(1)).toMap
    // count skips the null impression: auto.com counted once
    assert(cookie2 === Map("bbc.com" -> 1.0, "auto.com" -> 1.0))
  }

  test("all-null-value key drops the (key, null) pair — documented divergence") {
    // the reference keeps struct(key, null) for an all-null group
    // (Gather.scala:81-83 + aggregates.scala:37-56); we drop it
    val withAllNull = spark.createDataFrame(sc.parallelize(Seq(
      Row("cookie9", "nulls.com", null),
      Row("cookie9", "nulls.com", null),
      Row("cookie9", "live.com", 5L))), schema)
    val gathered = new Gather()
      .setPrimaryKeyCols("cookie_id").setKeyCol("site")
      .setValueCol("impressions").setValueAgg("sum").setOutputCol("sites")
      .transform(withAllNull)
    val sites = gathered.first().getSeq[Row](1).map(_.getString(0))
    assert(sites === Seq("live.com")) // nulls.com pair dropped, not kept as (key, null)
  }

  test("gather copy returns Gather (reference Gather.scala:118 bug fixed)") {
    val g = new Gather().setPrimaryKeyCols("a").setKeyCol("k").setValueCol("v")
    assert(g.copy(org.apache.spark.ml.param.ParamMap.empty).isInstanceOf[Gather])
  }

  test("gather rejects non-numeric value column") {
    val g = new Gather().setPrimaryKeyCols("cookie_id").setKeyCol("site").setValueCol("site")
    intercept[IllegalArgumentException] { g.transform(impressionLog) }
  }
}
