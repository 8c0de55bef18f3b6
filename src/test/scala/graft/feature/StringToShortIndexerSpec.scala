package graft.feature

import org.apache.spark.SparkException

import graft.SparkTestBase

/** Mirrors FIXTURES.md A6 (reference StringToShortIndexerSpec.scala:10-26). */
class StringToShortIndexerSpec extends SparkTestBase {
  import spark.implicits._

  lazy val df = Seq((0, "a"), (1, "b"), (2, "c"), (3, "a"), (4, "a"), (5, "c"))
    .toDF("id", "label")

  test("labels ordered by desc frequency: a->0, c->1, b->2 as Short") {
    val model = new StringToShortIndexer().setInputCol("label").setOutputCol("idx").fit(df)
    assert(model.labels.toSeq === Seq("a", "c", "b"))
    val out = model.transform(df).select("label", "idx").collect()
      .map(r => r.getString(0) -> r.getShort(1)).toMap
    assert(out === Map("a" -> 0.toShort, "c" -> 1.toShort, "b" -> 2.toShort))
  }

  test("NominalAttribute metadata carries label values") {
    val model = new StringToShortIndexer().setInputCol("label").setOutputCol("idx").fit(df)
    val out = model.transform(df)
    val attr = org.apache.spark.ml.attribute.Attribute
      .fromStructField(out.schema("idx"))
      .asInstanceOf[org.apache.spark.ml.attribute.NominalAttribute]
    assert(attr.values.get.toSeq === Seq("a", "c", "b"))
  }

  test("unseen label throws") {
    val model = new StringToShortIndexerModel(Array("a", "b"))
      .setInputCol("label").setOutputCol("idx")
    val ex = intercept[Exception] { model.transform(df).collect() }
    def causes(t: Throwable): Seq[Throwable] =
      if (t == null) Nil else t +: causes(t.getCause)
    assert(causes(ex).exists(_.getMessage != null) &&
      causes(ex).exists(c => c.getMessage != null && c.getMessage.contains("Unseen label")))
  }

  test("missing input column: silent no-op") {
    val model = new StringToShortIndexerModel(Array("a"))
      .setInputCol("nope").setOutputCol("idx")
    val out = model.transform(df)
    assert(out.schema.fieldNames.toSeq === Seq("id", "label"))
  }

  test("frequency ties broken by label ascending (deterministic)") {
    val tied = Seq((0, "z"), (1, "y"), (2, "z"), (3, "y")).toDF("id", "label")
    val model = new StringToShortIndexer().setInputCol("label").setOutputCol("idx").fit(tied)
    assert(model.labels.toSeq === Seq("y", "z"))
  }
}
