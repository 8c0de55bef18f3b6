package graft.feature

import graft.SparkTestBase

/** Mirrors FIXTURES.md A5 (reference S2CellTransformerSpec.scala:11-43). */
class S2CellTransformerSpec extends SparkTestBase {
  import spark.implicits._

  lazy val cities = Seq(
    ("New York", 40.71427, -74.00597),
    ("London", 51.50722, -0.12750),
    ("Princeton", 40.34872, -74.65905)).toDF("city", "lat", "lon")

  def cellsAt(level: Int): Map[String, String] =
    new S2CellTransformer().setLatCol("lat").setLonCol("lon")
      .setCellCol("cell").setLevel(level)
      .transform(cities)
      .select("city", "cell").collect()
      .map(r => r.getString(0) -> r.getString(1)).toMap

  test("level 6: New York and Princeton share a cell, London is distinct") {
    val cells = cellsAt(6)
    assert(cells("New York") === cells("Princeton"))
    assert(cells("New York") !== cells("London"))
  }

  test("level 12: all three cities in distinct cells") {
    val cells = cellsAt(12)
    assert(cells.values.toSet.size === 3)
  }

  test("default level is 10; output column appended as string") {
    val out = new S2CellTransformer().setLatCol("lat").setLonCol("lon")
      .setCellCol("cell").transform(cities)
    assert(out.schema("cell").dataType === org.apache.spark.sql.types.StringType)
    assert(out.count() === 3)
  }

  test("rejects non-double lat/lon") {
    val bad = Seq(("a", 1, 2.0)).toDF("city", "lat", "lon")
    intercept[IllegalArgumentException] {
      new S2CellTransformer().setLatCol("lat").setLonCol("lon").transform(bad)
    }
  }
}
