package graft.feature

import graft.SparkTestBase
import org.apache.spark.sql.functions._

/** Median/MAD flagging vs hand-computed robust z-scores. */
class RobustOutliersSpec extends SparkTestBase {
  import spark.implicits._

  test("flags only the planted outlier") {
    // g: values 1..9 plus 100 -> median 5.5, deviations {0.5..4.5, 94.5},
    // MAD = median{0.5,0.5,1.5,1.5,2.5,2.5,3.5,3.5,4.5,94.5} = 2.5
    // robust_z(100) = 94.5/2.5 = 37.8; robust_z(9) = 3.5/2.5 = 1.4
    val df = ((1 to 9).map(_.toDouble) :+ 100.0).zipWithIndex
      .map { case (v, i) => (i.toLong, "g", v) }.toDF("id", "grp", "v")
    val got = new RobustOutliers(cutoff = 3.5).flag(df, "grp", "v")
      .where(col("is_outlier")).select("id", "v", "robust_z")
      .as[(Long, Double, Double)].collect()
    assert(got.map(_._2).toSeq === Seq(100.0))
    assert(math.abs(got.head._3 - 37.8) < 1e-9)
  }

  test("zero-MAD group flags nothing instead of dividing by zero") {
    val df = Seq((1L, "c", 5.0), (2L, "c", 5.0), (3L, "c", 5.0), (4L, "c", 99.0))
      .toDF("id", "grp", "v") // median 5, MAD 0
    val flagged = new RobustOutliers().flag(df, "grp", "v")
      .where(col("is_outlier")).count()
    assert(flagged === 0L)
  }

  test("null group keys are screened, not dropped") {
    val df = Seq[(Long, String, Double)]((1L, null, 1.0), (2L, null, 2.0),
      (3L, null, 3.0), (4L, null, 500.0), (5L, "g", 7.0))
      .toDF("id", "grp", "v")
    val out = new RobustOutliers().flag(df, "grp", "v")
    assert(out.count() === 5L) // row-preserving incl. the null group
    val flagged = out.where(col("is_outlier")).select("id").as[Long].collect().toSet
    assert(flagged === Set(4L)) // outlier within the null group is found
  }

  test("approx flags agree with exact on all but boundary rows at sf0.01") {
    val ev = spark.read.parquet("/root/testdata/sf0.01/events.parquet")
      .select(col("event_id"), col("event_type"), col("value"))
    def flags(approx: Boolean): Map[Long, Boolean] =
      new RobustOutliers(3.5, approx).flag(ev, "event_type", "value")
        .select(col("event_id"), col("is_outlier"))
        .as[(Long, Boolean)].collect().toMap
    val e = flags(false)
    val a = flags(true)
    val disagree = e.count { case (id, f) => a(id) != f }
    // sketch error can flip only rows whose robust z sits at the cutoff;
    // that boundary band is a small fraction of the table
    assert(disagree <= e.size / 100, s"disagreements: $disagree of ${e.size}")
  }

  test("groups are independent") {
    val df = Seq((1L, "a", 1.0), (2L, "a", 2.0), (3L, "a", 3.0), (4L, "a", 50.0),
      (5L, "b", 50.0), (6L, "b", 51.0), (7L, "b", 52.0)).toDF("id", "grp", "v")
    val got = new RobustOutliers().flag(df, "grp", "v")
      .where(col("is_outlier")).select("id").as[Long].collect().toSet
    assert(got === Set(4L)) // 50 is an outlier in a, normal in b
  }
}
