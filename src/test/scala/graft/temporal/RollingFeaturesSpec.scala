package graft.temporal

import graft.SparkTestBase
import org.apache.spark.sql.Row

/** Rolling trailing-window features: leakage-freedom and frame math. */
class RollingFeaturesSpec extends SparkTestBase {
  import spark.implicits._

  private val ev = Seq(
    // (event_id, user_id, ts_us, value)
    (1L, 7L, 100L, 10.0),
    (2L, 7L, 200L, 20.0),
    (3L, 7L, 300L, 30.0),
    (4L, 9L, 100L, 5.0)).toDF("event_id", "user_id", "ts_us", "value")

  test("trailing frame excludes the current row (no leakage)") {
    val out = new RollingFeatures(n = 5).transform(ev)
      .orderBy("user_id", "ts_us").collect()
    val r3 = out.find(_.getLong(0) == 3L).get
    // row 3 sees only rows 1 and 2
    assert(r3.getAs[Long]("roll_n") === 2L)
    assert(r3.getAs[Double]("roll_mean") === 15.0)
    assert(r3.getAs[Double]("roll_sum") === 30.0)
    assert(r3.getAs[Double]("roll_max") === 20.0)
    assert(r3.getAs[Double]("lag1") === 20.0)
    assert(r3.getAs[Double]("delta") === 10.0)
  }

  test("a key's first row has empty history (nulls), other keys unaffected") {
    val out = new RollingFeatures(n = 5).transform(ev).collect()
    val r1 = out.find(_.getLong(0) == 1L).get
    assert(r1.getAs[Long]("roll_n") === 0L)
    assert(r1.isNullAt(r1.fieldIndex("roll_mean")))
    assert(r1.isNullAt(r1.fieldIndex("lag1")))
    val r4 = out.find(_.getLong(0) == 4L).get // sole row of user 9
    assert(r4.getAs[Long]("roll_n") === 0L)
  }

  test("frame is capped at n trailing rows") {
    val many = (1L to 10L).map(i => (i, 1L, i * 100L, i.toDouble))
      .toDF("event_id", "user_id", "ts_us", "value")
    val out = new RollingFeatures(n = 3).transform(many).collect()
    val r10 = out.find(_.getLong(0) == 10L).get
    assert(r10.getAs[Long]("roll_n") === 3L)
    assert(r10.getAs[Double]("roll_mean") === 8.0) // mean(7,8,9)
  }

  test("single keyed shuffle: window partitioning is the key column (plan)") {
    val plan = new RollingFeatures(n = 5).transform(ev)
      .queryExecution.executedPlan.toString
    assert(plan.contains("Window"), plan)
    // exactly one exchange: the key hash partitioning
    assert("Exchange hashpartitioning".r.findAllIn(plan).length === 1, plan)
  }
}
