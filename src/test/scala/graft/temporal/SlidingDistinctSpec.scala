package graft.temporal

import org.apache.spark.sql.functions.col

import graft.SparkTestBase

/** Trailing-window exact distinct: hand fixtures, within-window dedup,
  * observed-day restriction, window width 1, and empties.
  */
class SlidingDistinctSpec extends SparkTestBase {
  import spark.implicits._

  private def run(rows: Seq[(Long, Long)], w: Int): Map[Long, Long] =
    SlidingDistinct.perDay(rows.toDF("day", "unit"), col("day"), col("unit"), w)
      .as[(Long, Long)].collect().toMap

  test("trailing 3-day window counts distinct units") {
    // day: units — 1: {a}, 2: {a,b}, 4: {c}
    val rows = Seq((1L, 100L), (2L, 100L), (2L, 200L), (4L, 300L))
    // window(1)= {a}; window(2)= days 0-2 {a,b}; window(4)= days 2-4 {a,b,c}
    assert(run(rows, 3) === Map(1L -> 1L, 2L -> 2L, 4L -> 3L))
  }

  test("a unit active on several window days counts once") {
    val rows = Seq((1L, 9L), (2L, 9L), (3L, 9L))
    assert(run(rows, 7) === Map(1L -> 1L, 2L -> 1L, 3L -> 1L))
  }

  test("only observed days are reported; silent middle days still contribute") {
    // unit 5 active on day 1 only; day 3 observed via unit 6: its 3-day
    // window covers day 1, so both units count even though day 2 is silent
    val rows = Seq((1L, 5L), (3L, 6L))
    assert(run(rows, 3) === Map(1L -> 1L, 3L -> 2L))
  }

  test("windowDays = 1 degenerates to per-day distinct") {
    val rows = Seq((1L, 5L), (1L, 6L), (2L, 5L))
    assert(run(rows, 1) === Map(1L -> 2L, 2L -> 1L))
  }

  test("duplicate events collapse; empty input is clean") {
    val rows = Seq((1L, 5L), (1L, 5L), (1L, 5L))
    assert(run(rows, 7) === Map(1L -> 1L))
    assert(run(Seq.empty, 7) === Map.empty)
  }
}
