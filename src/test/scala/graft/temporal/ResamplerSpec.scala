package graft.temporal

import graft.SparkTestBase

class ResamplerSpec extends SparkTestBase {
  import spark.implicits._

  // step 10: key x observed in ticks 1, 1, 4 (gap at 2-3); key y in tick 2
  // only; tick 1 for x has two observations — the later one (t=19) is the
  // terminal value
  lazy val obs = Seq(
    ("x", 12L, 1.0, 1L),
    ("x", 19L, 2.0, 2L),
    ("x", 47L, 9.0, 3L),
    ("y", 25L, 5.0, 4L))
    .toDF("user_id", "ts_us", "value", "event_id")

  private lazy val out =
    new Resampler(10L).resample(obs)
      .as[(String, Long, Double)].collect()
      .map(r => (r._1, r._2) -> r._3).toMap

  test("grid spans each key's own observed ticks, densely") {
    assert(out.keySet === Set(
      "x" -> 1L, "x" -> 2L, "x" -> 3L, "x" -> 4L, "y" -> 2L))
  }

  test("terminal observation per tick wins; gaps carry the last value") {
    assert(out("x" -> 1L) === 2.0)   // t=19 beats t=12 inside the tick
    assert(out("x" -> 2L) === 2.0)   // LOCF
    assert(out("x" -> 3L) === 2.0)   // LOCF
    assert(out("x" -> 4L) === 9.0)
    assert(out("y" -> 2L) === 5.0)
  }

  test("duplicate timestamps break ties by the tiebreak column") {
    val dup = Seq(
      ("z", 10L, 1.0, 7L),
      ("z", 10L, 3.0, 9L)) // higher event_id -> terminal
      .toDF("user_id", "ts_us", "value", "event_id")
    val v = new Resampler(10L).resample(dup)
      .as[(String, Long, Double)].collect()
    assert(v.toSeq === Seq(("z", 1L, 3.0)))
  }

  test("tick arithmetic is exact at large epoch-µs magnitudes") {
    // 2024-01-30T23:59:59.999999Z µs with a daily step: the pmod trick
    // must land exactly on floor(t / step), never one off from a double
    // rounding of the division
    val t = 1706659199999999L
    val day = 86400000000L
    val one = Seq(("u", t, 1.0, 1L)).toDF("user_id", "ts_us", "value", "event_id")
    val tick = new Resampler(day).resample(one)
      .as[(String, Long, Double)].collect().head._2
    assert(tick === t / day)
  }
}
