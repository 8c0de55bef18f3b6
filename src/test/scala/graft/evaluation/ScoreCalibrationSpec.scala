package graft.evaluation

import graft.SparkTestBase

class ScoreCalibrationSpec extends SparkTestBase {
  import spark.implicits._

  // bin 0: scores .05/.15? no — bins are floor(score*5) with 5 bins here.
  // Fixture chosen so the per-bin means are exact binary fractions.
  lazy val df = Seq(
    (0.1, 0.0), (0.1, 0.0),   // bin 0: conf .1, acc 0
    (0.5, 1.0), (0.5, 0.0),   // bin 2: conf .5, acc .5
    (0.9, 1.0), (0.9, 1.0),   // bin 4: conf .9, acc 1
    (1.0, 1.0))               // score 1.0 clamps into the last bin
    .toDF("score", "label")

  private lazy val cal = new ScoreCalibration(numBins = 5)
  private lazy val rel = cal.reliability(df, "score", "label")

  test("reliability bins: count, confidence, accuracy, gap") {
    val m = rel.collect()
      .map(r => r.getInt(0) -> (r.getLong(1), r.getDouble(2), r.getDouble(3),
        r.getDouble(4))).toMap
    assert(m.keySet === Set(0, 2, 4))
    assert(m(0) === ((2L, 0.1, 0.0, 0.1)))
    assert(m(2) === ((2L, 0.5, 0.5, 0.0)))
    // bin 4 holds .9, .9 and the clamped 1.0
    val (n4, conf4, acc4, gap4) = m(4)
    assert(n4 === 3L)
    assert(math.abs(conf4 - 2.8 / 3) < 1e-12)
    assert(acc4 === 1.0)
    assert(math.abs(gap4 - (1.0 - 2.8 / 3)) < 1e-12)
  }

  test("ece is the count-weighted mean gap") {
    val e = cal.ece(rel).as[Double].head()
    val expected = (2 * 0.1 + 2 * 0.0 + 3 * (1.0 - 2.8 / 3)) / 7
    assert(math.abs(e - expected) < 1e-12)
  }

  test("a perfectly calibrated scorer has ece 0") {
    // every score equals its bin's empirical rate exactly
    val perfect = Seq(
      (0.5, 1.0), (0.5, 0.0),
      (0.25, 1.0), (0.25, 0.0), (0.25, 0.0), (0.25, 0.0))
      .toDF("score", "label")
    val e = cal.ece(cal.reliability(perfect, "score", "label")).as[Double].head()
    assert(e === 0.0)
  }

  test("out-of-contract scores clamp to edge bins; NULL scores are dropped") {
    val dirty = Seq(
      (Some(-0.01), 0.0),   // below domain -> bin 0, not bin -1
      (Some(1.37), 1.0),    // above domain -> last bin
      (None, 1.0),          // NULL score -> dropped, no NULL bin row
      (Some(0.1), 0.0))
      .toDF("score", "label")
    val m = cal.reliability(dirty, "score", "label").collect()
      .map(r => r.getInt(0) -> r.getLong(1)).toMap
    assert(m === Map(0 -> 2L, 4 -> 1L))
  }
}
