package graft.temporal

import graft.SparkTestBase

class AnomalyDetectorSpec extends SparkTestBase {
  import spark.implicits._

  private case class Out(mean: Option[Double], variance: Option[Double],
      z: Option[Double], flag: Int)

  private def run(rows: Seq[(Long, Long, Long, Option[Double])],
      minPrior: Int = 2, threshold: Double = 3.0): Map[Long, Out] =
    new AnomalyDetector(alpha = 0.25, threshold = threshold, minPrior = minPrior)
      .transform(rows.toDF("user_id", "event_id", "ts_us", "value"))
      .select("event_id", "mean", "variance", "z", "is_anomaly")
      .as[(Long, Option[Double], Option[Double], Option[Double], Int)]
      .collect()
      .map { case (e, m, v, z, f) => e -> Out(m, v, z, f) }.toMap

  /** The sequential reference: West's recurrence folded in plain Scala —
    * the ground truth the two-smoother identity must reproduce exactly.
    */
  private def reference(xs: Seq[Double], alpha: Double = 0.25)
      : Seq[(Double, Double, Option[Double])] = {
    var m = Option.empty[Double]
    var q = Option.empty[Double]
    var n = 0
    xs.map { x =>
      val mp = m
      val vp = for (qq <- q; mm <- m) yield math.max(qq - mm * mm, 0.0)
      val z = (mp, vp) match {
        case (Some(mv), Some(vv)) if n >= 2 && vv > 0.0 =>
          Some((x - mv) / math.sqrt(vv))
        case _ => None
      }
      m = Some(m.fold(x)(p => alpha * x + (1 - alpha) * p))
      q = Some(q.fold(x * x)(p => alpha * x * x + (1 - alpha) * p))
      n += 1
      (m.get, math.max(q.get - m.get * m.get, 0.0), z)
    }
  }

  test("a level shift after a dispersed warmup flags; ordinary wiggle does not") {
    val xs = Seq(10.0, 12.0, 10.0, 12.0, 100.0)
    val got = run(xs.zipWithIndex.map { case (x, i) =>
      (1L, i.toLong, i * 100L, Some(x)) })
    val ref = reference(xs)
    xs.indices.foreach { i =>
      val o = got(i.toLong)
      assert(o.mean.get === ref(i)._1, s"mean at $i")
      assert(o.variance.get === ref(i)._2, s"variance at $i")
      assert(o.z === ref(i)._3, s"z at $i")
    }
    assert(got(4L).flag === 1) // the 100.0 jump: |z| ~ 91
    assert(Seq(0L, 1L, 2L, 3L).forall(got(_).flag === 0))
    assert(got(1L).z.isEmpty) // only 1 prior observation < minPrior
  }

  test("constant history never flags (prior variance 0 -> z undefined)") {
    val got = run((0 until 5).map(i =>
      (1L, i.toLong, i * 100L, Some(if (i == 4) 100.0 else 10.0))))
    assert(got(4L).z.isEmpty)
    assert(got(4L).flag === 0)
    assert(got(3L).variance.get === 0.0)
  }

  test("null observations pass through unscored and do not poison the smoothers") {
    val got = run(Seq(
      (1L, 0L, 100L, Some(10.0)),
      (1L, 1L, 200L, Some(14.0)),
      (1L, 2L, 300L, None), // gap: carries state, not scored
      (1L, 3L, 400L, Some(12.0)),
      (1L, 4L, 500L, Some(60.0))))
    assert(got(2L).z.isEmpty && got(2L).flag === 0)
    assert(got(2L).mean === got(1L).mean) // passthrough
    // the null row does NOT count toward minPrior, but the smoother
    // resumed: event 4 has 3 non-null priors and a live variance
    assert(got(4L).z.nonEmpty)
    assert(got(4L).flag === 1)
  }

  test("warmup: no z before minPrior non-null observations") {
    val got = run((0 until 4).map(i =>
      (1L, i.toLong, i * 100L, Some(i * 3.0))), minPrior = 3)
    assert(got(0L).z.isEmpty && got(1L).z.isEmpty && got(2L).z.isEmpty)
    assert(got(3L).z.nonEmpty)
  }

  test("keys are independent; a single-event key is unscored") {
    val got = run(Seq(
      (1L, 0L, 100L, Some(5.0)), (1L, 1L, 200L, Some(6.0)),
      (1L, 2L, 300L, Some(5.0)), (1L, 3L, 400L, Some(50.0)),
      (2L, 9L, 100L, Some(999.0))))
    assert(got(3L).flag === 1)
    assert(got(9L).z.isEmpty && got(9L).flag === 0)
    assert(got(9L).mean.get === 999.0)
  }

  test("z scores against the PRE-fold state: the outlier cannot dampen itself") {
    val xs = Seq(10.0, 12.0, 11.0, 1000.0)
    val got = run(xs.zipWithIndex.map { case (x, i) =>
      (1L, i.toLong, i * 100L, Some(x)) })
    val ref = reference(xs)
    // post-fold variance at t3 is huge; the pre-fold z must still be the
    // giant value from the calm prior state
    assert(got(3L).z.get === ref(3)._3.get)
    assert(math.abs(got(3L).z.get) > 100.0)
  }

  test("tie order: same ts folds by event_id, arrival order irrelevant") {
    val base = Seq(
      (1L, 1L, 100L, Some(8.0)), (1L, 0L, 100L, Some(4.0)),
      (1L, 2L, 200L, Some(6.0)), (1L, 3L, 300L, Some(40.0)))
    assert(run(base) === run(base.reverse))
    // fold order is event_id 0 then 1: mean after t1 = .25*8+.75*4 = 5
    assert(run(base)(1L).mean.get === 5.0)
  }
}
