package graft.feature

import org.apache.spark.sql.functions._

import graft.SparkTestBase

class DriftMonitorSpec extends SparkTestBase {
  import spark.implicits._

  lazy val before = (1 to 100).map(i => (i.toLong, if (i <= 80) "en" else "de", i.toDouble))
    .toDF("id", "lang", "x")

  test("identical snapshots give PSI ~ 0") {
    val psi = new DriftMonitor().categorical(before, before, "lang")
      .agg(sum($"psi_term")).as[Double].head()
    assert(math.abs(psi) < 1e-12)
  }

  test("categorical: NULL categories match null-safely — identical snapshots stay ~0") {
    // a USING join would split the NULL category into a vanished row plus
    // an appeared row, reading identical distributions as broken drift
    val withNull = (1 to 100)
      .map(i => (i.toLong, if (i <= 30) None else Some(if (i <= 80) "en" else "de")))
      .toDF("id", "lang")
    val terms = new DriftMonitor().categorical(withNull, withNull, "lang")
    assert(terms.count() === 3) // en, de, NULL — one matched row each
    val psi = terms.agg(sum($"psi_term")).as[Double].head()
    assert(math.abs(psi) < 1e-12, s"identical snapshots with NULLs read PSI $psi")
  }

  test("numeric: NULL values are excluded, not bucketed as max-range drift") {
    val b = (1 to 100).map(i => (i.toLong, Some(i.toDouble))).toDF("id", "x")
    // same value distribution, but 30% of rows are NULL
    val a = (1 to 100).map(i => (i.toLong, if (i % 3 == 0) None else Some(i.toDouble)))
      .toDF("id", "x")
    val psi = new DriftMonitor().numeric(b, a, "x")
      .agg(sum($"psi_term")).as[Double].head()
    assert(psi < 0.05, s"a NULL-rate change must not read as top-bucket drift (PSI $psi)")
    // all-null BEFORE: no reference frame -> zero term rows, not a crash
    val empty = Seq((1L, Option.empty[Double])).toDF("id", "x")
    assert(new DriftMonitor().numeric(empty, a, "x").count() === 0)
  }

  test("categorical: a shifted mix yields positive PSI, one term per category") {
    val after = (1 to 100).map(i => (i.toLong, if (i <= 50) "en" else "de", i.toDouble))
      .toDF("id", "lang", "x")
    val terms = new DriftMonitor().categorical(before, after, "lang")
      .as[(String, Long, Long, Double)].collect()
    assert(terms.length === 2)
    assert(terms.forall(_._4 > 0)) // both categories moved
    val psi = terms.map(_._4).sum
    assert(psi > 0.25, s"expected strong drift, got $psi") // 80/20 -> 50/50
  }

  test("categorical: a category present on one side only is still finite (smoothing)") {
    val after = Seq((1L, "fr", 1.0)).toDF("id", "lang", "x")
    val terms = new DriftMonitor().categorical(before, after, "lang")
      .as[(String, Long, Long, Double)].collect()
    assert(terms.length === 3)
    assert(terms.forall(t => !t._4.isNaN && !t._4.isInfinite))
  }

  test("numeric: bounds come from BEFORE; shifted values clamp into edge buckets") {
    val after = before.withColumn("x", $"x" + 1000.0) // everything beyond max
    val terms = new DriftMonitor(numBuckets = 5).numeric(before, after, "x")
      .as[(Long, Long, Long, Double)].collect().sortBy(_._1)
    // all after-rows land in the top bucket
    assert(terms.find(_._1 == 4L).get._3 === 100L)
    assert(terms.map(_._3).sum === 100L)
    val psi = terms.map(_._4).sum
    assert(psi > 0.25)
  }

  test("categoricalBy: drift isolated to one group, stable groups stay ~0") {
    // group = lang; shift the source mix for 'de' only
    val b = (1 to 40).map(i => (i.toLong, "en", s"src${i % 2}")) ++
      (41 to 80).map(i => (i.toLong, "de", s"src${i % 2}"))
    val a = (1 to 40).map(i => (i.toLong, "en", s"src${i % 2}")) ++
      (41 to 80).map(i => (i.toLong, "de", "src0")) // de collapses to one source
    val terms = new DriftMonitor()
      .categoricalBy(b.toDF("id", "lang", "source"), a.toDF("id", "lang", "source"),
        "lang", "source")
      .groupBy($"lang").agg(sum($"psi_term").as("psi"))
      .as[(String, Double)].collect().toMap
    assert(math.abs(terms("en")) < 1e-12)
    assert(terms("de") > 0.25)
  }

  test("numeric: constant column degenerates to one bucket, PSI 0 vs itself") {
    val const = Seq((1L, 5.0), (2L, 5.0)).toDF("id", "x")
    val terms = new DriftMonitor().numeric(const, const, "x").collect()
    assert(terms.length === 1)
    assert(math.abs(terms.head.getDouble(3)) < 1e-12)
  }
}
