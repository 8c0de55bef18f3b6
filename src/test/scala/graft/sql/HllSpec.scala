package graft.sql

import org.apache.spark.sql.functions._

import graft.SparkTestBase
import graft.sql.functions.{hllEstimate, hllSketch}

/** HyperLogLog sketch: register layout, merge (partition invariance),
  * and estimate accuracy vs the theoretical 1.04/sqrt(m) error bound.
  */
class HllSpec extends SparkTestBase {
  import spark.implicits._

  test("hll: registers are partition-count invariant (merge = max)") {
    val df = (1 to 20000).map(i => s"v${i % 3000}").toDF("v")
    def run(parts: Int): Seq[Int] =
      df.repartition(parts).agg(hllSketch($"v", 10).as("regs"))
        .select($"regs").as[Seq[Int]].head()
    val one = run(1)
    assert(one.length === 1024)
    assert(run(7) === one && run(32) === one)
  }

  test("hll: estimate within 5% at n/m ~ 10 (theory: 1.04/sqrt(1024) = 3.25%)") {
    val n = 10000
    val df = (1 to n).map(i => s"item-$i").toDF("v")
    val est = df.agg(hllSketch($"v", 10).as("regs"))
      .select(hllEstimate($"regs", 10)).as[Double].head()
    assert(math.abs(est - n) / n < 0.05, s"estimate $est vs $n")
  }

  test("hll: small cardinalities take the linear-counting branch and stay tight") {
    val n = 200 // << 2.5m, so E = m * ln(m / V)
    val df = (1 to n).map(i => s"s$i").toDF("v")
    val est = df.agg(hllSketch($"v", 10).as("regs"))
      .select(hllEstimate($"regs", 10)).as[Double].head()
    assert(math.abs(est - n) / n < 0.05, s"estimate $est vs $n")
  }

  test("hll: duplicates don't move the sketch") {
    val once = (1 to 500).map(i => s"d$i").toDF("v")
      .agg(hllSketch($"v", 8)).as[Seq[Int]].head()
    val dup = (1 to 500).flatMap(i => Seq.fill(13)(s"d$i")).toDF("v")
      .agg(hllSketch($"v", 8)).as[Seq[Int]].head()
    assert(once === dup)
  }

  test("hll: nulls are ignored, empty input estimates 0") {
    val est = Seq[Option[String]](None, None).toDF("v")
      .agg(hllSketch($"v", 8).as("regs"))
      .select(hllEstimate($"regs", 8)).as[Double].head()
    // all registers zero -> V = m -> linear counting gives m * ln(1) = 0
    assert(est === 0.0)
  }

  test("hllMerge: merged sub-sketches equal the direct union sketch bit-for-bit") {
    // overlapping groups (shared items across g0/g1/g2) — merge must
    // reproduce the union's registers exactly despite the overlap
    val df = (1 to 9000).map(i => (s"g${i % 3}", s"v${i % 2500}")).toDF("g", "v")
    val direct = df.agg(hllSketch($"v", 10).as("regs"))
      .select($"regs").as[Seq[Int]].head()
    val merged = df.groupBy($"g").agg(hllSketch($"v", 10).as("regs"))
      .agg(graft.sql.functions.hllMerge($"regs", 10).as("regs"))
      .select($"regs").as[Seq[Int]].head()
    assert(merged === direct)
  }

  test("hllMerge: merge is grouping-order invariant") {
    val df = (1 to 6000).map(i => (s"g${i % 5}", s"v$i")).toDF("g", "v")
    val sk = df.groupBy($"g").agg(hllSketch($"v", 8).as("regs"))
    def merge(d: org.apache.spark.sql.DataFrame): Seq[Int] =
      d.agg(graft.sql.functions.hllMerge($"regs", 8).as("regs"))
        .select($"regs").as[Seq[Int]].head()
    assert(merge(sk.orderBy($"g")) === merge(sk.orderBy($"g".desc)))
    assert(merge(sk.repartition(13)) === merge(sk.coalesce(1)))
  }
}
