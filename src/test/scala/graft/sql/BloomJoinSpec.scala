package graft.sql

import org.apache.spark.sql.functions._

import graft.SparkTestBase

/** Bloom-pruned joins are result-identical to their exact counterparts. */
class BloomJoinSpec extends SparkTestBase {
  import spark.implicits._

  private lazy val probe = (0L until 1000L).map(i => (i, s"p$i")).toDF("k", "payload")
  private lazy val build = (0L until 1000L by 7).map(Tuple1(_)).toDF("bk")

  test("mismatched and floating key types are rejected loudly (coin-coercion hazard)") {
    // the join would coerce INT = DECIMAL (and -0.0 = 0.0) equal, but the
    // string-hashed Bloom coin would not — a divergent coin silently
    // prunes TRUE matches, breaking the never-changes-semantics contract
    val dProbe = Seq((0.0, "x"), (-0.0, "y")).toDF("k", "payload")
    val dBuild = Seq(Tuple1(0.0)).toDF("bk")
    intercept[IllegalArgumentException] {
      BloomJoin.semiJoin(dProbe, $"k", dBuild, $"bk")
    }
    val decBuild = build.select($"bk".cast("decimal(10,2)").as("bk"))
    intercept[IllegalArgumentException] {
      BloomJoin.antiJoin(probe, $"k", decBuild, $"bk")
    }
  }

  test("antiJoin equals the exact left_anti result") {
    val got = BloomJoin.antiJoin(probe, col("k"), build, col("bk"), numBits = 1 << 14)
      .select("k").as[Long].collect().toSet
    val exact = probe.join(build, col("k") === col("bk"), "left_anti")
      .select("k").as[Long].collect().toSet
    assert(got === exact)
    assert(got.size === 1000 - 143) // 143 multiples of 7 under 1000
  }

  test("antiJoin keeps null-key probe rows (left_anti semantics)") {
    val p = Seq[(java.lang.Long, String)]((1L, "a"), (null, "b"), (7L, "c"))
      .toDF("k", "payload")
    val got = BloomJoin.antiJoin(p, col("k"), build, col("bk"))
      .select("payload").as[String].collect().toSet
    val exact = p.join(build, col("k") === col("bk"), "left_anti")
      .select("payload").as[String].collect().toSet
    assert(got === exact)
    assert(got.contains("b")) // the null-key row survives
  }

  test("antiJoin on an empty build side keeps everything") {
    val got = BloomJoin.antiJoin(probe, col("k"),
      Seq.empty[Long].toDF("bk").where(lit(false)), col("bk"))
    assert(got.count() === 1000L)
  }

  test("semiJoin equals the exact left_semi result") {
    val got = BloomJoin.semiJoin(probe, col("k"), build, col("bk"), numBits = 1 << 14)
      .select("k").as[Long].collect().toSet
    val exact = probe.join(build, col("k") === col("bk"), "left_semi")
      .select("k").as[Long].collect().toSet
    assert(got === exact)
  }
}
