package graft.sql

import org.apache.spark.sql.functions._

import graft.SparkTestBase
import graft.sql.functions.{kMinValues, kmvEstimate}

class KMinValuesSpec extends SparkTestBase {
  import spark.implicits._

  test("exact path: fewer than k distinct values yields the exact count") {
    val df = (1 to 100).map(i => ("g", s"v${i % 30}")).toDF("g", "v")
    val est = df.groupBy($"g").agg(kMinValues($"v", 64).as("kmv"))
      .select(kmvEstimate($"kmv", 64)).as[Double].head()
    assert(est === 30.0)
  }

  test("estimate path: within 3 sigma of the true cardinality") {
    val n = 5000
    val df = (1 to n).map(i => ("g", s"value$i")).toDF("g", "v")
    val est = df.groupBy($"g").agg(kMinValues($"v", 256).as("kmv"))
      .select(kmvEstimate($"kmv", 256)).as[Double].head()
    // KMV stderr ~ 1/sqrt(k-2) ~ 6.3% at k=256; allow 3 sigma
    assert(math.abs(est - n) / n < 0.19, s"estimate $est for true $n")
  }

  test("partition-count invariant (merge correctness)") {
    val df = (1 to 2000).map(i => ("g", s"tok${i % 700}")).toDF("g", "v")
    def run(parts: Int): Seq[Long] =
      df.repartition(parts).groupBy($"g").agg(kMinValues($"v", 64).as("kmv"))
        .select($"kmv").as[Seq[Long]].head()
    val one = run(1)
    assert(run(7) === one && run(32) === one)
    assert(one.length === 64 && one === one.sorted)
  }

  test("plan uses partial aggregation (ObjectHashAggregate, two phases)") {
    val df = (1 to 100).map(i => ("g" + i % 3, s"v$i")).toDF("g", "v")
    val plan = df.groupBy($"g").agg(kMinValues($"v", 16).as("kmv"))
      .queryExecution.executedPlan.toString
    assert(plan.contains("ObjectHashAggregate"), s"plan:\n$plan")
    assert(plan.contains("partial_kmin_values") || plan.contains("merge_kmin_values")
      || plan.toLowerCase.contains("partial"), s"no partial phase in:\n$plan")
  }

  test("hash matches the SQL oracle layout") {
    // ('0x' || substr(md5('abc'), 1, 14))::BIGINT
    // md5('abc') = 900150983cd24fb0... -> 0x900150983cd24f
    assert(graft.sql.expressions.KMinValues.hash56("abc") === 0x900150983cd24fL)
  }
}
