package graft.sql

import org.apache.spark.sql.functions._

import graft.SparkTestBase

/** Pins the co-located-join layout story the 100 TB design leans on: fact
  * tables written `bucketBy(N, key)` + `sortBy(key)` join WITHOUT any
  * exchange — both sides' bucket layout satisfies the join's distribution
  * requirement, so the biggest shuffle in a fact-to-fact join disappears
  * at write time. (Broadcast is disabled in the test: on small inputs AQE
  * would broadcast and hide whether bucketing did the work.)
  */
class BucketedJoinSpec extends SparkTestBase {

  test("bucketed+sorted fact tables sort-merge join with zero Exchange") {
    val o = spark.read.parquet("/root/testdata/sf0.001/orders.parquet")
    val l = spark.read.parquet("/root/testdata/sf0.001/lineitem.parquet")
    val prior = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      o.write.mode("overwrite")
        .bucketBy(8, "o_orderkey").sortBy("o_orderkey").saveAsTable("orders_b")
      l.write.mode("overwrite")
        .bucketBy(8, "l_orderkey").sortBy("l_orderkey").saveAsTable("lineitem_b")

      val joined = spark.table("orders_b")
        .join(spark.table("lineitem_b"), col("o_orderkey") === col("l_orderkey"))
        .groupBy(col("o_orderpriority"))
        .agg(sum(col("l_quantity")).as("qty"))
      val plan = joined.queryExecution.executedPlan.toString

      // the join itself reads the bucket layout directly — no exchange
      // between the scans and the SortMergeJoin (the groupBy above the
      // join still exchanges on its own key, which is fine and expected)
      val joinSection = plan.linesIterator
        .dropWhile(l => !l.contains("SortMergeJoin")).mkString("\n")
      assert(plan.contains("SortMergeJoin"), s"expected SMJ:\n$plan")
      assert(!joinSection.contains("Exchange"),
        s"bucketed join still exchanges:\n$plan")
      assert(plan.contains("SelectedBucketsCount"),
        s"scans are not bucket-aware:\n$plan")

      // and the result matches the plain (shuffling) join
      val expect = o.join(l, col("o_orderkey") === col("l_orderkey"))
        .groupBy(col("o_orderpriority")).agg(sum(col("l_quantity")).as("qty"))
        .collect().map(r => r.getString(0) -> math.round(r.getDouble(1))).toMap
      val got = joined.collect().map(r => r.getString(0) -> math.round(r.getDouble(1))).toMap
      assert(got === expect)
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prior)
      spark.sql("DROP TABLE IF EXISTS orders_b")
      spark.sql("DROP TABLE IF EXISTS lineitem_b")
    }
  }
}
