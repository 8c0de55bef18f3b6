package graft

/** Plan-quality regression guard over EVERY query in SparkEntry: no
  * cartesian products and no unpartitioned (single-task) window sorts may
  * ever appear in an executed plan — the two classic 100TB scale-killers.
  * (BroadcastNestedLoopJoin is allowed: it appears only for intentionally
  * broadcast one-row totals and broadcast probe sets.)
  */
class PlanAuditSpec extends SparkTestBase {

  private val dir = "/root/testdata/sf0.001"

  SparkEntry.queries.toSeq.sortBy(_._1).foreach { case (name, fn) =>
    test(s"$name: no cartesian product, no unpartitioned window") {
      val plan = fn(spark, dir).queryExecution.executedPlan.toString
      assert(!plan.contains("CartesianProduct"),
        s"cartesian product in $name:\n$plan")
      // physical Window prints [exprs], [partitionSpec], [orderSpec]; an
      // empty partition spec ("], [], [") means a single-task global sort
      val unpartitioned = plan.linesIterator
        .filter(_.trim.startsWith("Window "))
        .filter(_.contains("], [], ["))
      assert(unpartitioned.isEmpty,
        s"unpartitioned window in $name: ${unpartitioned.mkString("; ")}")
    }
  }

  test("flagship entry() returns rows") {
    assert(SparkEntry.entry(spark).count() > 0)
  }
}
