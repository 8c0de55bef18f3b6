package graft.plans

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.plans.logical.{LogicalPlan, Window}
import org.apache.spark.sql.catalyst.rules.Rule

/** Opt-in plan-time guard against the engine's documented scale-killer:
  * a window with an EMPTY partition spec, which Catalyst plans as a
  * single-task global sort — correct on a laptop, a silent serialization
  * point on 100 TB. Twice in this engine's history (q96 round 5, q56/q58
  * round 6) that class shipped while tests were green, caught only by a
  * later plan audit; this rule moves the audit INTO the optimizer, where
  * a production pipeline fails at planning time instead of stalling a
  * cluster at 3am.
  *
  * This is the engine's demonstration of the `injectOptimizerRule`
  * extension tier (the build plan's option (c) for whole-plan concerns
  * that no Expression can see): the rule rewrites nothing — it is a
  * structural assertion pass over every optimized plan.
  *
  * Enablement: `SET spark.graft.planGuard = true` (default off, and the
  * test-suite's own PlanAuditSpec stays the offline equivalent). Scoped
  * per session via runtime conf, so an interactive session can turn it
  * off for a deliberate small-data global rank while pipelines keep it
  * on.
  */
case class PlanGuard(session: SparkSession) extends Rule[LogicalPlan] {

  override def apply(plan: LogicalPlan): LogicalPlan = {
    if (session.conf.get(PlanGuard.Key, "false").toBoolean) {
      plan.foreach {
        case w: Window if w.partitionSpec.isEmpty =>
          throw new IllegalStateException(
            "graft plan guard: window with an empty PARTITION BY plans as a " +
              "single-task global sort (functions: " +
              w.windowExpressions.map(_.name).mkString(", ") + "). " +
              "Partition by a real key or a derived bucket (see " +
              "graft.sql.GroupedNtile / PrefixSum for the two-phase " +
              s"pattern), or SET ${PlanGuard.Key}=false for deliberate " +
              "small-data use.")
        case _ =>
      }
    }
    plan
  }
}

object PlanGuard {
  val Key = "spark.graft.planGuard"
}
