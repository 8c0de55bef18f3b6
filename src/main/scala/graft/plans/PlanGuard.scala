package graft.plans

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.expressions.AttributeReference
import org.apache.spark.sql.catalyst.plans.logical.{LogicalPlan, Window}
import org.apache.spark.sql.catalyst.rules.Rule

/** Opt-in plan-time guard against the engine's documented scale-killers:
  *
  *  1. a window with an EMPTY partition spec, which Catalyst plans as a
  *     single-task global sort — correct on a laptop, a silent
  *     serialization point on 100 TB;
  *  2. a window partitioned ONLY by declared low-cardinality columns —
  *     one task per group sorts the dominant group's entire slice, the
  *     q56/q58/q96 class that shipped twice while tests were green and
  *     was each time caught only by an offline plan audit.
  *
  * Check (1) is structural and needs no configuration. Check (2) needs to
  * know which columns are low-cardinality — declared per session as a
  * comma-separated column-name list in `spark.graft.planGuard.lowCardCols`
  * (empty default = check off). A blocklist rather than a high-card
  * allowlist, deliberately: derived bucket columns (GroupedNtile /
  * PrefixSum `__bkt`, salt keys) are exactly the fix for this class and
  * must keep passing without being enumerated, and an allowlist would
  * fail every undeclared-but-fine key (user_id, doc_id, ...). A window
  * passes as soon as ANY partition expression is not a bare reference to
  * a declared low-card column — a real key alongside the group, or any
  * derived expression, defuses it.
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
      // case-insensitive, matching Spark's default column resolution: a
      // declared `o_orderpriority` must arm against `O_ORDERPRIORITY` —
      // a silently-disarmed guard is the failure mode this rule exists
      // to prevent. (An ALIAS of a low-card column still passes: a
      // name-based blocklist cannot see through projection renames —
      // PlanAuditSpec's offline audit covers the engine's own aliases.)
      val lowCard = session.conf.get(PlanGuard.LowCardKey, "")
        .split(",").map(_.trim.toLowerCase(java.util.Locale.ROOT))
        .filter(_.nonEmpty).toSet
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
        case w: Window if lowCard.nonEmpty && w.partitionSpec.forall {
              case a: AttributeReference =>
                lowCard.contains(a.name.toLowerCase(java.util.Locale.ROOT))
              case _ => false
            } =>
          throw new IllegalStateException(
            "graft plan guard: window partitioned only by declared " +
              "low-cardinality columns (" +
              w.partitionSpec.collect { case a: AttributeReference => a.name }
                .mkString(", ") +
              ") sorts each group in ONE task at scale. Add a real key or " +
              "a derived bucket to the partition spec (GroupedNtile / " +
              s"PrefixSum.exclusiveBy), amend ${PlanGuard.LowCardKey}, or " +
              s"SET ${PlanGuard.Key}=false for deliberate small-data use.")
        case _ =>
      }
    }
    plan
  }
}

object PlanGuard {
  val Key = "spark.graft.planGuard"
  val LowCardKey = "spark.graft.planGuard.lowCardCols"
}
