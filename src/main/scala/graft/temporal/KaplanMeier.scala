package graft.temporal

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Kaplan–Meier survival estimation under right-censoring — "what
  * fraction of users is still active after t days", computed correctly
  * when observation windows cut lifetimes short (the naive
  * `fraction with lifetime > t` is biased low because censored subjects
  * count as deaths). The product-limit estimator:
  *
  *   S(t) = Π_{tᵢ ≤ t} (1 − dᵢ / nᵢ)
  *
  * over distinct EVENT times tᵢ, with dᵢ events at tᵢ and nᵢ subjects
  * still at risk (duration ≥ tᵢ; censored subjects leave the risk set
  * without contributing an event).
  *
  * Scale shape: subjects reduce to one (duration, event) pair each, then
  * everything aggregates to ONE ROW PER DISTINCT EVENT TIME — for
  * day/hour-granularity durations a tiny frame. At-risk counts and the
  * running product come from a broadcast triangle join over that tiny
  * frame (the same offsets idiom as the metrics curves), NEVER a global
  * window — so the plan stays legal under [[graft.plans.PlanGuard]]. The
  * product is computed in log space (exp of the summed logs), the
  * standard numerically-stable form.
  */
class KaplanMeier(
    durationCol: String = "duration",
    eventCol: String = "event") {

  /** (t, n_risk, d, survival): one row per distinct event time, survival
    * being S(t) AFTER the events at t. Censored-only times carry no row
    * (the estimator only steps at events, per the definition).
    */
  def survival(subjects: DataFrame): DataFrame = {
    val s = subjects.select(col(durationCol).cast("long").as("__t"),
      col(eventCol).cast("boolean").as("__e"))
      .where(col("__t").isNotNull && col("__t") >= 0)
    // per distinct duration: events and total leavers (events + censored)
    val byT = s.groupBy(col("__t"))
      .agg(sum(when(col("__e"), 1L).otherwise(0L)).as("d"),
        count(lit(1)).as("leave"))
    val total = s.agg(count(lit(1)).as("n")) // broadcast scalar
    // at risk at t = total − everyone who left strictly before t
    val left = byT.select(col("__t").as("__s"), col("leave").as("__lv"))
    val risk = byT.join(broadcast(left), col("__s") < col("__t"), "left")
      .groupBy(col("__t"), col("d"))
      .agg(coalesce(sum(col("__lv")), lit(0L)).as("left_before"))
      .crossJoin(broadcast(total))
      .withColumn("n_risk", col("n") - col("left_before"))
      .where(col("d") > 0)
    // running product over event times ≤ t, log-space, triangle join.
    // A time where EVERYONE at risk dies contributes a zero factor —
    // log(0) is NULL in Spark SQL (it would silently vanish from the
    // sum), so zero terms are masked out of the sum and flagged: any
    // flagged term at-or-before t forces S(t) = 0 exactly.
    val terms = risk.select(col("__t").as("__s"),
      when(col("d") < col("n_risk"),
        log(lit(1.0) - col("d").cast("double") / col("n_risk").cast("double")))
        .otherwise(lit(0.0)).as("__lg"),
      (col("d") === col("n_risk")).cast("int").as("__z"))
    risk.join(broadcast(terms), col("__s") <= col("__t"))
      .groupBy(col("__t").as("t"), col("n_risk"), col("d"))
      .agg(when(max(col("__z")) === 1, lit(0.0))
        .otherwise(exp(sum(col("__lg")))).as("survival"))
  }
}
