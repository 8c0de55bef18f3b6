package graft.temporal

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** EXACT trailing-window count-distinct per day — "7-day active users as
  * of each day", the canonical rolling-reach metric, answered exactly
  * (the sketch companion is q137's sliding HLL merge). COUNT(DISTINCT)
  * is not decomposable over a sliding frame (a window function cannot
  * subtract yesterday's leavers), so the naive forms are either a
  * per-day self-join over the full event range or a giant window sort;
  * the scalable exact form is CONTRIBUTION FAN-OUT: reduce to distinct
  * (unit, day) pairs first, then each pair contributes to exactly
  * `windowDays` window-end days — a bounded explode — and a second
  * distinct-then-count collapses units active on several days of the
  * same window.
  *
  * Beyond-reference operator (LLM-pipeline extension from the build brief).
  *
  * == Scale shape ==
  *
  * Pass 1: distinct on (unit, day) — keyed shuffle, output bounded by
  * units × active-days, typically orders of magnitude under the event
  * count. Pass 2: explode ×windowDays (a CONSTANT fan-out, not data
  * skew), distinct on (window-day, unit), then a map-side-combinable
  * count per day. Nothing holds per-window state; nothing sorts
  * globally. At 100 TB the ×7 sits on the already-deduplicated pair
  * frame, so total shuffle bytes stay ~7× the DISTINCT pairs, not 7×
  * the events.
  *
  * == Deterministic contract ==
  *
  * Integer-only (the caller supplies an integral day column, e.g. epoch
  * micros div 86400000000 — the repo-wide day grid). Output rows are
  * restricted to days that actually APPEAR in the input (a trailing
  * window ending on a silent day is not reported; the window still
  * counts units from its silent middle days correctly because
  * contribution comes from the pair frame, not from output-day
  * existence).
  */
object SlidingDistinct {

  /** (day, n_active): exact count of distinct `unit` values seen in the
    * `windowDays`-day trailing window ending at each observed day.
    */
  def perDay(
      df: DataFrame,
      day: Column,
      unit: Column,
      windowDays: Int): DataFrame = {
    require(windowDays >= 1, s"windowDays ($windowDays) must be >= 1")
    val pairs = df
      .select(day.cast("long").as("day"), unit.as("unit"))
      .where(col("day").isNotNull && col("unit").isNotNull)
      .distinct()
    val observed = pairs.select(col("day")).distinct()
    pairs
      .select(explode(expr(s"sequence(day, day + ${windowDays - 1})")).as("day"),
        col("unit"))
      .distinct()
      .join(observed, "day") // only report days that exist in the input
      .groupBy(col("day"))
      .agg(count(lit(1)).as("n_active"))
  }
}
