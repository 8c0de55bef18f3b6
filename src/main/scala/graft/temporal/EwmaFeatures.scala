package graft.temporal

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Per-key exponentially-weighted moving average — the RECURSIVE
  * time-series feature a window frame cannot express: ewma_t = α·x_t +
  * (1-α)·ewma_{t-1} depends on its own previous output, not on a bounded
  * frame of inputs ([[RollingFeatures]] covers the frame-expressible
  * trailing stats; this covers the infinite-memory smoother that anomaly
  * detection and trend monitors actually use).
  *
  * Beyond-reference operator (LLM-pipeline extension from the build brief).
  *
  * Each key's sequence is gathered once (collect_list + array_sort by
  * (order, tie) — the [[graft.streaming.Sessionize]] / TokenPacker
  * contract: one entity's history fits in a row) and the recurrence runs
  * as a row-local `aggregate` fold in sequence order. Engine parity is
  * exact: the fold multiplies and adds in the same order as the oracle's
  * recursive CTE, and the default α = 0.25 (and 1-α = 0.75) are exactly
  * representable doubles, so no literal-parsing drift exists.
  *
  * Scale shape: ONE hash-partitioned shuffle on the key, then row-local
  * work — no window, no self-join, no per-step pass. Hot keys cost their
  * own history length only.
  */
class EwmaFeatures(
    alpha: Double = 0.25,
    keyCol: String = "user_id",
    orderCol: String = "ts_us",
    valueCol: String = "value",
    tieCol: String = "event_id") {
  require(alpha > 0.0 && alpha <= 1.0, s"alpha ($alpha) must be in (0, 1]")

  /** (key, tie, value, ewma): one row per input event; ewma seeds at the
    * key's first value.
    */
  def transform(events: DataFrame): DataFrame = {
    val a = alpha
    val b = 1.0 - alpha
    events
      .groupBy(col(keyCol))
      .agg(expr(
        s"""array_sort(collect_list(named_struct(
           |  'o', $orderCol, 'tie', $tieCol, 'v', CAST($valueCol AS DOUBLE))))
           |""".stripMargin).as("seq"))
      // NULL values must not poison the smoother: a*NULL + b*prev is
      // NULL, and the naive fold carried that null as `prev` FOREVER —
      // one missing observation blanked every later ewma of the key.
      // The pandas `ewm` convention instead: a null observation emits
      // the running ewma unchanged (null only while no value has been
      // seen yet), so the emitted value and the carry are the SAME
      // expression in every case. Oracle (q127) replays the identical
      // CASE in its recursive CTE.
      .select(col(keyCol), explode(expr(
        s"""aggregate(
           |  slice(seq, 2, greatest(size(seq) - 1, 0)),
           |  named_struct(
           |    'lst', array(named_struct('tie', seq[0].tie, 'v', seq[0].v,
           |                              'ewma', seq[0].v)),
           |    'prev', seq[0].v),
           |  (acc, x) -> named_struct(
           |    'lst', concat(acc.lst, array(named_struct(
           |      'tie', x.tie, 'v', x.v,
           |      'ewma', CASE WHEN x.v IS NULL THEN acc.prev
           |                   WHEN acc.prev IS NULL THEN x.v
           |                   ELSE ${a}D * x.v + ${b}D * acc.prev END))),
           |    'prev', CASE WHEN x.v IS NULL THEN acc.prev
           |                 WHEN acc.prev IS NULL THEN x.v
           |                 ELSE ${a}D * x.v + ${b}D * acc.prev END),
           |  acc -> acc.lst)""".stripMargin)).as("r"))
      .select(col(keyCol), col("r.tie").as(tieCol), col("r.v").as(valueCol),
        col("r.ewma").as("ewma"))
  }
}
