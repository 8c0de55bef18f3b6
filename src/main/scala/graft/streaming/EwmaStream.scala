package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.Dataset
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Streaming per-key EWMA: the continuous-ingest counterpart of
  * [[graft.temporal.EwmaFeatures]] — one smoother state per key, advanced
  * event-by-event as micro-batches arrive, so a live anomaly/trend monitor
  * reads the same recurrence the batch backfill computes
  * (ewma_t = α·x_t + (1-α)·ewma_{t-1}; a null observation emits the
  * running value unchanged — the pandas `ewm` convention, identical CASE
  * to the batch operator and the q127 oracle).
  *
  * Beyond-reference operator (LLM-pipeline extension from the build brief).
  *
  * State per key is three numbers (last event time, last tie id, the
  * running ewma) — O(keys), not O(history) — and idle keys are EVICTED by
  * an event-time timeout `idleGapSeconds` past their last event (the
  * bounded-state leg an always-on stream needs; a key returning after
  * eviction re-seeds at its next value, the documented trade). Within a
  * micro-batch events fold in (event-time, tie) order.
  *
  * Ordering contract: the recurrence is order-SENSITIVE, and a stream can
  * deliver an event whose time precedes state already folded (late data
  * across micro-batches). Retro-folding would require the key's history —
  * exactly the unbounded state this operator refuses to hold — so a late
  * event is emitted FLAGGED (`late = true`, ewma null) and leaves the
  * smoother untouched: visible, never silently reordered, never silently
  * dropped. On a per-key-monotone stream the output matches
  * [[graft.temporal.EwmaFeatures]] bit-for-bit (EwmaStreamSpec pins batch
  * parity across micro-batch boundaries).
  */
object EwmaStream {

  case class EwmaEvent(user_id: Long, event_id: Long, ts: Timestamp,
      value: Option[Double])
  case class EwmaState(lastTs: Long, lastTie: Long, ewma: Option[Double])
  case class EwmaPoint(user_id: Long, event_id: Long, value: Option[Double],
      ewma: Option[Double], late: Boolean)

  /** The per-key state transition — exposed for direct
    * `flatMapGroupsWithState` wiring; [[smooth]] is the convenience form.
    */
  def ewmaFn(alpha: Double, idleGapSeconds: Long)(
      key: Long,
      events: Iterator[EwmaEvent],
      state: GroupState[EwmaState]): Iterator[EwmaPoint] = {
    // belt-and-braces for direct flatMapGroupsWithState wiring; smooth()
    // validates driver-side so a bad config fails at wiring time, not
    // inside the first micro-batch's tasks
    require(alpha > 0.0 && alpha <= 1.0, s"alpha ($alpha) must be in (0, 1]")
    require(idleGapSeconds > 0,
      s"idleGapSeconds ($idleGapSeconds) must be positive (a nonpositive " +
        "gap sets timeouts at or before the watermark and kills the query)")
    if (state.hasTimedOut) {
      // idle horizon passed: evict (the smoother emits per event, so
      // there is nothing pending to flush — unlike a session close)
      state.remove()
      return Iterator.empty
    }
    val sorted = events.toSeq.sortBy(e => (e.ts.getTime, e.event_id))
    var st = state.getOption
    val out = sorted.map { e =>
      val t = e.ts.getTime
      st match {
        case Some(s) if t < s.lastTs || (t == s.lastTs && e.event_id <= s.lastTie) =>
          // behind the folded frontier: flag, never silently reorder
          EwmaPoint(key, e.event_id, e.value, None, late = true)
        case prev =>
          val next = (e.value, prev.flatMap(_.ewma)) match {
            case (None, p) => p
            case (Some(v), None) => Some(v)
            case (Some(v), Some(p)) => Some(alpha * v + (1.0 - alpha) * p)
          }
          st = Some(EwmaState(t, e.event_id, next))
          EwmaPoint(key, e.event_id, e.value, next, late = false)
      }
    }
    // st is always defined here: a first-ever event cannot be late, and
    // an all-late batch implies prior state
    st.foreach { s =>
      state.update(s)
      state.setTimeoutTimestamp(s.lastTs + idleGapSeconds * 1000L)
    }
    out.iterator
  }

  /** Wires [[ewmaFn]] into a watermarked stream of [[EwmaEvent]]. Works
    * unchanged on a batch `Dataset[EwmaEvent]` (the watermark is a no-op
    * there and no state survives the single "batch").
    */
  def smooth(
      events: Dataset[EwmaEvent],
      alpha: Double = 0.25,
      watermark: String = "1 hour",
      idleGapSeconds: Long = 86400L): Dataset[EwmaPoint] = {
    // fail at WIRING time (driver), not inside the first micro-batch:
    // a streaming query that starts and then dies on its first trigger
    // is strictly worse than one that never starts
    require(alpha > 0.0 && alpha <= 1.0, s"alpha ($alpha) must be in (0, 1]")
    require(idleGapSeconds > 0,
      s"idleGapSeconds ($idleGapSeconds) must be positive")
    import events.sparkSession.implicits._
    events
      .withWatermark("ts", watermark)
      .groupByKey(_.user_id)
      .flatMapGroupsWithState(OutputMode.Append(), GroupStateTimeout.EventTimeTimeout)(
        ewmaFn(alpha, idleGapSeconds))
  }
}
