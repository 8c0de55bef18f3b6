package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Event sessionization — gap-based sessions in both execution models:
  *
  *  - '''batch''': lag-gap flags + running sum over a window PARTITIONED BY
  *    user (parallel across users; the only shuffle is the hash partition
  *    on user — the natural key at any scale).
  *  - '''streaming''': `flatMapGroupsWithState` with event-time timeout —
  *    the Structured Streaming custom-state path; sessions close when the
  *    watermark passes their gap horizon, giving exactly-once session
  *    emission on out-of-order input.
  *
  * The same tumbling-window aggregation helper serves `readStream` and
  * batch frames unchanged (Structured Streaming's unified Dataset model).
  */
object Sessionize {

  /** Batch sessionization: appends `session_idx` (1-based per user).
    * A new session starts when the gap to the previous event exceeds `gap`
    * ticks, where `toTicks` maps the time column to a numeric axis
    * (default: unix seconds from a timestamp column; pass `identity` when
    * the column is already epoch nanos/micros and give `gap` in the same
    * unit). Deterministic tie-break by `orderCol`.
    */
  def batch(
      events: DataFrame,
      userCol: String = "user_id",
      tsCol: String = "ts",
      orderCol: String = "event_id",
      gap: Long = 14400L,
      toTicks: org.apache.spark.sql.Column => org.apache.spark.sql.Column = unix_timestamp)
      : DataFrame = {
    val w = Window.partitionBy(col(userCol)).orderBy(col(tsCol), col(orderCol))
    val t = toTicks(col(tsCol))
    val prev = lag(t, 1).over(w)
    val isNew = when(prev.isNull || t - prev > gap, 1L).otherwise(0L)
    events
      .withColumn("session_idx",
        sum(isNew).over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
  }

  /** Tumbling-window event counts: identical code path for batch frames and
    * `readStream` sources (watermark is a no-op in batch).
    */
  def windowedEventCounts(
      events: DataFrame,
      windowLength: String = "1 hour",
      watermark: String = "2 hours",
      tsCol: String = "ts",
      typeCol: String = "event_type"): DataFrame =
    events
      .withWatermark(tsCol, watermark)
      .groupBy(window(col(tsCol), windowLength), col(typeCol))
      .agg(count(lit(1)).as("n_events"), sum(col("value")).as("total_value"))
      .select(col("window.start").as("window_start"), col(typeCol),
        col("n_events"), col("total_value"))

  case class Event(user_id: Long, ts: Timestamp, value: Double)
  case class SessionState(start: Long, last: Long, n: Long, total: Double)
  case class ClosedSession(
      user_id: Long, session_start: Timestamp, session_end: Timestamp,
      n_events: Long, total_value: Double)

  /** Streaming sessionization: one state object per user, sessions emitted
    * when the event-time watermark passes `last event + gap`. Use on a
    * watermarked stream grouped by user:
    * {{{
    * events.withWatermark("ts", "1 hour").as[Event]
    *   .groupByKey(_.user_id)
    *   .flatMapGroupsWithState(Append, EventTimeTimeout)(sessionFn(gapSeconds))
    * }}}
    */
  def sessionFn(gapSeconds: Long)(
      user: Long,
      events: Iterator[Event],
      state: GroupState[SessionState]): Iterator[ClosedSession] = {
    val gapMs = gapSeconds * 1000
    val sorted = events.toSeq.sortBy(_.ts.getTime)
    var closed = List.empty[ClosedSession]
    var cur = state.getOption

    sorted.foreach { e =>
      val t = e.ts.getTime
      cur match {
        case Some(s) if t - s.last <= gapMs =>
          cur = Some(SessionState(s.start, math.max(s.last, t), s.n + 1, s.total + e.value))
        case Some(s) =>
          closed ::= ClosedSession(user, new Timestamp(s.start), new Timestamp(s.last), s.n, s.total)
          cur = Some(SessionState(t, t, 1, e.value))
        case None =>
          cur = Some(SessionState(t, t, 1, e.value))
      }
    }

    if (state.hasTimedOut) {
      // watermark passed the session horizon: emit and clear
      cur.foreach(s => closed ::=
        ClosedSession(user, new Timestamp(s.start), new Timestamp(s.last), s.n, s.total))
      state.remove()
    } else {
      cur.foreach { s =>
        state.update(s)
        state.setTimeoutTimestamp(s.last + gapMs)
      }
    }
    closed.reverseIterator
  }

  /** Convenience: wires sessionFn into a watermarked stream of [[Event]]. */
  def streamingSessions(
      events: Dataset[Event],
      gapSeconds: Long = 14400L,
      watermark: String = "1 hour"): Dataset[ClosedSession] = {
    import events.sparkSession.implicits._
    events
      .withWatermark("ts", watermark)
      .groupByKey(_.user_id)
      .flatMapGroupsWithState(OutputMode.Append(), GroupStateTimeout.EventTimeTimeout)(
        sessionFn(gapSeconds))
  }

  /** Closed-session aggregates via Spark's built-in `session_window` —
    * the codegen-friendly declarative alternative to the typed-state path
    * above: one native SessionWindow aggregation (merging session state
    * inside the aggregation operator, no user-code state object), same
    * semantics on batch frames and watermarked streams. Output matches
    * [[streamingSessions]] row-for-row (SessionParitySpec pins it):
    * `session_end` is the LAST EVENT time — Spark's `session_window.end`
    * is `last + gap`, so the gap is subtracted back.
    *
    * The typed [[sessionFn]] stays the reference for session logic that
    * aggregation can't express (per-event session indices mid-stream,
    * custom eviction); for plain closed-session stats prefer this: it
    * whole-stage-codegens and needs no Encoder round-trip per event.
    */
  def sessionAgg(
      events: DataFrame,
      gapSeconds: Long = 14400L,
      userCol: String = "user_id",
      tsCol: String = "ts",
      valueCol: String = "value"): DataFrame =
    events
      .groupBy(col(userCol),
        session_window(col(tsCol), s"$gapSeconds seconds").as("sw"))
      .agg(count(lit(1)).as("n_events"), sum(col(valueCol)).as("total_value"))
      .select(col(userCol),
        col("sw.start").as("session_start"),
        (col("sw.end") - expr(s"INTERVAL $gapSeconds SECOND"))
          .as("session_end"),
        col("n_events"), col("total_value"))
}
