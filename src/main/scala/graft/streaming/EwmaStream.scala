package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.Dataset
import org.apache.spark.sql.functions.{coalesce, col, expr, lag, lit, struct}
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

  /** The one EWMA step every path folds with — null passthrough, seed at
    * the first value, blend otherwise. Shared (not copy-pasted) because
    * the bit-exact parity between the base stream, the ordered stream,
    * the batch degenerate path, and [[AnomalyStream]]'s (m, q) pair is a
    * load-bearing oracle contract: a tweak applied to one copy but not
    * the others would silently break it.
    */
  private[streaming] def step(alpha: Double, v: Option[Double],
      prev: Option[Double]): Option[Double] = (v, prev) match {
    case (None, p) => p
    case (Some(x), None) => Some(x)
    case (Some(x), Some(p)) => Some(alpha * x + (1.0 - alpha) * p)
  }

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
          val next = step(alpha, e.value, prev.flatMap(_.ewma))
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

  // ---------------------------------------------------------------------
  // Ordered mode: bounded-allowed-lateness buffered fold (r13 verdict ask)
  // ---------------------------------------------------------------------

  /** One unfolded observation held in keyed state (compact: epoch-ms +
    * tie id + value, not the full event row).
    */
  case class PendingObs(ts: Long, tie: Long, value: Option[Double])

  /** Ordered-mode state: the folded frontier (as in [[EwmaState]]) plus
    * the bounded buffer of events newer than the fold horizon. Size is
    * O(events inside the allowed-lateness window) per key — lateness-rate
    * bounded, never O(history).
    */
  case class OrderedEwmaState(lastTs: Long, lastTie: Long,
      ewma: Option[Double], pending: Seq[PendingObs])

  /** The ordered-buffer plan for one invocation: which arrivals flag as
    * late/duplicate, which buffered+fresh observations fold NOW (in exact
    * (event-time, tie) order), and which stay held. Shared by the ordered
    * smoother and [[AnomalyStream]]'s ordered monitor — the buffer
    * semantics (frontier check, redelivery dedup, horizon split) are a
    * load-bearing contract, so they live in exactly one place (the same
    * rule as [[step]]).
    */
  private[streaming] case class OrderedPlan(
      late: Seq[EwmaEvent], foldable: Seq[PendingObs], hold: Seq[PendingObs])

  private[streaming] def planOrdered(
      fresh: Seq[EwmaEvent],
      lastTs: Long, lastTie: Long, pending: Seq[PendingObs],
      wm: Long, slackMs: Long): OrderedPlan = {
    // fold everything strictly below the horizon. Before the first
    // watermark update Spark reports wm = 0 ("no information"), and with
    // slack > 0 a naive `0 + slack` horizon would fold epoch-adjacent
    // events (ts < slackMs) in the very first batch — then a legitimate
    // within-lateness straggler behind that premature frontier would be
    // FLAGGED. No watermark yet means nothing is safe to fold.
    val horizon = if (wm <= 0L) Long.MinValue else wm + slackMs
    // an arrival behind the FOLDED frontier exceeded the allowed
    // lateness (its exact fold position is gone): flag, never silently
    // fold out of order, never silently drop. Spark itself drops rows
    // behind the WATERMARK before this function runs — the standard
    // watermarked-operator contract — which is why lateness is allowed
    // to be tighter than the watermark but never looser.
    val (lateArrivals, ok) = fresh.partition { e =>
      val t = e.ts.getTime
      t < lastTs || (t == lastTs && e.event_id <= lastTie)
    }
    // an at-least-once redelivery of an event still in the BUFFER would
    // otherwise fold twice (the frontier check above only catches copies
    // of already-folded events) — permanently corrupting the smoother.
    // (ts, tie) identifies an event, so collisions against the buffer
    // and within the batch flag as late duplicates, same loud contract
    // as the frontier path (r14 review find).
    val seen = scala.collection.mutable.Set.empty[(Long, Long)]
    pending.foreach(p => seen += ((p.ts, p.tie)))
    val (dupArrivals, fresh0) = ok.partition { e =>
      !seen.add((e.ts.getTime, e.event_id))
    }
    // merge arrivals into the buffer; fold in (event-time, tie) order
    // everything the horizon has passed — those can no longer be
    // preceded by a non-late arrival, so the fold is exact
    val merged = (pending ++
      fresh0.map(e => PendingObs(e.ts.getTime, e.event_id, e.value)))
      .sortBy(p => (p.ts, p.tie))
    val (foldable, hold) = merged.partition(_.ts < horizon)
    OrderedPlan(lateArrivals ++ dupArrivals, foldable, hold)
  }

  /** Timeout arming shared by the ordered operators: wake when the
    * horizon passes the oldest buffered observation; plain idle eviction
    * when the buffer is empty; an idle horizon from "now" when state
    * exists without a frontier.
    */
  private[streaming] def armOrderedTimeout(
      state: GroupState[_], hold: Seq[PendingObs], lastTs: Long,
      wm: Long, slackMs: Long, idleGapSeconds: Long): Unit =
    if (hold.nonEmpty) {
      // timeout fires once wm > timeoutTs, i.e. horizon > minPendingTs
      val wake = hold.iterator.map(_.ts).min - slackMs
      state.setTimeoutTimestamp(math.max(wake, wm + 1))
    } else if (lastTs != Long.MinValue) {
      state.setTimeoutTimestamp(math.max(lastTs + idleGapSeconds * 1000L, wm + 1))
    } else {
      // state exists but nothing ever folded (all arrivals were late
      // flags on a fresh key — impossible, a fresh key has no frontier —
      // or an empty invocation); evict on idle horizon from now
      state.setTimeoutTimestamp(wm + idleGapSeconds * 1000L + 1)
    }

  /** Fixed-duration interval string → milliseconds (calendar-month
    * intervals refused — they are not fixed durations).
    */
  private[streaming] def intervalMs(s: String): Long = {
    val i = org.apache.spark.sql.catalyst.util.IntervalUtils
      .stringToInterval(org.apache.spark.unsafe.types.UTF8String.fromString(s))
    require(i.months == 0,
      s"interval '$s' uses calendar months — not a fixed duration")
    i.days * 86400000L + i.microseconds / 1000L
  }

  /** The ordered-mode per-key transition — see [[smoothOrdered]] for the
    * semantics. `slackMs` = watermarkMs − latenessMs (both validated at
    * wiring time): the fold horizon is `currentWatermark + slackMs` ≈
    * (max event time seen) − lateness.
    */
  def orderedEwmaFn(alpha: Double, idleGapSeconds: Long, slackMs: Long)(
      key: Long,
      events: Iterator[EwmaEvent],
      state: GroupState[OrderedEwmaState]): Iterator[EwmaPoint] = {
    // belt-and-braces for direct flatMapGroupsWithState wiring, as in
    // ewmaFn; smoothOrdered validates driver-side (including the
    // watermark >= lateness bound that keeps slackMs nonnegative)
    require(alpha > 0.0 && alpha <= 1.0, s"alpha ($alpha) must be in (0, 1]")
    require(idleGapSeconds > 0,
      s"idleGapSeconds ($idleGapSeconds) must be positive")
    require(slackMs >= 0, s"slackMs ($slackMs) must be nonnegative " +
      "(watermark tighter than lateness — smoothOrdered refuses this at wiring time)")
    val wm = state.getCurrentWatermarkMs()
    val st = state.getOption.getOrElse(
      OrderedEwmaState(Long.MinValue, Long.MinValue, None, Nil))
    val fresh = if (state.hasTimedOut) Seq.empty[EwmaEvent] else events.toSeq
    val plan = planOrdered(fresh, st.lastTs, st.lastTie, st.pending, wm, slackMs)
    val lateOut = plan.late
      .map(e => EwmaPoint(key, e.event_id, e.value, None, late = true))
    var (lastTs, lastTie, ewma) = (st.lastTs, st.lastTie, st.ewma)
    val foldedOut = plan.foldable.map { p =>
      val next = step(alpha, p.value, ewma)
      lastTs = p.ts; lastTie = p.tie; ewma = next
      EwmaPoint(key, p.tie, p.value, next, late = false)
    }
    if (state.hasTimedOut && foldedOut.isEmpty && plan.hold.isEmpty) {
      // idle horizon passed with nothing buffered: evict
      state.remove()
      return Iterator.empty
    }
    state.update(OrderedEwmaState(lastTs, lastTie, ewma, plan.hold))
    armOrderedTimeout(state, plan.hold, lastTs, wm, slackMs, idleGapSeconds)
    (foldedOut ++ lateOut).iterator
  }

  /** Bounded-allowed-lateness EWMA: ordinary out-of-order arrivals get
    * REAL ewma values instead of the base mode's `late` flag. Events are
    * held in a per-key buffer and folded in (event-time, tie) order once
    * the fold horizon — (max event time) − `lateness`, tracked as
    * watermark + slack — passes them, so any disorder within `lateness`
    * is served exactly: the emitted values are the strictly sequential
    * (event-time-ms, tie) fold (bit-for-bit
    * [[graft.temporal.EwmaFeatures]] parity on single-segment keys,
    * pinned across micro-batch boundaries in EwmaStreamSpec; last-ulp
    * fp-association differences vs the segmented batch plan on hot keys
    * beyond targetSegment — see the batch-path parity note below).
    * Output is therefore DELAYED by up to `lateness` relative to arrival
    * — the price of exactness.
    *
    * Events later than `lateness` but within `watermark` still surface,
    * flagged `late = true, ewma = null` (the base-mode contract); events
    * behind the watermark itself are dropped by Spark before this
    * operator runs, the standard watermarked contract. With
    * `lateness == watermark` (the default wiring) the flag path is
    * corner-case-only and Spark's watermark is the single bound.
    *
    * State per key: the 3-number frontier + the ≤`lateness`-window
    * buffer — O(keys × lateness-rate), never O(history). Buffer flush
    * needs no new per-key data: an event-time timeout set at (oldest
    * buffered − slack) folds the buffer as the global watermark
    * advances. Idle keys with an empty buffer evict after
    * `idleGapSeconds`, as in [[smooth]].
    *
    * On a batch `Dataset` this degenerates to the per-key
    * (event-time-ms, tie) fold ON THE SEGMENTED [[graft.temporal.EwmaFeatures]]
    * PLAN (bit-exact vs that operator by construction; no per-key
    * row-size cap on backfill). Stream-vs-batch parity is bit-exact for
    * keys within one segment (≤ targetSegment = 8192 events) and
    * fp-associativity-equal (last ulps, the EwmaFeatures contract)
    * beyond — see the in-body parity note. Duplicate (key, ts, tie)
    * rows fold once and flag the rest in BOTH modes; the batch winner
    * is deterministic (greatest value), where the stream keeps
    * first-arrival.
    */
  def smoothOrdered(
      events: Dataset[EwmaEvent],
      alpha: Double = 0.25,
      lateness: String = "1 hour",
      watermark: String = null, // null → same as lateness
      idleGapSeconds: Long = 86400L): Dataset[EwmaPoint] = {
    require(alpha > 0.0 && alpha <= 1.0, s"alpha ($alpha) must be in (0, 1]")
    require(idleGapSeconds > 0,
      s"idleGapSeconds ($idleGapSeconds) must be positive")
    val latenessMs = intervalMs(lateness)
    val wmStr = Option(watermark).getOrElse(lateness)
    val watermarkMs = intervalMs(wmStr)
    require(latenessMs > 0, s"lateness ($lateness) must be positive")
    require(watermarkMs >= latenessMs,
      s"watermark ($wmStr) must be >= lateness ($lateness): Spark drops rows " +
        "behind the watermark before the operator can flag them")
    import events.sparkSession.implicits._
    if (!events.isStreaming) {
      // batch degenerate case: everything is within lateness — the
      // per-key (event-time ms, tie) fold, routed through the SEGMENTED
      // EwmaFeatures plan, NOT a flatMapGroups gather: a gather holds
      // each key's full history in one invocation — the per-key row-size
      // cap the segmented scan exists to remove, and this path is the
      // recommended backfill entry so it must scale like the batch
      // operator. unix_millis keeps the stream contract's millisecond
      // fold granularity (a raw timestamp order column would bucket at
      // seconds and, worse, ORDER at microseconds).
      //
      // Parity contract, stated precisely: bit-exact vs EwmaFeatures by
      // construction (it IS that plan). vs the STREAM: bit-exact for
      // keys whose history fits one segment (<= targetSegment = 8192
      // events — the adaptive bucket formula keeps such keys
      // single-segment, i.e. a strictly sequential fold); beyond that
      // the segmented carry recomposition differs in last ulps from the
      // stream's sequential fold — the same fp-associativity tolerance
      // EwmaFeatures documents, priced consciously: the alternative
      // (numBuckets = 1) restores bit parity by re-introducing the
      // whole-history-per-key row the hot-key path exists to avoid.
      val withMs = events.toDF().withColumn("__oms", expr("unix_millis(ts)"))
      // duplicate (key, ts-ms, tie) rows fold once and FLAG the rest —
      // the streaming path's redelivery guard, mirrored (r14 review:
      // without this, batch double-folded exactly the at-least-once
      // inputs the guard was added for). The lag window partitions on
      // the key — the same hash partitioning EwmaFeatures' own span agg
      // needs — and picks a DETERMINISTIC winner per duplicate group
      // (greatest value, nulls last; the stream keeps first-arrival,
      // which batch data cannot express).
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy(col("user_id"))
        .orderBy(col("__oms"), col("event_id"), col("value").desc_nulls_last)
      val marked = withMs.withColumn("__dup",
        coalesce(
          lag(struct(col("__oms"), col("event_id")), 1).over(w) ===
            struct(col("__oms"), col("event_id")),
          lit(false)))
      val flagged = marked.where(col("__dup"))
        .select(col("user_id"), col("event_id"), col("value"),
          lit(null).cast("double").as("ewma"), lit(true).as("late"))
      val folded = new graft.temporal.EwmaFeatures(alpha = alpha,
        keyCol = "user_id", orderCol = "__oms", valueCol = "value",
        tieCol = "event_id")
        .transform(marked.where(!col("__dup")).drop("__dup"))
        .select(col("user_id"), col("event_id"), col("value"), col("ewma"),
          lit(false).as("late"))
      folded.unionByName(flagged).as[EwmaPoint]
    } else {
      events
        .withWatermark("ts", wmStr)
        .groupByKey(_.user_id)
        .flatMapGroupsWithState(OutputMode.Append(), GroupStateTimeout.EventTimeTimeout)(
          orderedEwmaFn(alpha, idleGapSeconds, watermarkMs - latenessMs))
    }
  }
}
