package graft.streaming

import org.apache.spark.sql.Dataset
import org.apache.spark.sql.functions.{col, expr, lit, row_number}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

import graft.streaming.EwmaStream.EwmaEvent

/** Live per-key EWMA mean/variance anomaly monitor — the continuous
  * counterpart of [[graft.temporal.AnomalyDetector]]: each event is
  * z-scored against the smoother state BEFORE it folds in
  * (z = (x − m_{t−1}) / sqrt(v_{t−1}), v = q − m² clamped at 0), then
  * advances the (m, q) pair with the shared EWMA step. Identical
  * arithmetic, identical cold-start gate (non-null value, ≥ `minPrior`
  * non-null priors, strictly positive prior variance), so a live alert
  * and the batch backfill agree on every flag.
  *
  * Beyond-reference operator (LLM-pipeline extension from the build brief).
  *
  * State per key is five numbers (frontier ts + tie, m, q, non-null
  * count) — O(keys), never O(history) — with the [[EwmaStream]] base-mode
  * contracts unchanged: within a micro-batch events fold in (event-time,
  * tie) order; an arrival behind the folded frontier is emitted FLAGGED
  * (`late = true`, unscored) and leaves the state untouched; idle keys
  * evict on an event-time timeout (a returning key restarts cold —
  * mean re-seeds, z stays null until `minPrior` rebuilds).
  *
  * On a BATCH frame this routes through the SEGMENTED
  * [[graft.temporal.AnomalyDetector]] plan (no per-key row-size cap on
  * backfill) at the stream contract's MILLISECOND fold granularity, with
  * a duplicate guard on the per-key TIE ITSELF: any reused event_id
  * within a key folds once (earliest time, then greatest value —
  * deterministic) and flags the rest — wider than the stream's (ts, tie)
  * redelivery check, because the detector's smoother outputs join back
  * on (key, tie) and a reused tie would fan that join out with mixed
  * means. Exact redeliveries (same ts AND tie) flag identically in both
  * modes; a tie reused at a NEW timestamp flags on backfill while the
  * live stream — which cannot know the id was reused — folds it: parity
  * is promised only for per-key-unique ties, the same input contract the
  * detector documents. Stream-vs-batch parity is bit-exact for keys
  * within one segment (≤ targetSegment events) and
  * fp-associativity-equal beyond — the EwmaFeatures contract, inherited
  * twice.
  */
object AnomalyStream {

  case class AnomPoint(user_id: Long, event_id: Long, value: Option[Double],
      mean: Option[Double], variance: Option[Double], z: Option[Double],
      is_anomaly: Int, late: Boolean)

  case class AnomState(lastTs: Long, lastTie: Long, m: Option[Double],
      q: Option[Double], nPrior: Long)

  /** v = q − m² clamped at 0 — the identical expression (and therefore
    * the identical IEEE ops) the batch detector computes.
    */
  private def clampVar(q: Double, m: Double): Double = {
    val v = q - m * m
    if (v < 0.0) 0.0 else v
  }

  private case class Step(z: Option[Double], flag: Int, m: Option[Double],
      q: Option[Double], nPrior: Long, variance: Option[Double])

  /** ONE score-then-fold step, shared by the base and ordered transitions
    * (the [[EwmaStream.step]] rule: scoring arithmetic that exists in two
    * copies silently breaks the live-vs-backfill flag agreement).
    */
  private def advance(alpha: Double, threshold: Double, minPrior: Int,
      value: Option[Double], m: Option[Double], q: Option[Double],
      nPrior: Long): Step = {
    val z = (value, m, q) match {
      case (Some(x), Some(mm), Some(qq)) if nPrior >= minPrior =>
        val vp = clampVar(qq, mm)
        if (vp > 0.0) Some((x - mm) / math.sqrt(vp)) else None
      case _ => None
    }
    val flag = if (z.exists(v => math.abs(v) > threshold)) 1 else 0
    val m1 = EwmaStream.step(alpha, value, m)
    val q1 = EwmaStream.step(alpha, value.map(x => x * x), q)
    val v1 = (q1, m1) match {
      case (Some(qq), Some(mm)) => Some(clampVar(qq, mm))
      case _ => None
    }
    Step(z, flag, m1, q1, nPrior + (if (value.isDefined) 1L else 0L), v1)
  }

  /** The per-key transition — exposed for direct `flatMapGroupsWithState`
    * wiring; [[detect]] is the convenience form.
    */
  def detectFn(alpha: Double, threshold: Double, minPrior: Int,
      idleGapSeconds: Long)(
      key: Long,
      events: Iterator[EwmaEvent],
      state: GroupState[AnomState]): Iterator[AnomPoint] = {
    require(alpha > 0.0 && alpha <= 1.0, s"alpha ($alpha) must be in (0, 1]")
    require(threshold > 0.0, s"threshold ($threshold) must be positive")
    require(minPrior >= 1, s"minPrior ($minPrior) must be >= 1")
    require(idleGapSeconds > 0,
      s"idleGapSeconds ($idleGapSeconds) must be positive")
    if (state.hasTimedOut) {
      state.remove()
      return Iterator.empty
    }
    val sorted = events.toSeq.sortBy(e => (e.ts.getTime, e.event_id))
    var st = state.getOption.getOrElse(
      AnomState(Long.MinValue, Long.MinValue, None, None, 0L))
    val out = sorted.map { e =>
      val t = e.ts.getTime
      // fresh-key sentinel (Long.MinValue) can never satisfy either leg,
      // so a first-ever event is never late — the base-mode semantics
      if (t < st.lastTs || (t == st.lastTs && e.event_id <= st.lastTie)) {
        // behind the folded frontier: flag, never silently reorder
        AnomPoint(key, e.event_id, e.value, None, None, None, 0, late = true)
      } else {
        // score against the PRE-fold state, then fold
        val s = advance(alpha, threshold, minPrior, e.value, st.m, st.q, st.nPrior)
        st = AnomState(t, e.event_id, s.m, s.q, s.nPrior)
        AnomPoint(key, e.event_id, e.value, s.m, s.variance, s.z, s.flag,
          late = false)
      }
    }
    // st has a real frontier here unless every event was late on a key
    // with no prior state — impossible (a fresh key cannot be late)
    if (st.lastTs != Long.MinValue) {
      state.update(st)
      state.setTimeoutTimestamp(st.lastTs + idleGapSeconds * 1000L)
    }
    out.iterator
  }

  /** Wires [[detectFn]] into a watermarked stream of [[EwmaEvent]]; on a
    * batch frame, routes through the segmented batch detector (see the
    * class doc for the parity contract).
    */
  def detect(
      events: Dataset[EwmaEvent],
      alpha: Double = 0.25,
      threshold: Double = 3.0,
      minPrior: Int = 2,
      watermark: String = "1 hour",
      idleGapSeconds: Long = 86400L): Dataset[AnomPoint] = {
    require(alpha > 0.0 && alpha <= 1.0, s"alpha ($alpha) must be in (0, 1]")
    require(threshold > 0.0, s"threshold ($threshold) must be positive")
    require(minPrior >= 1, s"minPrior ($minPrior) must be >= 1")
    require(idleGapSeconds > 0,
      s"idleGapSeconds ($idleGapSeconds) must be positive")
    import events.sparkSession.implicits._
    if (!events.isStreaming) {
      // batch backfill: the segmented detector plan at the stream's ms
      // fold granularity. The guard flags ANY reused per-key event_id —
      // wider than the stream's (ts, tie) redelivery check — because the
      // detector's smoother outputs join back on (key, tie): a reused tie
      // at a DIFFERENT timestamp would fan that join out k² ways with
      // mixed means (silently wrong), where the stream, which cannot know
      // an id was reused at a new time, folds it. Exact redeliveries
      // (same ts AND tie — the at-least-once case both modes see) flag
      // identically in both. Winner per duplicate group is deterministic:
      // earliest event time, then greatest value.
      val withMs = events.toDF().withColumn("__oms", expr("unix_millis(ts)"))
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy(col("user_id"), col("event_id"))
        .orderBy(col("__oms"), col("value").desc_nulls_last)
      val marked = withMs.withColumn("__dup", row_number().over(w) > 1)
      val flagged = marked.where(col("__dup"))
        .select(col("user_id"), col("event_id"), col("value"),
          lit(null).cast("double").as("mean"),
          lit(null).cast("double").as("variance"),
          lit(null).cast("double").as("z"),
          lit(0).as("is_anomaly"), lit(true).as("late"))
      val scored = new graft.temporal.AnomalyDetector(alpha = alpha,
        threshold = threshold, minPrior = minPrior, keyCol = "user_id",
        orderCol = "__oms", valueCol = "value", tieCol = "event_id")
        .transform(marked.where(!col("__dup")).drop("__dup"))
        .withColumn("late", lit(false))
      scored.unionByName(flagged).as[AnomPoint]
    } else {
      events
        .withWatermark("ts", watermark)
        .groupByKey(_.user_id)
        .flatMapGroupsWithState(OutputMode.Append(), GroupStateTimeout.EventTimeTimeout)(
          detectFn(alpha, threshold, minPrior, idleGapSeconds))
    }
  }

  // ---------------------------------------------------------------------
  // Ordered mode: bounded-allowed-lateness monitoring (smoothOrdered's
  // buffer semantics, scoring at FOLD time)
  // ---------------------------------------------------------------------

  /** Ordered-mode state: the base-mode numbers plus the bounded buffer of
    * observations newer than the fold horizon — O(lateness-rate) per key,
    * as in [[EwmaStream.OrderedEwmaState]].
    */
  case class OrderedAnomState(lastTs: Long, lastTie: Long, m: Option[Double],
      q: Option[Double], nPrior: Long, pending: Seq[EwmaStream.PendingObs])

  /** The ordered-mode per-key transition — [[EwmaStream.planOrdered]]'s
    * buffer plan (shared code, shared contract), with each observation
    * scored against the state it folds INTO, so z/flags are exactly the
    * in-order monitor's even under bounded disorder.
    */
  def orderedAnomFn(alpha: Double, threshold: Double, minPrior: Int,
      idleGapSeconds: Long, slackMs: Long)(
      key: Long,
      events: Iterator[EwmaEvent],
      state: GroupState[OrderedAnomState]): Iterator[AnomPoint] = {
    require(alpha > 0.0 && alpha <= 1.0, s"alpha ($alpha) must be in (0, 1]")
    require(threshold > 0.0, s"threshold ($threshold) must be positive")
    require(minPrior >= 1, s"minPrior ($minPrior) must be >= 1")
    require(idleGapSeconds > 0,
      s"idleGapSeconds ($idleGapSeconds) must be positive")
    require(slackMs >= 0, s"slackMs ($slackMs) must be nonnegative")
    val wm = state.getCurrentWatermarkMs()
    val st = state.getOption.getOrElse(
      OrderedAnomState(Long.MinValue, Long.MinValue, None, None, 0L, Nil))
    val fresh = if (state.hasTimedOut) Seq.empty[EwmaEvent] else events.toSeq
    val plan = EwmaStream.planOrdered(
      fresh, st.lastTs, st.lastTie, st.pending, wm, slackMs)
    val lateOut = plan.late
      .map(e => AnomPoint(key, e.event_id, e.value, None, None, None, 0,
        late = true))
    var (lastTs, lastTie) = (st.lastTs, st.lastTie)
    var (m, q, n) = (st.m, st.q, st.nPrior)
    val foldedOut = plan.foldable.map { p =>
      val s = advance(alpha, threshold, minPrior, p.value, m, q, n)
      lastTs = p.ts; lastTie = p.tie; m = s.m; q = s.q; n = s.nPrior
      AnomPoint(key, p.tie, p.value, s.m, s.variance, s.z, s.flag,
        late = false)
    }
    if (state.hasTimedOut && foldedOut.isEmpty && plan.hold.isEmpty) {
      state.remove()
      return Iterator.empty
    }
    state.update(OrderedAnomState(lastTs, lastTie, m, q, n, plan.hold))
    EwmaStream.armOrderedTimeout(state, plan.hold, lastTs, wm, slackMs,
      idleGapSeconds)
    (foldedOut ++ lateOut).iterator
  }

  /** Bounded-allowed-lateness anomaly monitoring: ordinary out-of-order
    * arrivals are buffered and scored IN (event-time, tie) ORDER once the
    * fold horizon passes them, so their z/flags match the batch detector
    * exactly instead of the base mode's `late` flag — output delayed by
    * up to `lateness`, the price of exactness (the
    * [[EwmaStream.smoothOrdered]] trade, same buffer semantics via the
    * shared planner). Events later than `lateness` still surface flagged;
    * batch frames take the same segmented-detector route as [[detect]].
    */
  def detectOrdered(
      events: Dataset[EwmaEvent],
      alpha: Double = 0.25,
      threshold: Double = 3.0,
      minPrior: Int = 2,
      lateness: String = "1 hour",
      watermark: String = null, // null → same as lateness
      idleGapSeconds: Long = 86400L): Dataset[AnomPoint] = {
    require(alpha > 0.0 && alpha <= 1.0, s"alpha ($alpha) must be in (0, 1]")
    require(threshold > 0.0, s"threshold ($threshold) must be positive")
    require(minPrior >= 1, s"minPrior ($minPrior) must be >= 1")
    require(idleGapSeconds > 0,
      s"idleGapSeconds ($idleGapSeconds) must be positive")
    val latenessMs = EwmaStream.intervalMs(lateness)
    val wmStr = Option(watermark).getOrElse(lateness)
    val watermarkMs = EwmaStream.intervalMs(wmStr)
    require(latenessMs > 0, s"lateness ($lateness) must be positive")
    require(watermarkMs >= latenessMs,
      s"watermark ($wmStr) must be >= lateness ($lateness): Spark drops rows " +
        "behind the watermark before the operator can flag them")
    import events.sparkSession.implicits._
    if (!events.isStreaming) {
      // batch: everything is within lateness — identical to detect()
      detect(events, alpha, threshold, minPrior, wmStr, idleGapSeconds)
    } else {
      events
        .withWatermark("ts", wmStr)
        .groupByKey(_.user_id)
        .flatMapGroupsWithState(OutputMode.Append(), GroupStateTimeout.EventTimeTimeout)(
          orderedAnomFn(alpha, threshold, minPrior, idleGapSeconds,
            watermarkMs - latenessMs))
    }
  }
}
