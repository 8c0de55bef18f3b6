package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Streaming heavy hitters: per-group top-k items under BOUNDED state —
  * the SpaceSaving summary (Metwally, Agrawal, El Abbadi 2005), `capacity`
  * counters per group no matter how many distinct items flow through.
  * The live counterpart of the batch exact top-k (q56/q08 family) and of
  * the CMS+heap sketch (q74): "which domains/tokens/users dominate this
  * feed RIGHT NOW", asked of a stream whose item cardinality would blow
  * any exact per-item state.
  *
  * Beyond-reference operator (LLM-pipeline extension from the build brief).
  *
  * == SpaceSaving invariants (what the spec pins) ==
  *
  * With n events folded into a group and m = `capacity` counters:
  *   - any item whose true count exceeds n/m is IN the summary
  *     (guaranteed-heavy-hitter completeness);
  *   - every counter overestimates: est >= true >= est − err, with
  *     err <= floor(n/m) (the evicted-minimum bound).
  *
  * Estimates are arrival-order dependent (inherent to the sketch); within
  * one micro-batch events fold in (event-time, item) order and eviction
  * ties break deterministically (min count, then lexicographically
  * GREATEST item leaves — so the items that win rank ties are also the
  * stickier ones), making each run reproducible given the same batch
  * boundaries. A null item is a real item (nulls-first in every ordering
  * — matching the batch path, where groupBy/rank treat null as a value).
  * A null GROUP is refused loudly in both modes: the batch rank path
  * raises on it, and the live transition raises symmetrically — a corrupt
  * key column should stop a monitor, not silently become a key.
  *
  * == Emission contract ==
  *
  * Per micro-batch, each group that received events emits its CURRENT
  * top-k snapshot tagged with `n_group` (events folded so far) and
  * `as_of` (the group's event-time frontier, epoch ms) — consumers keep
  * the rows with the largest (as_of, n_group) per group. A timed-out
  * group evicts SILENTLY: its state last changed when its last events
  * folded, and that batch already emitted the identical snapshot — a
  * flush-on-timeout would be a byte-for-byte duplicate row, not new
  * information.
  * n_group ALONE is not a freshness key: idle eviction resets it, so a
  * group returning after eviction would emit smaller n_group values than
  * its pre-eviction snapshots; as_of is event time and only moves forward.
  * State per group is `capacity` (item, cnt, err) triples + a frontier —
  * O(groups × capacity); idle groups evict after `idleGapSeconds` of
  * event time (a group returning later restarts its summary — the
  * documented trade, as in [[EwmaStream]]).
  *
  * On a BATCH frame — the backfill half of the parity contract — the
  * sketch is pointless (exact counts cost one partial-aggregated groupBy),
  * so [[monitor]] degenerates to the EXACT per-group top-k with err = 0
  * and as_of = the group's max event time: the q179 oracle gates that
  * path, and the spec pins the sketch's invariants against the same
  * exact counts.
  */
object StreamingTopK {

  case class ItemEvent(group: String, item: String, ts: Timestamp)
  case class Counter(item: String, cnt: Long, err: Long)
  case class TopKState(n: Long, lastTs: Long, counters: Seq[Counter])
  case class TopKRow(group: String, item: String, est: Long, err: Long,
      rank: Int, n_group: Long, as_of: Long)

  /** Null-safe item key: nulls first, then lexicographic — the same order
    * Spark's ascending sort gives the batch path's tie column.
    */
  private def itemKey(s: String): (Int, String) =
    if (s == null) (0, "") else (1, s)

  /** Eviction order: min count first, ties leave the GREATEST item
    * (nulls-first inverted = nulls last). A TreeSet keyed by this keeps
    * the victim lookup O(log capacity) instead of an O(capacity) scan
    * per novel item — the per-event cost the capacity bound exists to
    * keep small.
    */
  private val evictOrd: Ordering[(Long, String)] =
    Ordering.Tuple2(Ordering.Long,
      Ordering.Tuple2(Ordering.Int, Ordering.String).reverse.on(itemKey))

  /** One SpaceSaving fold of `items` (already in fold order) into
    * `counters`. Exposed for the spec's reference replay.
    */
  private[streaming] def fold(capacity: Int,
      counters: Seq[Counter], items: Seq[String]): Seq[Counter] = {
    val m = scala.collection.mutable.HashMap.empty[String, Counter]
    val byCnt = scala.collection.mutable.TreeSet.empty[(Long, String)](evictOrd)
    counters.foreach { c => m(c.item) = c; byCnt += ((c.cnt, c.item)) }
    items.foreach { it =>
      m.get(it) match {
        case Some(c) =>
          byCnt -= ((c.cnt, c.item))
          m(it) = c.copy(cnt = c.cnt + 1)
          byCnt += ((c.cnt + 1, c.item))
        case None if m.size < capacity =>
          m(it) = Counter(it, 1L, 0L)
          byCnt += ((1L, it))
        case None =>
          val (vCnt, vItem) = byCnt.head
          byCnt -= ((vCnt, vItem))
          m.remove(vItem)
          m(it) = Counter(it, vCnt + 1L, vCnt)
          byCnt += ((vCnt + 1L, it))
      }
    }
    m.values.toSeq
  }

  private def snapshot(group: String, st: TopKState, k: Int): Iterator[TopKRow] =
    st.counters.sortBy(c => (-c.cnt, c.err, itemKey(c.item))).iterator.take(k)
      .zipWithIndex
      .map { case (c, i) =>
        TopKRow(group, c.item, c.cnt, c.err, i + 1, st.n, st.lastTs)
      }

  /** The per-group state transition — exposed for direct
    * `flatMapGroupsWithState` wiring; [[monitor]] is the convenience form.
    */
  def topKFn(capacity: Int, k: Int, idleGapSeconds: Long)(
      group: String,
      events: Iterator[ItemEvent],
      state: GroupState[TopKState]): Iterator[TopKRow] = {
    require(capacity > 0, s"capacity ($capacity) must be positive")
    require(k > 0 && k <= capacity,
      s"k ($k) must be in [1, capacity=$capacity]: the summary cannot rank " +
        "items it does not hold")
    require(idleGapSeconds > 0,
      s"idleGapSeconds ($idleGapSeconds) must be positive")
    // loud, SYMMETRIC with the batch path (whose grouped-rank raises on a
    // null group) — without this the same monitor would run live and then
    // fail on backfill
    require(group != null,
      "StreamingTopK: null group key — a corrupt key column stops the " +
        "monitor in both modes; filter or coalesce null groups upstream")
    // silent eviction, deliberately (see the emission contract above): the
    // state is unchanged since the batch that last folded events into it,
    // so the "final" snapshot was already emitted then — re-emitting it
    // here would hand consumers an exact-duplicate row per eviction
    if (state.hasTimedOut) {
      state.remove()
      return Iterator.empty
    }
    val sorted = events.toSeq.sortBy(e => (e.ts.getTime, itemKey(e.item)))
    val st = state.getOption.getOrElse(TopKState(0L, Long.MinValue, Nil))
    val next = TopKState(
      st.n + sorted.size,
      math.max(st.lastTs, if (sorted.isEmpty) Long.MinValue else sorted.last.ts.getTime),
      fold(capacity, st.counters, sorted.map(_.item)))
    state.update(next)
    if (next.lastTs != Long.MinValue)
      state.setTimeoutTimestamp(next.lastTs + idleGapSeconds * 1000L)
    snapshot(group, next, k)
  }

  /** Per-group top-k over a stream of [[ItemEvent]]. Streaming: the
    * SpaceSaving summary above. Batch: EXACT counts (one partial-agg
    * groupBy + the shared grouped-rank path), err = 0 — backfill and the
    * q179 oracle read the same surface.
    */
  def monitor(
      events: Dataset[ItemEvent],
      capacity: Int = 256,
      k: Int = 10,
      watermark: String = "1 hour",
      idleGapSeconds: Long = 86400L): DataFrame = {
    require(capacity > 0, s"capacity ($capacity) must be positive")
    require(k > 0 && k <= capacity,
      s"k ($k) must be in [1, capacity=$capacity]")
    require(idleGapSeconds > 0,
      s"idleGapSeconds ($idleGapSeconds) must be positive")
    import events.sparkSession.implicits._
    if (!events.isStreaming) {
      // the per-item max event time rides the one (group, item) agg so
      // totals below can derive ENTIRELY from `counts`: both consumers
      // then share the identical counts exchange (runtime exchange reuse
      // executes it once), so the input plan runs ONCE — the r14 ADVICE
      // double-scan, where a separate groupBy(group) over raw `events`
      // re-executed an expensive upstream frame, is gone
      val counts = events.toDF().groupBy(col("group"), col("item"))
        .agg(count(lit(1)).as("est"), max(expr("unix_millis(ts)")).as("__mts"))
      val ranked = graft.sql.GroupedNtile.rankByValue(counts, "group", "est",
        descending = true, tieCols = Seq(col("item")), rankName = "rank")
      // n_group/as_of as a partial-aggregated one-row-per-group frame
      // joined onto the k survivors — NOT an unordered window over the
      // item frame, whose whole-partition buffer is exactly the per-group
      // item cardinality the sketch exists to avoid holding. Null groups
      // cannot reach this join: rankByValue fails loudly on them (and the
      // live transition raises the same way).
      val totals = counts.groupBy(col("group")).agg(
        sum(col("est")).as("n_group"),
        max(col("__mts")).as("as_of"))
      ranked
        .where(col("rank") <= k)
        .join(totals, Seq("group"))
        .select(col("group"), col("item"), col("est"),
          lit(0L).as("err"), col("rank").cast("int").as("rank"),
          col("n_group"), col("as_of"))
    } else {
      events
        .withWatermark("ts", watermark)
        .groupByKey(_.group)
        .flatMapGroupsWithState(OutputMode.Append(), GroupStateTimeout.EventTimeTimeout)(
          topKFn(capacity, k, idleGapSeconds))
        .toDF()
    }
  }
}
