package graft.temporal

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DateType, NumericType, TimestampType}

/** Per-key exponentially-weighted moving average — the RECURSIVE
  * time-series feature a window frame cannot express: ewma_t = α·x_t +
  * (1-α)·ewma_{t-1} depends on its own previous output, not on a bounded
  * frame of inputs ([[RollingFeatures]] covers the frame-expressible
  * trailing stats; this covers the infinite-memory smoother that anomaly
  * detection and trend monitors actually use).
  *
  * Beyond-reference operator (LLM-pipeline extension from the build brief).
  *
  * == Segmented two-phase plan (no per-key row-size bound) ==
  *
  * The old formulation gathered each key's FULL history into one row
  * (`collect_list` + row-local fold) — correct, but a hot key with 10⁸
  * events overflows a single row. EWMA is an affine recurrence: each
  * non-null observation maps the running value p ↦ α·x + (1-α)·p, and
  * affine maps compose, so a contiguous segment of a key's history is
  * summarized by three doubles:
  *
  *   - `Bc` = Π(1-α) over the segment's non-null values (the composed
  *     multiplier), `A` = the composed offset (folded left-to-right as
  *     A' = α·x + (1-α)·A from A=0), so a non-null incoming carry p
  *     leaves the segment as `Bc·p + A`;
  *   - `S` = the segment's standalone fold (seeded at its first non-null
  *     value — what a NULL incoming carry leaves the segment as).
  *
  * The plan (the [[graft.sql.PrefixSum]] two-phase discipline, applied to
  * an affine scan instead of a sum):
  *
  *  1. per-key (min, max, count) of the order column (one
  *     partial-aggregated groupBy), joined back; the key's bucket count
  *     ADAPTS to its history length —
  *     `B_k = least(numBuckets, ceil(n_k / targetSegment))` — so a
  *     normal key is ONE segment (zero segmentation overhead, and its
  *     values are bit-identical to the purely sequential fold) while a
  *     hot key splits into up to `numBuckets` segments of
  *     ~`targetSegment` events; each row gets the integer range bucket
  *     `(o - min) div ceil(span / B_k)` — pure BIGINT arithmetic,
  *     bit-replayable by the oracle, and DIVIDE-first so no intermediate
  *     can overflow at any span/B_k combination (a span itself near
  *     Long.MaxValue fails loudly rather than wrapping);
  *  2. per-(key, bucket) segment gather: `collect_list` + `array_sort`
  *     by (order, tie) and ONE row-local fold computing (A, Bc, S) —
  *     the gathered row is bounded by ~max(history/numBuckets,
  *     targetSegment), never the whole history;
  *  3. per-key carry chain: a key-partitioned window over the segment
  *     rows (≤numBuckets per key — usually ONE) collects each segment's
  *     STRICTLY-EARLIER summaries — three doubles each, bounded window
  *     state — and folds them left-to-right:
  *     carry' = if (carry null) S else Bc·carry + A;
  *  4. re-fold each segment's elements with its incoming carry using the
  *     plain recurrence — bit-identical fold ORDER within segments.
  *
  * Two exchanges total: the (key, bucket) gather and the key-window over
  * the segment frame. The window is deliberately NOT a separate summary
  * aggregation joined back on (key, bucket): that formulation either
  * re-runs the gather for the summary branch (a diamond), goes
  * stats-less under a pinned checkpoint (demoting the carry join to a
  * sort-merge with a THIRD full-data exchange — measured), or leans on
  * broadcasting a one-row-per-(key, bucket) frame that stops being
  * broadcastable at billion-key scale. No driver state. A hot key costs
  * max(~targetSegment elements, numBuckets summaries) per task, never
  * its whole history.
  *
  * == Numeric contract ==
  *
  * Within a segment the fold order is bit-identical to the sequential
  * recurrence — and a key whose history fits `targetSegment` is ONE
  * segment, so normal keys are bit-identical to the purely sequential
  * fold end-to-end. ACROSS segment boundaries (hot keys only) the carry
  * is the affine recomposition `Bc·p + A`, which differs from the purely
  * sequential interleaving in the last ulps (IEEE addition does not
  * re-associate) — the standard parallel-scan trade, deterministic and
  * independent of partitioning/task order. The q127 oracle replays the
  * identical segmented arithmetic (same adaptive bucket formula, same
  * fold expressions), so engine parity stays bit-exact. `numBuckets = 1`
  * forces the exact sequential semantics (and its row-size bound) at any
  * history length.
  *
  * NULL handling (the pandas `ewm` convention, unchanged): a null
  * observation emits the running ewma unchanged (null only while no value
  * has been seen yet) — a*NULL would otherwise poison every later step.
  * A null ORDER value has no defined position in a recurrence and fails
  * loudly (the PrefixSum discipline). The order column must be numeric /
  * timestamp (bucketing is integer arithmetic on its BIGINT cast — a
  * monotone function of the order, so segment boundaries respect it;
  * within-segment sorting uses the original values).
  */
class EwmaFeatures(
    alpha: Double = 0.25,
    keyCol: String = "user_id",
    orderCol: String = "ts_us",
    valueCol: String = "value",
    tieCol: String = "event_id",
    numBuckets: Int = 1024,
    targetSegment: Long = 8192L) {
  require(alpha > 0.0 && alpha <= 1.0, s"alpha ($alpha) must be in (0, 1]")
  // 2^12 cap, down from the r13 2^20: the carry chain (phase 3)
  // materializes each segment row's STRICTLY-EARLIER summaries via a
  // window collect_list — O(B²/2) three-double structs of window state
  // per maximal hot key. At the 1024 default that is ~0.5M tiny structs
  // (measured fine); at 4096 ~8M (the spec pins this worst case end to
  // end); at the old 2^20 admission it would be ~5·10^11 — a setting the
  // plan could never honor, so the bound now states what the plan can
  // actually do. Raising it again requires restating the carry as a
  // running fold first (no bit-exact cumulative affine composition
  // exists in Spark SQL today — exp/log products break IEEE parity).
  require(numBuckets > 0 && numBuckets <= (1 << 12),
    s"numBuckets ($numBuckets) must be in [1, 2^12] (the carry window " +
      "holds O(numBuckets^2) summaries per hot key — see the phase-3 note)")
  require(targetSegment > 0, s"targetSegment ($targetSegment) must be positive")

  /** (key, tie, value, ewma): one row per input event; ewma seeds at the
    * key's first value.
    */
  def transform(events: DataFrame): DataFrame = {
    events.schema(orderCol).dataType match {
      case _: NumericType | TimestampType | DateType => ()
      case dt => throw new IllegalArgumentException(
        s"EwmaFeatures: order column '$orderCol' must be numeric/timestamp for " +
          s"range bucketing, got $dt")
    }
    val a = alpha
    val b = 1.0 - alpha
    val B = numBuckets
    val tgt = targetSegment

    // DATE→BIGINT casts are disallowed by Spark, so a DateType order
    // column needs its integer image taken via unix_date (days since
    // epoch — monotone, so bucket boundaries still respect the order);
    // the r13 guard accepted DateType and then died at analysis with a
    // generic CAST error (r13 ADVICE). `__ol` is the bucketing image;
    // `__o` keeps the original values for within-segment sorting.
    val oLong = events.schema(orderCol).dataType match {
      case DateType => unix_date(col(orderCol)).cast("long")
      case _ => col(orderCol).cast("long")
    }
    val e = events.select(col(keyCol).as("__k"), col(orderCol).as("__o"),
      oLong.as("__ol"), col(tieCol).as("__tie"),
      col(valueCol).cast("double").as("__v"))

    // phase 1: per-key span + adaptive bucket count -> integer range
    // bucket. The join is null-safe so a NULL key is a real group (the
    // TargetEncoder convention); AQE broadcasts the span frame while
    // small.
    val span = e.groupBy(col("__k"))
      .agg(min(col("__ol")).as("__omin"),
        max(col("__ol")).as("__omax"),
        count(lit(1)).as("__n"))
      .withColumn("__bk", expr(
        s"least(CAST($B AS BIGINT), (__n + ${tgt - 1}L) div ${tgt}L)"))
      .select(col("__k").as("__sk"), col("__omin"), col("__omax"), col("__bk"))
    // bucket = (o - min) div ceil(span / B_k): DIVIDE-first, deliberately
    // — the multiply form `B_k * (o - min)` overflows Long once
    // span > Long.Max / B_k (a raw-id order column can span the full
    // Long range), silently wrapping buckets out of time order. Here no
    // intermediate exceeds span + B_k, and the one unrepresentable case
    // (the span itself near Long.Max) fails LOUDLY below instead of
    // wrapping. Monotone in o, <= B_k - 1 by construction.
    val withB = e.join(span, col("__k") <=> col("__sk")).drop("__sk")
      .withColumn("__bkt",
        when(col("__o").isNull,
          raise_error(lit(s"EwmaFeatures: null order value in '$orderCol'")))
          // try_subtract: under ANSI the raw subtraction would throw its
          // own (less specific) overflow error before this guard runs;
          // under non-ANSI it would WRAP silently — null-on-overflow
          // makes the guard fire with the domain message in both modes
          .when(expr(s"try_subtract(__omax, __omin) IS NULL OR " +
            s"try_subtract(__omax, __omin) > ${Long.MaxValue - (1L << 21)}L"),
            raise_error(lit(s"EwmaFeatures: order span of '$orderCol' " +
              "overflows BIGINT bucketing")))
          .otherwise(expr(
            "((__ol - __omin) div ((__omax - __omin + __bk) div __bk))")))
      .drop("__omin", "__omax", "__bk", "__ol")

    // phase 2: segment gather + one fold computing the affine summary.
    // A/Bc/S fold exactly as documented above; null values are identity
    // on (A, Bc) and on S-after-seeding.
    val seg = withB
      .groupBy(col("__k"), col("__bkt"))
      .agg(expr(
        "array_sort(collect_list(named_struct('o', __o, 'tie', __tie, 'v', __v)))")
        .as("__seq"))
      .withColumn("__sm", expr(
        s"""aggregate(__seq,
           |  named_struct('A', CAST(0.0 AS DOUBLE), 'Bc', CAST(1.0 AS DOUBLE),
           |               'S', CAST(NULL AS DOUBLE)),
           |  (acc, x) -> named_struct(
           |    'A',  CASE WHEN x.v IS NULL THEN acc.A
           |               ELSE ${a}D * x.v + ${b}D * acc.A END,
           |    'Bc', CASE WHEN x.v IS NULL THEN acc.Bc
           |               ELSE ${b}D * acc.Bc END,
           |    'S',  CASE WHEN x.v IS NULL THEN acc.S
           |               WHEN acc.S IS NULL THEN x.v
           |               ELSE ${a}D * x.v + ${b}D * acc.S END))""".stripMargin))

    // phase 3: carry chain over summaries only. Each segment's incoming
    // carry folds the summaries of its key's STRICTLY-EARLIER buckets —
    // ≤numBuckets-1 three-double structs of bounded window state — via a
    // key-partitioned window over the SEGMENT frame (≤numBuckets rows
    // per key thanks to the adaptive B_k, usually exactly one). A window,
    // deliberately NOT a separate summaries aggregation joined back:
    // the join formulation either re-runs the gather for the summary
    // branch (a diamond over a shuffle), goes stats-less under a pinned
    // checkpoint (demoting the carry join to a sort-merge with a THIRD
    // full-data exchange — measured), or leans on broadcasting a
    // one-row-per-(key, bucket) frame that stops being broadcastable at
    // billion-key scale. The window is the predictable plan: one extra
    // exchange of the segment frame, no duplicate compute, no broadcast
    // cliff. collect_list over a window follows frame order (bkt asc,
    // unique per key), so the fold order is deterministic.
    val wPrior = org.apache.spark.sql.expressions.Window
      .partitionBy(col("__k")).orderBy(col("__bkt"))
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, -1)
    val withCin = seg
      .withColumn("__prior", collect_list(col("__sm")).over(wPrior))
      .withColumn("__cin", expr(
        """aggregate(__prior, CAST(NULL AS DOUBLE),
          |  (acc, s) -> CASE WHEN acc IS NULL THEN s.S
          |                   ELSE s.Bc * acc + s.A END)""".stripMargin))
      .drop("__prior", "__sm")

    // phase 4: re-fold each segment with its carry — the plain recurrence
    // in (order, tie) order, seeded at the carry. A row-local Scala pass,
    // deliberately NOT an `aggregate` HOF building the output with
    // concat(acc.lst, ...): Catalyst array concat copies the accumulator
    // every step — O(|segment|²) per segment, which is exactly the
    // blow-up this operator exists to avoid on hot keys. The UDF is one
    // linear pass over the value array (same IEEE double ops in the same
    // order — bit parity with the oracle is unchanged); the ewma array
    // zips back positionally, so the generic tie column never enters the
    // UDF signature.
    withCin
      .withColumn("__ew", EwmaFeatures.refold(a, b)(
        expr("transform(__seq, x -> x.v)"), col("__cin")))
      .select(col("__k"), explode(arrays_zip(col("__seq"), col("__ew"))).as("r"))
      .select(col("__k").as(keyCol), col("r.__seq.tie").as(tieCol),
        col("r.__seq.v").as(valueCol), col("r.__ew").as("ewma"))
  }
}

object EwmaFeatures {
  import org.apache.spark.sql.expressions.UserDefinedFunction

  /** Linear within-segment re-fold: values in segment order, the
    * incoming carry as initial state; emits one ewma per value. Null
    * values emit the running state unchanged; the state seeds at the
    * first value seen (after a null carry). Arithmetic is `a·x + b·prev`
    * in exactly the fold order the q127 oracle replays.
    */
  private[temporal] def refold(a: Double, b: Double): UserDefinedFunction =
    udf((vs: Seq[java.lang.Double], cin: java.lang.Double) => {
      var prev: java.lang.Double = cin
      val out = new Array[java.lang.Double](vs.length)
      var i = 0
      vs.foreach { v =>
        val e: java.lang.Double =
          if (v == null) prev
          else if (prev == null) v
          else java.lang.Double.valueOf(a * v.doubleValue() + b * prev.doubleValue())
        prev = e
        out(i) = e
        i += 1
      }
      out.toSeq
    })
}
