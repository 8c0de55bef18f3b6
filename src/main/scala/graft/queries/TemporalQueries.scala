package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables
import graft.temporal.{AsOfJoin, Funnel, RangeJoin}

/** Temporal-join queries over the events table.
  *
  * The events `ts` column is µs parquet timestamp (isAdjustedToUTC=false,
  * which Spark reads as TIMESTAMP_NTZ); both sides use the shared
  * integer-µs axis — `unix_micros(cast(ts as timestamp))` with the session
  * zone pinned to UTC equals DuckDB `epoch_us(ts)` exactly.
  */
object TemporalQueries {

  type Q = (SparkSession, String) => DataFrame

  val queries: Map[String, Q] = Map(
    // backward as-of join: each click picks up the most recent prior view
    // by the same user (inclusive), left-outer — the canonical "attach
    // last signal before the observation" shape. One keyed shuffle, no
    // range join. r13: routed through the SQL-text front-end (the
    // asof_join table function registered by GraftExtensions) — the TVF
    // generates the same union+window shape AsOfJoin declares, and
    // AsOfJoinSqlSpec pins row parity between the two surfaces; this
    // oracle query keeps the SQL path itself under the DuckDB gate.
    "q44_asof_join" -> ((s, dir) => {
      graft.GraftExtensions.ensureTemporalJoins(s)
      val ev = Tables.events(s, dir)
      ev.where(col("event_type") === "click")
        .select(col("event_id"), col("user_id"),
          expr("unix_micros(cast(ts as timestamp))").as("ts_us"))
        .createOrReplaceTempView("__q44_clicks")
      ev.where(col("event_type") === "view")
        .select(col("event_id").as("view_id"), col("user_id"),
          expr("unix_micros(cast(ts as timestamp))").as("view_ts_us"))
        .createOrReplaceTempView("__q44_views")
      s.sql("SELECT * FROM asof_join('__q44_clicks', '__q44_views', " +
        "'user_id', 'ts_us', 'view_ts_us')")
    }),

    // bucketed point-in-interval join: clicks attributed to each purchase
    // whose trailing 30-minute window contains them — equi-join on
    // (user, time-bucket) + residual, never a nested loop.
    "q47_range_join" -> ((s, dir) => {
      val win = 1800000000L // 30 min in µs
      val ev = Tables.events(s, dir)
      val clicks = ev.where(col("event_type") === "click")
        .select(col("event_id").as("click_id"), col("user_id"),
          expr("unix_micros(cast(ts as timestamp))").as("click_us"))
      val purchases = ev.where(col("event_type") === "purchase")
        .select(col("event_id").as("purchase_id"), col("user_id"),
          (expr("unix_micros(cast(ts as timestamp))") - win).as("win_start"),
          expr("unix_micros(cast(ts as timestamp))").as("win_end"))
      new RangeJoin(Seq("user_id"), "click_us", "win_start", "win_end", win)
        .join(clicks, purchases)
        .select(col("user_id"), col("click_id"), col("purchase_id"))
    }),

    // ordered conversion funnel: users whose event sequence reaches
    // signup → view → click → purchase with strictly increasing times
    "q57_funnel" -> ((s, dir) => {
      val ev = Tables.events(s, dir)
        .select(col("user_id"), col("event_type"), expr("unix_micros(cast(ts as timestamp))").as("ts_us"))
      new Funnel(Seq("signup", "view", "click", "purchase")).counts(ev)
    }),

    // day-granularity retention cohorts: users grouped by first-active day,
    // counted per activity-day offset
    "q62_retention" -> ((s, dir) => {
      val e = Tables.events(s, dir)
        .select(col("user_id"), expr("(unix_micros(cast(ts as timestamp))) div 86400000000").as("day"))
      val cohort = e.groupBy(col("user_id")).agg(min(col("day")).as("cohort_day"))
      e.distinct()
        .join(cohort, "user_id")
        .groupBy(col("cohort_day"), (col("day") - col("cohort_day")).as("offset_days"))
        .agg(count_distinct(col("user_id")).as("n_users"))
    }),

    // first-order event transition matrix: counts of consecutive
    // (event_type -> next event_type) per user, deterministic order by
    // (time, event_id); user-partitioned window — parallel
    "q63_transitions" -> ((s, dir) => {
      import org.apache.spark.sql.expressions.Window
      val w = Window.partitionBy(col("user_id")).orderBy(col("tu"), col("event_id"))
      Tables.events(s, dir)
        .select(col("user_id"), col("event_id"), col("event_type"),
          expr("unix_micros(cast(ts as timestamp))").as("tu"))
        .withColumn("next_type", lead(col("event_type"), 1).over(w))
        .where(col("next_type").isNotNull)
        .groupBy(col("event_type"), col("next_type"))
        .agg(count(lit(1)).as("n"))
    }),

    // z-order layout clustering: Morton-interleave (user bucket, hour
    // bucket) into one sort key, then per-zrange file-bucket stats — the
    // min/max spans show what a layout-optimized write would let scans
    // prune on (native ZOrder64 codegen kernel)
    "q75_zorder" -> ((s, dir) => {
      val z = graft.sql.functions.zorder(col("x"), col("y"), 10)
      Tables.events(s, dir)
        .select(
          pmod(col("user_id"), lit(1024L)).cast("long").as("x"),
          pmod(expr("(unix_micros(cast(ts as timestamp))) div 3600000000"), lit(1024L)).cast("long").as("y"))
        .select(col("x"), col("y"), z.as("z"))
        .groupBy(expr("z div 4096").as("z_bucket"))
        .agg(count(lit(1)).as("n"),
          min(col("x")).as("min_x"), max(col("x")).as("max_x"),
          min(col("y")).as("min_y"), max(col("y")).as("max_y"))
    }),

    // point-in-time-correct rolling user-history features: trailing-5
    // stats strictly before each event (the ML feature-leakage guard) —
    // one keyed shuffle, one window pass for all features
    // per-user EWMA (alpha = 0.25): the recursive smoother a window frame
    // can't express — the segmented two-phase affine scan (adaptive
    // per-(key, range-bucket) segments, summary-only carry chain,
    // within-segment re-fold), so a hot key never gathers its whole
    // history into one row while a normal key stays ONE segment with
    // exactly sequential arithmetic. Output UNROUNDED on purpose: every
    // op (bucket assignment, summary fold, carry chain, re-fold) is
    // bit-identical across engines (same op order, exactly-representable
    // 0.25/0.75), while rounding would DIVERGE — the recurrence
    // systematically lands values on exact 6dp half-boundaries where
    // round() disagrees.
    "q127_ewma" -> ((s, dir) => {
      new graft.temporal.EwmaFeatures(alpha = 0.25)
        .transform(Tables.events(s, dir)
          .select(col("event_id"), col("user_id"),
            expr("unix_micros(cast(ts as timestamp))").as("ts_us"), col("value")))
        .select(col("user_id"), col("event_id"), col("value"), col("ewma"))
    }),

    // the SQL-TVF surface under the oracle in its OTHER modes (q44
    // covers backward/no-tolerance): forward direction + tolerance —
    // each view matched to the next purchase by the same user within
    // 24h. Right side pre-deduped to one row per (user, ts) so the
    // winner is engine-independent (the q134 discipline).
    "q170_asof_sql_fwd" -> ((s, dir) => {
      graft.GraftExtensions.ensureTemporalJoins(s)
      val ev = Tables.events(s, dir)
      ev.where(col("event_type") === "view")
        .select(col("event_id"), col("user_id"),
          expr("unix_micros(cast(ts as timestamp))").as("ts_us"))
        .createOrReplaceTempView("__q170_views")
      ev.where(col("event_type") === "purchase")
        .select(col("user_id"),
          expr("unix_micros(cast(ts as timestamp))").as("p_ts_us"),
          col("event_id"))
        .groupBy(col("user_id"), col("p_ts_us"))
        .agg(min(col("event_id")).as("p_id"))
        .createOrReplaceTempView("__q170_purch")
      s.sql("SELECT * FROM asof_join('__q170_views', '__q170_purch', " +
        "'user_id', 'ts_us', 'p_ts_us', 'forward', 86400000000)")
    }),

    // range_join through the SQL TVF (q47 keeps the Scala surface under
    // the oracle): views attributed to each purchase's FORWARD 2h window
    "q171_range_sql" -> ((s, dir) => {
      graft.GraftExtensions.ensureTemporalJoins(s)
      val ev = Tables.events(s, dir)
      ev.where(col("event_type") === "view")
        .select(col("event_id").as("view_id"), col("user_id"),
          expr("unix_micros(cast(ts as timestamp))").as("v_us"))
        .createOrReplaceTempView("__q171_pts")
      ev.where(col("event_type") === "purchase")
        .select(col("event_id").as("p_id"), col("user_id"),
          expr("unix_micros(cast(ts as timestamp))").as("start_us"),
          (expr("unix_micros(cast(ts as timestamp))") + lit(7200000000L)).as("end_us"))
        .createOrReplaceTempView("__q171_ivs")
      s.sql("SELECT * FROM range_join('__q171_pts', '__q171_ivs', " +
        "'user_id', 'v_us', 'start_us', 'end_us', 3600000000)")
    }),

    // the multi-key TVF surface (r13 verdict ask #4): composite
    // (user_id, day) key — each purchase matched to the latest prior
    // view by the same user ON THE SAME DAY. Right side deduped to one
    // row per (user, day, ts) so the winner is engine-independent.
    "q173_asof_sql_multikey" -> ((s, dir) => {
      graft.GraftExtensions.ensureTemporalJoins(s)
      val ev = Tables.events(s, dir)
      ev.where(col("event_type") === "purchase")
        .select(col("event_id"), col("user_id"),
          expr("CAST(to_date(ts) AS STRING)").as("day"),
          expr("unix_micros(cast(ts as timestamp))").as("ts_us"))
        .createOrReplaceTempView("__q173_purch")
      ev.where(col("event_type") === "view")
        .select(col("user_id"),
          expr("CAST(to_date(ts) AS STRING)").as("day"),
          expr("unix_micros(cast(ts as timestamp))").as("v_ts_us"),
          col("event_id"))
        .groupBy(col("user_id"), col("day"), col("v_ts_us"))
        .agg(min(col("event_id")).as("v_id"))
        .createOrReplaceTempView("__q173_views")
      s.sql("SELECT * FROM asof_join('__q173_purch', '__q173_views', " +
        "'user_id,day', 'ts_us', 'v_ts_us')")
    }),

    // range_join on the same composite key: views inside each purchase's
    // forward 2h window, same user AND same day (the day key also proves
    // the bucket equi-join composes with extra key columns)
    "q174_range_sql_multikey" -> ((s, dir) => {
      graft.GraftExtensions.ensureTemporalJoins(s)
      val ev = Tables.events(s, dir)
      ev.where(col("event_type") === "view")
        .select(col("event_id").as("view_id"), col("user_id"),
          expr("CAST(to_date(ts) AS STRING)").as("day"),
          expr("unix_micros(cast(ts as timestamp))").as("v_us"))
        .createOrReplaceTempView("__q174_pts")
      ev.where(col("event_type") === "purchase")
        .select(col("event_id").as("p_id"), col("user_id"),
          expr("CAST(to_date(ts) AS STRING)").as("day"),
          expr("unix_micros(cast(ts as timestamp))").as("start_us"),
          (expr("unix_micros(cast(ts as timestamp))") + lit(7200000000L)).as("end_us"))
        .createOrReplaceTempView("__q174_ivs")
      s.sql("SELECT * FROM range_join('__q174_pts', '__q174_ivs', " +
        "'user_id,day', 'v_us', 'start_us', 'end_us', 3600000000)")
    }),

    // the STREAMING smoother's state transition under the oracle: the
    // same flatMapGroupsWithState fn executes in batch mode (each key's
    // events in one sorted invocation — the purely sequential fold), so
    // the oracle is the plain recursive CTE. Ordering granularity is the
    // operator's contract: (event-time millis, event_id) — Timestamp
    // state folds at ms, the tie id breaks sub-ms ties.
    "q172_ewma_stream" -> ((s, dir) => {
      import s.implicits._
      val ev = Tables.events(s, dir)
        .select(col("user_id"), col("event_id"),
          col("ts").cast("timestamp").as("ts"),
          col("value").cast("double").as("value"))
        .as[graft.streaming.EwmaStream.EwmaEvent]
      graft.streaming.EwmaStream.smooth(ev, alpha = 0.25).toDF()
        .where(!col("late"))
        .select(col("user_id"), col("event_id"), col("value"), col("ewma"))
    }),

    // the stream-stream interval join's semantics replayed in batch under
    // the oracle (the q172 pattern — r13 verdict ask #6): the SAME
    // intervalJoin wiring runs on batch frames (withWatermark is a no-op
    // there), so the join condition, key equality, and window bounds the
    // streaming query executes are what the DuckDB oracle checks.
    "q175_interval_join" -> ((s, dir) => {
      val ev = Tables.events(s, dir)
      val clicks = ev.where(col("event_type") === "click")
        .select(col("user_id"), col("event_id").as("click_id"),
          col("ts").cast("timestamp").as("c_ts"))
      val purch = ev.where(col("event_type") === "purchase")
        .select(col("user_id"), col("event_id").as("p_id"),
          col("ts").cast("timestamp").as("p_ts"))
      graft.streaming.StreamStreamJoin.intervalJoin(
        clicks, purch, Seq("user_id"), "c_ts", "p_ts",
        windowBefore = "30 minutes", watermark = "2 hours")
        .select(col("user_id"), col("click_id"),
          expr("unix_micros(c_ts)").as("c_us"),
          col("p_id"), expr("unix_micros(p_ts)").as("p_us"))
    }),

    // the r14 ordered-mode smoother under the oracle: on a batch frame
    // smoothOrdered degenerates to the exact per-key (ts-ms, event_id)
    // sort-fold — the same recurrence q172 replays, so the recursive-CTE
    // oracle gates the NEW operator surface too (flush/buffer logic is
    // MemoryStream-spec'd; this pins the fold arithmetic + ordering)
    "q176_ewma_ordered" -> ((s, dir) => {
      import s.implicits._
      val ev = Tables.events(s, dir)
        .select(col("user_id"), col("event_id"),
          col("ts").cast("timestamp").as("ts"),
          col("value").cast("double").as("value"))
        .as[graft.streaming.EwmaStream.EwmaEvent]
      graft.streaming.EwmaStream.smoothOrdered(ev, alpha = 0.25).toDF()
        .select(col("user_id"), col("event_id"), col("value"), col("ewma"))
    }),

    // EWMA mean/variance anomaly monitor: z-scores each event against the
    // smoother state BEFORE it folded in (m_{t-1}, v_{t-1}) — two
    // independent segmented smoothers (x and x², v = q − m² clamped at 0,
    // West's recurrence expanded), one key-partitioned lag window. No
    // rounding anywhere: mean/variance/z are bit-pinned like q127, the
    // oracle replaying the identical segmented arithmetic for BOTH
    // smoothers plus the same fixed-op-order scoring.
    "q178_anomaly" -> ((s, dir) => {
      new graft.temporal.AnomalyDetector(
        alpha = 0.25, threshold = 3.0, minPrior = 2)
        .transform(Tables.events(s, dir)
          .select(col("event_id"), col("user_id"),
            expr("unix_micros(cast(ts as timestamp))").as("ts_us"),
            col("value")))
        .select(col("user_id"), col("event_id"), col("value"), col("mean"),
          col("variance"), col("z"), col("is_anomaly"))
    }),

    // the LIVE anomaly monitor's batch route under the oracle (the
    // q176 pattern): AnomalyStream.detect on a batch frame = the
    // segmented detector at the stream contract's MILLISECOND fold
    // granularity plus the duplicate-(ts-ms, tie) guard (event_id is
    // unique, so no row flags here — the guard itself is spec-pinned).
    // Streaming parity with this exact surface is AnomalyStreamSpec.
    "q181_anomaly_stream" -> ((s, dir) => {
      import s.implicits._
      val ev = Tables.events(s, dir)
        .select(col("user_id"), col("event_id"),
          col("ts").cast("timestamp").as("ts"),
          col("value").cast("double").as("value"))
        .as[graft.streaming.EwmaStream.EwmaEvent]
      graft.streaming.AnomalyStream.detect(ev,
        alpha = 0.25, threshold = 3.0, minPrior = 2).toDF()
        .select(col("user_id"), col("event_id"), col("value"), col("mean"),
          col("variance"), col("z"), col("is_anomaly"))
    }),

    "q79_rolling_features" -> ((s, dir) => {
      new graft.temporal.RollingFeatures(n = 5)
        .transform(Tables.events(s, dir)
          .select(col("event_id"), col("user_id"),
            expr("unix_micros(cast(ts as timestamp))").as("ts_us"), col("value")))
    }),

    // behavioral sequence mining: top-20 event-type trigram paths across
    // user timelines — q63's transition matrix extended one step. Row-local
    // leads over user-partitioned windows (no self-join fan-out); ordering
    // by integer count + full key, never by a float
    "q90_paths" -> ((s, dir) => {
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
      Tables.events(s, dir)
        .select(col("user_id"), col("event_type").as("e1"),
          lead(col("event_type"), 1).over(w).as("e2"),
          lead(col("event_type"), 2).over(w).as("e3"))
        .where(col("e2").isNotNull && col("e3").isNotNull)
        .groupBy(col("e1"), col("e2"), col("e3"))
        .agg(count(lit(1)).as("n"))
        .orderBy(col("n").desc, col("e1"), col("e2"), col("e3"))
        .limit(20)
    }),

    // daily-grid resample with LOCF fill: irregular per-user value events
    // onto a dense day grid — terminal observation per (user, day) via a
    // partial-aggregated argmax, per-user span explode (≤30 ticks), one
    // user-keyed window for the fill. NULL values filtered upstream (a
    // null reading is "no observation", not a value to carry).
    "q130_resample_locf" -> ((s, dir) => {
      val ev = Tables.events(s, dir)
        .where(col("value").isNotNull)
        .select(col("user_id"),
          expr("unix_micros(cast(ts as timestamp))").as("ts_us"),
          col("value"), col("event_id"))
      new graft.temporal.Resampler(86400000000L).resample(ev)
        .select(col("user_id"), col("tick"), round(col("value"), 6).as("value"))
    }),

    // nearest-direction as-of join with a 6h tolerance: each click matches
    // its closest purchase by the same user in EITHER direction (ties to
    // backward) — both directional scans ride ONE key shuffle (two window
    // sorts over the same exchange), reconciled row-locally. Right side
    // pre-deduped to one row per (user, ts) so the winner is
    // order-independent.
    "q134_asof_nearest" -> ((s, dir) => {
      val ev = Tables.events(s, dir)
        .select(col("user_id"),
          expr("unix_micros(cast(ts as timestamp))").as("ts_us"),
          col("event_id"), col("event_type"))
      val clicks = ev.where(col("event_type") === "click")
        .select(col("user_id"), col("ts_us"), col("event_id"))
      val purchases = ev.where(col("event_type") === "purchase")
        .groupBy(col("user_id"), col("ts_us").as("r_ts"))
        .agg(min(col("event_id")).as("r_id"))
      new AsOfJoin(Seq("user_id"), "ts_us", "r_ts", "nearest",
        Some(21600000000L)).join(clicks, purchases)
        .select(col("user_id"), col("event_id"), col("ts_us"),
          col("r_id"), col("r_ts"))
    }),

    // per-user interval union: 30-min activity windows around each event
    // merged into non-overlapping islands — true active time without the
    // double-counting a sum of window lengths would give. One keyed
    // shuffle + sort, island rollup partial-aggregated.
    "q135_interval_coverage" -> ((s, dir) => {
      val iv = Tables.events(s, dir)
        .select(col("user_id"),
          expr("unix_micros(cast(ts as timestamp))").as("start_us"))
        .withColumn("end_us", col("start_us") + lit(1800000000L))
      new graft.temporal.IntervalCoverage().coverage(iv)
    }),

    // per-user activity trend: closed-form OLS slope/intercept of value
    // over per-user day offsets (centered at each user's first day — no
    // epoch-magnitude cancellation), from 5 partial-aggregated sums; the
    // formula replays identically in SQL
    "q148_trend" -> ((s, dir) => {
      val ev = Tables.events(s, dir)
        .where(col("value").isNotNull)
        .select(col("user_id"),
          expr("(unix_micros(cast(ts as timestamp))) div 86400000000").as("day"),
          col("value"))
      val d0 = ev.groupBy(col("user_id")).agg(min(col("day")).as("d0"))
      val xy = ev.join(d0, "user_id")
        .select(col("user_id"), (col("day") - col("d0")).cast("double").as("x"),
          col("value").as("y"))
      xy.groupBy(col("user_id"))
        .agg(count(lit(1)).cast("double").as("n"),
          sum(col("x")).as("sx"), sum(col("y")).as("sy"),
          sum(col("x") * col("x")).as("sxx"),
          sum(col("x") * col("y")).as("sxy"))
        .where(col("n") * col("sxx") - col("sx") * col("sx") > 0)
        .select(col("user_id"), col("n").cast("long").as("n"),
          round((col("n") * col("sxy") - col("sx") * col("sy")) /
            (col("n") * col("sxx") - col("sx") * col("sx")), 6).as("slope"))
    }),

    // two-sample Kolmogorov–Smirnov: D = max |F_click − F_view| over the
    // pooled distinct values. Cumulatives ride the two-phase PrefixSum
    // (never a global window — PlanGuard-legal); each |ΔF| is exact
    // rational arithmetic per row, so no rounding tolerance is needed
    "q150_ks_test" -> ((s, dir) => {
      val ev = Tables.events(s, dir).where(col("value").isNotNull)
      val byV = ev.where(col("event_type").isin("click", "view"))
        .groupBy(col("value"))
        .agg(sum(when(col("event_type") === "click", 1L).otherwise(0L)).as("c1"),
          sum(when(col("event_type") === "view", 1L).otherwise(0L)).as("c2"))
      val withCum = graft.sql.PrefixSum.exclusive(
        graft.sql.PrefixSum.exclusive(byV, "value", "c1", "p1"),
        "value", "c2", "p2")
        .select(col("value"),
          (col("p1") + col("c1")).as("f1"), (col("p2") + col("c2")).as("f2"))
      val tot = byV.agg(sum(col("c1")).cast("double").as("n1"),
        sum(col("c2")).cast("double").as("n2"))
      val d = withCum.crossJoin(broadcast(tot))
        .select(col("value"),
          abs(col("f1") / col("n1") - col("f2") / col("n2")).as("dv"),
          col("n1"), col("n2"))
      d.agg(max(struct(col("dv"), col("value"))).as("m"),
          max(col("n1").cast("long")).as("n1"),
          max(col("n2").cast("long")).as("n2"))
        .select(col("m.dv").as("d_stat"), col("m.value").as("at_value"),
          col("n1"), col("n2"))
    }),

    // last-touch attribution: each purchase's value credits the most
    // recent prior click by the same user within a 24h window (backward
    // as-of join — one keyed shuffle), rolled up per attribution day;
    // unattributed purchases land in an explicit bucket instead of
    // silently vanishing
    "q159_attribution" -> ((s, dir) => {
      val ev = Tables.events(s, dir)
        .select(col("user_id"),
          expr("unix_micros(cast(ts as timestamp))").as("ts_us"),
          col("event_id"), col("event_type"), col("value"))
      val purchases = ev.where(col("event_type") === "purchase")
        .select(col("user_id"), col("ts_us"), col("event_id"), col("value"))
      val clicks = ev.where(col("event_type") === "click")
        .groupBy(col("user_id"), col("ts_us").as("c_ts"))
        .agg(min(col("event_id")).as("c_id"))
      new AsOfJoin(Seq("user_id"), "ts_us", "c_ts", "backward",
        Some(86400000000L)).join(purchases, clicks)
        .select(
          when(col("c_id").isNotNull,
            expr("c_ts div 86400000000")).otherwise(lit(-1L)).as("attr_day"),
          col("value"))
        .groupBy(col("attr_day"))
        .agg(count(lit(1)).as("n_purchases"),
          round(sum(coalesce(col("value"), lit(0.0))), 6).as("revenue"))
    }),

    // Poisson-bootstrap CI of the per-type mean value (Chamandy et al.
    // 2012): 32 deterministic md5-coin replicate weights per row (the
    // Poisson(1) inverse CDF as integer threshold compares — literals
    // shared verbatim with the oracle), one single-scan aggregation with
    // the point estimate riding as the weight-1 identity replicate,
    // percentile-method 95% interval over the replicate means
    "q186_bootstrap_ci" -> ((s, dir) => {
      graft.stats.Bootstrap.meanCI(
        Tables.events(s, dir).where(col("value").isNotNull),
        "event_type", "value", "event_id", replicates = 32, alpha = 0.05)
        .select(col("event_type"), col("n"), round(col("mean"), 6).as("mean"),
          round(col("ci_lo"), 6).as("ci_lo"), round(col("ci_hi"), 6).as("ci_hi"))
    }),

    // Poisson-bootstrap CI for a RATIO-OF-SUMS metric (revenue per unit:
    // sum(extendedprice·(1−discount)) / sum(quantity) per return flag) —
    // the Chamandy paper's production shape, where both sums reweight
    // with the SAME per-row Poisson coin so within-row correlation is
    // carried for free. Same single-scan fan-out and integer-threshold
    // coin discipline as q186.
    "q190_bootstrap_ratio" -> ((s, dir) => {
      val li = Tables.lineitem(s, dir)
        .select(col("l_returnflag"),
          (col("l_extendedprice") * (lit(1.0) - col("l_discount"))).as("rev"),
          col("l_quantity").as("qty"),
          concat(col("l_orderkey").cast("string"), lit(":"),
            col("l_linenumber").cast("string")).as("rid"))
      graft.stats.Bootstrap.ratioCI(li, "l_returnflag", "rev", "qty", "rid",
        replicates = 32, alpha = 0.05)
        .select(col("l_returnflag"), col("n"), round(col("ratio"), 6).as("ratio"),
          round(col("ci_lo"), 6).as("ci_lo"), round(col("ci_hi"), 6).as("ci_hi"))
    }),

    // EXACT type-1 quantiles (rank ceil(q·n)) by iterative histogram
    // narrowing — distributed selection, no global sort; the answer is an
    // actual data element so the oracle is DuckDB's own quantile_disc
    // with no estimator replay. maxFinal=2000 forces the narrowing loop
    // to actually run at every SF (sf0.1's 600k rows take 2 levels)
    "q192_exact_quantiles" -> ((s, dir) => {
      val qs = Seq(0.5, 0.9, 0.99, 0.999)
      val got = graft.stats.ExactQuantile.compute(
        Tables.lineitem(s, dir), "l_extendedprice", qs,
        numBuckets = 64, maxFinal = 2000L)
      import s.implicits._
      qs.flatMap(q => got(q).map(v => (q, v))).toDF("q", "value")
    }),

    // hash-randomized A/B readout: users split 50/50 by the deterministic
    // md5 coin, per-arm conversion (any purchase) rates plus the 2×2
    // chi-squared statistic — the full experimentation loop (assignment,
    // exposure, outcome, test) as one declarative plan
    "q160_ab_test" -> ((s, dir) => {
      val ev = Tables.events(s, dir)
      val users = ev.select(col("user_id")).distinct()
        .withColumn("arm",
          when(graft.sql.functions.uniform32("ab", col("user_id")) % 2 === 0,
            "A").otherwise("B"))
      // conversion = a purchase of at least 150 (~45% of users at every
      // SF — plain "any purchase" saturates to 100% and the chi2
      // expecteds degenerate to a zero divisor)
      val conv = ev.where(col("event_type") === "purchase" &&
          col("value") >= 150.0)
        .select(col("user_id")).distinct().withColumn("converted", lit(1L))
      val cells = users.join(conv, Seq("user_id"), "left")
        .withColumn("converted", coalesce(col("converted"), lit(0L)))
        .groupBy(col("arm"))
        .agg(count(lit(1)).as("n"), sum(col("converted")).as("n_conv"))
      val tot = cells.agg(sum(col("n")).cast("double").as("tn"),
        sum(col("n_conv")).cast("double").as("tc"))
      // chi2 over the 2x2 (converted / not) with margin-derived expecteds
      val terms = cells.crossJoin(broadcast(tot))
        .withColumn("e1", col("n").cast("double") * col("tc") / col("tn"))
        .withColumn("e0",
          col("n").cast("double") * (col("tn") - col("tc")) / col("tn"))
        .withColumn("chi_part",
          (col("n_conv") - col("e1")) * (col("n_conv") - col("e1")) / col("e1")
            + ((col("n") - col("n_conv")) - col("e0"))
            * ((col("n") - col("n_conv")) - col("e0")) / col("e0"))
      val chi = terms.agg(round(sum(col("chi_part")), 6).as("chi2"))
      terms.select(col("arm"), col("n"), col("n_conv"),
          round(col("n_conv").cast("double") / col("n"), 9).as("conv_rate"))
        .crossJoin(broadcast(chi))
    }),

    // weekday seasonality profile: per day-of-week event counts, mean
    // value, and traffic share — the weekly-cycle companion to q156's
    // ACF (epoch day 0 = Thursday, so dow = (day + 4) % 7 with 0=Sunday)
    "q158_weekday_profile" -> ((s, dir) => {
      val ev = Tables.events(s, dir)
        .select(pmod(expr(
          "(unix_micros(cast(ts as timestamp))) div 86400000000") + 4, lit(7))
          .cast("int").as("dow"), col("value"))
      val tot = ev.agg(count(lit(1)).cast("double").as("tot"))
      ev.groupBy(col("dow"))
        .agg(count(lit(1)).as("n"),
          round(avg(col("value")), 6).as("avg_value"))
        .crossJoin(broadcast(tot))
        .select(col("dow"), col("n"),
          col("avg_value"),
          round(col("n").cast("double") / col("tot"), 9).as("share"))
    }),

    // autocorrelation of the corpus's daily mean-value series at lags
    // 0..7: the heavy lifting (per-day means) is one partial-aggregated
    // pass over the stream; the lag correlations are closed-form sums
    // over the tiny (day, day+lag) self-join
    "q156_acf" -> ((s, dir) => {
      val series = Tables.events(s, dir).where(col("value").isNotNull)
        .select(expr("(unix_micros(cast(ts as timestamp))) div 86400000000")
          .as("day"), col("value"))
        .groupBy(col("day")).agg(avg(col("value")).as("m"))
      val lags = broadcast(s.range(0, 8).select(col("id").as("lag")))
      val pairs = series.crossJoin(lags)
        .join(broadcast(series.select(col("day").as("bd"), col("m").as("mb"))),
          col("bd") === col("day") + col("lag"))
      pairs.groupBy(col("lag"))
        .agg(count(lit(1)).cast("double").as("n"),
          sum(col("m")).as("sa"), sum(col("mb")).as("sb"),
          sum(col("m") * col("m")).as("saa"),
          sum(col("mb") * col("mb")).as("sbb"),
          sum(col("m") * col("mb")).as("sab"))
        .select(col("lag"), col("n").cast("long").as("n"),
          round((col("n") * col("sab") - col("sa") * col("sb")) /
            sqrt((col("n") * col("saa") - col("sa") * col("sa")) *
              (col("n") * col("sbb") - col("sb") * col("sb"))), 6).as("acf"))
    }),

    // Theil–Sen robust trend: median of pairwise slopes per user — the
    // outlier-proof companion to q148's OLS. The pairwise self-join is
    // keyed by user and bounded by per-key observation count (the
    // documented robust-stats cost: O(n_k²) WITHIN each key, never
    // across keys); exact interpolated median replays in quantile_cont
    "q154_theilsen" -> ((s, dir) => {
      val ev = Tables.events(s, dir).where(col("value").isNotNull)
        .select(col("user_id"),
          expr("(unix_micros(cast(ts as timestamp))) div 86400000000")
            .cast("double").as("x"),
          col("value").as("y"), col("event_id"))
      // the b side is RENAMED before the join, not merely aliased: with
      // bare `.as("a")`/`.as("b")` both join Columns resolve to the same
      // attribute id and Spark falls back to its self-join disambiguation
      // heuristic (the "trivially true equals predicate" warning in every
      // bench tail) — correctness should never ride on that heuristic
      val b = ev.select(col("user_id").as("user_id_b"),
        col("x").as("xb"), col("y").as("yb"))
      val slopes = ev.join(b,
          col("user_id") === col("user_id_b") && col("x") < col("xb"))
        .select(col("user_id"),
          ((col("yb") - col("y")) / (col("xb") - col("x"))).as("slope"))
      slopes.groupBy(col("user_id"))
        .agg(count(lit(1)).as("n_pairs"),
          round(expr("percentile(slope, 0.5)"), 6).as("ts_slope"))
    }),

    // Mann–Whitney U (rank-sum): midranks from per-value counts + the
    // two-phase PrefixSum (cumBefore + (cnt+1)/2 — exact halves, no
    // float accumulation risk), U and the rank-biserial effect size in
    // closed form. The nonparametric "are clicks' values larger than
    // views'" answer, tie-correct
    "q151_mannwhitney" -> ((s, dir) => {
      val ev = Tables.events(s, dir).where(col("value").isNotNull)
      val byV = ev.where(col("event_type").isin("click", "view"))
        .groupBy(col("value"))
        .agg(sum(when(col("event_type") === "click", 1L).otherwise(0L)).as("c1"),
          sum(when(col("event_type") === "view", 1L).otherwise(0L)).as("c2"))
        .withColumn("cnt", col("c1") + col("c2"))
      val ranked = graft.sql.PrefixSum.exclusive(byV, "value", "cnt", "cb")
        .withColumn("midrank",
          col("cb").cast("double") + (col("cnt") + 1).cast("double") / 2.0)
      val agg = ranked.agg(
        sum(col("c1")).cast("double").as("n1"),
        sum(col("c2")).cast("double").as("n2"),
        sum(col("c1").cast("double") * col("midrank")).as("r1"))
      agg.select(
        (col("r1") - col("n1") * (col("n1") + 1.0) / 2.0).as("u1"),
        col("n1").cast("long").as("n1"), col("n2").cast("long").as("n2"))
        .withColumn("rank_biserial",
          round(lit(2.0) * col("u1") / (col("n1") * col("n2")) - 1.0, 6))
    }),

    // Spearman rank correlation (value vs activity day): midrank maps per
    // column from per-value counts + PrefixSum, joined back row-locally,
    // then closed-form Pearson on the ranks — every sum is exact
    // (half-integer ranks), so the statistic replays bit-for-bit
    "q152_spearman" -> ((s, dir) => {
      val ev = Tables.events(s, dir).where(col("value").isNotNull)
        .select(expr("(unix_micros(cast(ts as timestamp))) div 86400000000")
          .as("day"), col("value"))
      def midranks(keyCol: String): DataFrame = {
        val byK = ev.groupBy(col(keyCol)).agg(count(lit(1)).as("cnt"))
        graft.sql.PrefixSum.exclusive(byK, keyCol, "cnt", "cb")
          .select(col(keyCol),
            (col("cb").cast("double") + (col("cnt") + 1).cast("double") / 2.0)
              .as(s"r_$keyCol"))
      }
      val ranked = ev.join(midranks("day"), "day")
        .join(midranks("value"), "value")
      ranked.agg(count(lit(1)).cast("double").as("n"),
          sum(col("r_day")).as("sx"), sum(col("r_value")).as("sy"),
          sum(col("r_day") * col("r_day")).as("sxx"),
          sum(col("r_value") * col("r_value")).as("syy"),
          sum(col("r_day") * col("r_value")).as("sxy"))
        .select(col("n").cast("long").as("n"),
          round((col("n") * col("sxy") - col("sx") * col("sy")) /
            sqrt((col("n") * col("sxx") - col("sx") * col("sx")) *
              (col("n") * col("syy") - col("sy") * col("sy"))), 6).as("rho"))
    }),

    // Kaplan–Meier retention: per-user activity lifetimes right-censored
    // at the observation horizon (users still active in the final days
    // leave the risk set without counting as churn); everything reduces
    // to one row per distinct event time, cumulated via broadcast
    // triangle joins — no global window, PlanGuard-legal
    "q147_survival" -> ((s, dir) => {
      val days = Tables.events(s, dir).select(col("user_id"),
        expr("(unix_micros(cast(ts as timestamp))) div 86400000000").as("day"))
      val span = days.groupBy(col("user_id"))
        .agg(min(col("day")).as("d0"), max(col("day")).as("d1"))
      val horizon = days.agg(max(col("day")).as("h"))
      val subjects = span.crossJoin(broadcast(horizon))
        .select((col("d1") - col("d0")).as("duration"),
          (col("d1") < col("h") - 2).as("event"))
      new graft.temporal.KaplanMeier().survival(subjects)
        .select(col("t"), col("n_risk"), col("d"),
          round(col("survival"), 6).as("survival"))
    }),

    // funnel step-latency distributions: per consecutive stage pair, the
    // count/median/p90/mean of conversion time — Funnel.stageTimes (a
    // chain of keyed conditional-min aggs, no windows) stacked long and
    // re-aggregated; exact interpolated percentiles replay in DuckDB's
    // quantile_cont
    "q142_funnel_latency" -> ((s, dir) => {
      val ev = Tables.events(s, dir).select(col("user_id"), col("event_type"),
        expr("unix_micros(cast(ts as timestamp))").as("ts_us"))
      val st = new Funnel(Seq("signup", "view", "click", "purchase"))
        .stageTimes(ev)
      val deltas = Seq(("signup", "view"), ("view", "click"),
        ("click", "purchase")).map { case (a, b) =>
        st.select(lit(s"${a}_to_${b}").as("step"),
          (col(s"t_$b") - col(s"t_$a")).as("delta"))
          .where(col("delta").isNotNull)
      }.reduce(_ unionByName _)
      deltas.groupBy(col("step"))
        .agg(count(lit(1)).as("n"),
          round(expr("percentile(delta, 0.5)"), 6).as("p50"),
          round(expr("percentile(delta, 0.9)"), 6).as("p90"),
          round(avg(col("delta")), 6).as("avg_delta"))
    }),

    // 7-day sliding per-user activity estimates from MERGED day CMS
    // sketches — the frequency companion to q137's sliding HLL: one CMS
    // per day (raw stream scanned once), each trailing window an
    // element-wise SUM of ≤7 sketches, probed for a fixed user set. The
    // oracle rebuilds every window's buckets directly from rows, pinning
    // the linear merge.
    "q155_sliding_cms" -> ((s, dir) => {
      val d = 4; val w = 1024
      val days = Tables.events(s, dir)
        .select(expr("(unix_micros(cast(ts as timestamp))) div 86400000000")
          .as("day"), col("user_id"))
        .groupBy(col("day"))
        .agg(graft.sql.functions.countMinSketch(
          col("user_id").cast("string"), d, w).as("sk"))
      val mx = days.agg(max(col("day")).as("mx"))
      val wins = days
        .select(col("day"), col("sk"),
          explode(sequence(col("day"), col("day") + 6)).as("win"))
        .crossJoin(broadcast(mx)).where(col("win") <= col("mx"))
        .groupBy(col("win"))
        .agg(graft.sql.functions.cmsMerge(col("sk"), d, w).as("sk"),
          count(lit(1)).as("n_days"))
      val probeDf = broadcast(s.createDataFrame(
        (1 to 10).map(i => Tuple1(i * 15L))).toDF("probe_user"))
      wins.crossJoin(probeDf)
        .select(col("win").as("day"), col("n_days"), col("probe_user"),
          graft.sql.functions.cmsEstimate(col("sk"),
            col("probe_user").cast("string"), d, w).as("est_events"))
    }),

    // 7-day trailing distinct users from MERGED day sketches: the raw
    // stream is scanned ONCE (one HLL register array per day); every
    // sliding window is a merge of ≤7 tiny sketches — the sliding-window
    // answer to count(DISTINCT) that never rescans history. The oracle
    // recomputes each window's sketch directly from the rows, so the hash
    // pins merge == direct per window.
    "q137_sliding_distinct" -> ((s, dir) => {
      val p = 10
      val days = Tables.events(s, dir)
        .select(expr("(unix_micros(cast(ts as timestamp))) div 86400000000")
          .as("day"), col("user_id"))
        .groupBy(col("day"))
        .agg(graft.sql.functions.hllSketch(
          col("user_id").cast("string"), p).as("regs"))
      val mx = days.agg(max(col("day")).as("mx"))
      days
        .select(col("day"), col("regs"),
          explode(sequence(col("day"), col("day") + 6)).as("win"))
        .crossJoin(broadcast(mx)).where(col("win") <= col("mx"))
        .groupBy(col("win"))
        .agg(graft.sql.functions.hllMerge(col("regs"), p).as("regs"),
          count(lit(1)).as("n_days"))
        .select(col("win").as("day"), col("n_days"),
          round(graft.sql.functions.hllEstimate(col("regs"), p), 6)
            .as("est_users"))
    }),

    // CUPED variance-reduced A/B readout (Deng et al. WSDM'13): per-user
    // pre-period (days 1-14) spend is the covariate, post-period spend
    // the metric, arms split by the deterministic md5 coin. Everything
    // reduces to per-arm moment sums; theta/x-bar pooled across arms.
    // The adjusted metric's variance contracts while its mean moves only
    // by the (finite-sample) covariate imbalance — the full WSDM'13 loop
    // as one declarative plan.
    "q196_cuped" -> ((s, dir) => {
      val ev = Tables.events(s, dir).where(col("value").isNotNull)
      val split = lit("2024-01-15").cast("timestamp")
      val units = ev.groupBy(col("user_id")).agg(
        sum(when(col("ts") < split, col("value")).otherwise(lit(0.0))).as("x"),
        sum(when(col("ts") >= split, col("value")).otherwise(lit(0.0))).as("y"))
        .withColumn("variant",
          when(graft.sql.functions.uniform32("ab", col("user_id")) % 2 === 0,
            "A").otherwise("B"))
      graft.stats.Cuped.adjust(units, "variant", "x", "y")
        .select(col("variant"), col("n"),
          round(col("mean_y"), 6).as("mean_y"),
          round(col("mean_y_cuped"), 6).as("mean_y_cuped"),
          round(col("var_y"), 4).as("var_y"),
          round(col("var_y_cuped"), 4).as("var_y_cuped"),
          round(col("theta"), 9).as("theta"))
    }),

    // delete-one-bucket jackknife SE for the per-event-type mean value,
    // clustered by USER (20 md5-coin buckets): the closed-form companion
    // to q186's bootstrap — B leave-one-out ratios from per-bucket sums,
    // no resampling. Cluster-robust because whole users leave together.
    "q198_jackknife" -> ((s, dir) => {
      val ev = Tables.events(s, dir).where(col("value").isNotNull)
      graft.stats.Jackknife.ratioCI(
        ev, Seq("event_type"), col("value"), lit(1.0),
        graft.sql.functions.uniform32("jk", col("user_id")) % 20)
        .select(col("event_type"),
          round(col("theta"), 6).as("theta"),
          round(col("se_jack"), 9).as("se_jack"),
          round(col("ci_lo"), 6).as("ci_lo"),
          round(col("ci_hi"), 6).as("ci_hi"),
          col("n_buckets"))
    }),

    // EXACT 7-day trailing distinct users per day — the ground-truth
    // companion to q137's HLL estimate, via contribution fan-out (each
    // distinct (user, day) pair explodes to its <= 7 window-end days;
    // nothing rescans history, nothing sorts globally). Integer-only.
    "q199_sliding_distinct_exact" -> ((s, dir) =>
      graft.temporal.SlidingDistinct.perDay(
        Tables.events(s, dir),
        expr("(unix_micros(cast(ts as timestamp))) div 86400000000"),
        col("user_id"), 7))
,
    // isotonic calibration of P(purchase | spend score) via distributed
    // PAV on a quantized 3-decimal score grid. The oracle replays the
    // MINIMAX characterization f(i) = max_{j<=i} min_{k>=i} mean(j..k)
    // — a completely different algorithm agreeing only if the fit is the
    // true isotonic solution. Binary labels -> integer sums -> the block
    // structure is exact and partition-count-proof; float enters at the
    // final division only.
    "q200_isotonic" -> ((s, dir) => {
      val pts = Tables.events(s, dir).where(col("value").isNotNull)
        .select(round(col("value") / 500.0, 3).as("x"),
          when(col("event_type") === "purchase", 1.0).otherwise(0.0).as("y"))
      new graft.stats.IsotonicRegression(32).fit(pts, "x", "y")
        .select(col("x"), round(col("fitted"), 9).as("fitted"),
          col("w").cast("long").as("w"))
    }),

    // market-basket association over (user, day) baskets of event types:
    // pairwise support / lift / both conditional confidences — "which
    // behaviors co-occur beyond chance", the classic basket analysis as
    // one self-join + three integer-count ratios. Baskets are distinct
    // (user, day, type) triples; all metrics are ratios of exact counts.
    "q204_basket_lift" -> ((s, dir) => {
      val b = Tables.events(s, dir)
        .select(col("user_id").as("u"),
          expr("(unix_micros(cast(ts as timestamp))) div 86400000000").as("day"),
          col("event_type").as("et"))
        .distinct()
      val rhs = b.select(col("u").as("u2"), col("day").as("day2"),
        col("et").as("et2"))
      val pairs = b
        .join(rhs, col("u") === col("u2") && col("day") === col("day2") &&
          col("et") < col("et2"))
        .groupBy(col("et").as("et_a"), col("et2").as("et_b"))
        .agg(count(lit(1)).as("n_ab"))
      val singles = b.groupBy(col("et")).agg(count(lit(1)).as("n1"))
      val nb = b.select(col("u"), col("day")).distinct()
        .agg(count(lit(1)).as("nb"))
      pairs
        .join(singles.select(col("et").as("et_a"), col("n1").as("na")), "et_a")
        .join(singles.select(col("et").as("et_b"), col("n1").as("nb_")), "et_b")
        .crossJoin(broadcast(nb))
        .select(col("et_a"), col("et_b"), col("n_ab"),
          round(col("n_ab").cast("double") / col("nb"), 6).as("support"),
          round(col("n_ab").cast("double") * col("nb")
            / (col("na") * col("nb_")), 6).as("lift"),
          round(col("n_ab").cast("double") / col("na"), 6).as("conf_ab"),
          round(col("n_ab").cast("double") / col("nb_"), 6).as("conf_ba"))
    }),

    // offline CUSUM change-point per event type over the rounded daily
    // revenue series: where does the running mass diverge most from a
    // flat mean — the "when did this source change level" monitor. All
    // sums are ordered window folds (bit-stable across engines); |S_k|
    // is rounded to the 1e-6 grid before the argmax (earliest-day ties).
    "q205_changepoint" -> ((s, dir) => {
      val daily = Tables.events(s, dir).where(col("value").isNotNull)
        .groupBy(col("event_type"),
          expr("(unix_micros(cast(ts as timestamp))) div 86400000000").as("day"))
        .agg(round(sum(col("value")), 6).as("x"))
      graft.temporal.ChangePoint.detect(
        daily, Seq("event_type"), col("day"), col("x"))
    }),

    // RFM segmentation: per-user recency / frequency / monetary with
    // exact quintile scores from TWO-PHASE global ranks (GroupedNtile —
    // never a one-task global sort; the oracle's row_number() over the
    // (metric, user) total order is identical by construction). Monetary
    // is rounded BEFORE ranking so float-sum drift cannot flip an order.
    "q208_rfm" -> ((s, dir) => {
      val day = expr("(unix_micros(cast(ts as timestamp))) div 86400000000")
      val ev = Tables.events(s, dir)
      val gmax = broadcast(ev.agg(max(day).as("gmax")))
      val users = ev
        .groupBy(col("user_id"))
        .agg(max(day).as("umax"), count(lit(1)).as("f"),
          round(sum(coalesce(col("value"), lit(0.0))), 6).as("m"))
        .crossJoin(gmax)
        .withColumn("r", col("gmax") - col("umax"))
        .withColumn("__g", lit("all"))
      val ranked = Seq(
        ("r", false, "r_rnk"), ("f", true, "f_rnk"), ("m", true, "m_rnk"))
        .foldLeft(users) { case (df, (c, desc, nm)) =>
          graft.sql.GroupedNtile.rankByValue(
            df, "__g", c, descending = desc,
            tieCols = Seq(col("user_id")), rankName = nm)
        }
      val nu = broadcast(users.agg(count(lit(1)).as("nu")))
      ranked.crossJoin(nu)
        .select(col("user_id"), col("r").as("recency"), col("f").as("freq"),
          col("m").as("monetary"),
          expr("CAST((r_rnk - 1) * 5 DIV nu AS INT) + 1").as("r_score"),
          expr("CAST((f_rnk - 1) * 5 DIV nu AS INT) + 1").as("f_score"),
          expr("CAST((m_rnk - 1) * 5 DIV nu AS INT) + 1").as("m_score"))
        .withColumn("segment", concat(
          col("r_score").cast("string"), col("f_score").cast("string"),
          col("m_score").cast("string")))
    })
  )

  val oracles: Map[String, String] = Map(
    "q44_asof_join" ->
      """WITH l AS (
        |  SELECT event_id, user_id, epoch_us(ts) AS ts_us
        |  FROM events WHERE event_type = 'click'
        |), r AS (
        |  SELECT event_id AS view_id, user_id, epoch_us(ts) AS view_ts_us
        |  FROM events WHERE event_type = 'view'
        |)
        |SELECT l.event_id, l.user_id, l.ts_us, r.view_id, r.view_ts_us
        |FROM l ASOF LEFT JOIN r
        |  ON l.user_id = r.user_id AND l.ts_us >= r.view_ts_us""".stripMargin,
    "q47_range_join" ->
      """WITH c AS (
        |  SELECT event_id AS click_id, user_id, epoch_us(ts) AS cu
        |  FROM events WHERE event_type = 'click'
        |), p AS (
        |  SELECT event_id AS purchase_id, user_id, epoch_us(ts) AS pu
        |  FROM events WHERE event_type = 'purchase'
        |)
        |SELECT c.user_id AS user_id, click_id, purchase_id
        |FROM c JOIN p ON c.user_id = p.user_id
        |  AND c.cu BETWEEN p.pu - 1800000000 AND p.pu""".stripMargin,
    "q57_funnel" ->
      """WITH e AS (
        |  SELECT user_id, event_type, epoch_us(ts) AS tu FROM events
        |), s0 AS (
        |  SELECT user_id, min(CASE WHEN event_type = 'signup' THEN tu END) AS t0
        |  FROM e GROUP BY 1 HAVING t0 IS NOT NULL
        |), s1 AS (
        |  SELECT e.user_id, min(t0) AS t0,
        |    min(CASE WHEN event_type = 'view' AND tu > t0 THEN tu END) AS t1
        |  FROM e JOIN s0 USING (user_id) GROUP BY e.user_id
        |), s2 AS (
        |  SELECT e.user_id, min(t0) AS t0, min(t1) AS t1,
        |    min(CASE WHEN event_type = 'click' AND tu > t1 THEN tu END) AS t2
        |  FROM e JOIN s1 USING (user_id) GROUP BY e.user_id
        |), s3 AS (
        |  SELECT e.user_id, min(t0) AS t0, min(t1) AS t1, min(t2) AS t2,
        |    min(CASE WHEN event_type = 'purchase' AND tu > t2 THEN tu END) AS t3
        |  FROM e JOIN s2 USING (user_id) GROUP BY e.user_id
        |)
        |SELECT count(t0) AS n_signup, count(t1) AS n_view,
        |  count(t2) AS n_click, count(t3) AS n_purchase
        |FROM s3""".stripMargin,
    "q62_retention" ->
      """WITH e AS (
        |  SELECT user_id, epoch_us(ts) // 86400000000 AS day FROM events
        |), c AS (
        |  SELECT user_id, min(day) AS cohort_day FROM e GROUP BY 1
        |), a AS (
        |  SELECT DISTINCT user_id, day FROM e
        |)
        |SELECT cohort_day, day - cohort_day AS offset_days,
        |  count(DISTINCT a.user_id) AS n_users
        |FROM a JOIN c USING (user_id)
        |GROUP BY 1, 2""".stripMargin,
    "q63_transitions" ->
      """WITH e AS (
        |  SELECT user_id, event_id, event_type, epoch_us(ts) AS tu FROM events
        |), n AS (
        |  SELECT event_type,
        |    lead(event_type) OVER (PARTITION BY user_id ORDER BY tu, event_id)
        |      AS next_type
        |  FROM e
        |)
        |SELECT event_type, next_type, count(*) AS n
        |FROM n WHERE next_type IS NOT NULL
        |GROUP BY 1, 2""".stripMargin,
    "q75_zorder" ->
      """WITH d AS (
        |  SELECT user_id % 1024 AS x,
        |    (epoch_us(ts) // 3600000000) % 1024 AS y
        |  FROM events
        |), z AS (
        |  SELECT x, y,
        |    (SELECT CAST(sum(((x >> CAST(i AS INT)) & 1) << CAST(2*i AS INT))
        |          + sum(((y >> CAST(i AS INT)) & 1) << CAST(2*i+1 AS INT)) AS BIGINT)
        |     FROM range(0, 10) t(i)) AS zv
        |  FROM d
        |)
        |SELECT zv // 4096 AS z_bucket, count(*) AS n,
        |  min(x) AS min_x, max(x) AS max_x,
        |  min(y) AS min_y, max(y) AS max_y
        |FROM z GROUP BY 1""".stripMargin,
    // the segmented two-phase plan replayed op-for-op: the same ADAPTIVE
    // integer range-bucket formula (B_k = least(1024, ceil(n/8192)) — a
    // normal key is ONE segment and exactly sequential), a per-segment
    // recursive fold of the affine summary (a_c, b_c, s_c) in the
    // engine's exact expression order (seed = lambda applied to the
    // engine's (0.0, 1.0, NULL) init), the carry chain over segments in
    // bucket order, and the within-segment re-fold seeded at the carry.
    // Both constants exactly representable, so no cross-engine drift.
    // The CASE mirrors the engine's null handling: a null observation
    // emits the running ewma unchanged instead of poisoning later steps
    "q127_ewma" ->
      """WITH RECURSIVE base AS (
        |  SELECT user_id, event_id, value, epoch_us(ts) AS o FROM events
        |), span AS (
        |  SELECT user_id, min(o) AS omin, max(o) AS omax,
        |    least(1024, (count(*) + 8191) // 8192) AS bk
        |  FROM base GROUP BY 1
        |), evr AS (
        |  SELECT b.user_id, b.event_id, b.value, b.o,
        |    ((b.o - s.omin) // ((s.omax - s.omin + s.bk) // s.bk)) AS bkt,
        |    row_number() OVER (
        |      PARTITION BY b.user_id,
        |        ((b.o - s.omin) // ((s.omax - s.omin + s.bk) // s.bk))
        |      ORDER BY b.o, b.event_id) AS rn
        |  FROM base b JOIN span s USING (user_id)
        |), summ(user_id, bkt, rn, a_c, b_c, s_c) AS (
        |  SELECT user_id, bkt, rn,
        |    CASE WHEN value IS NULL THEN CAST(0.0 AS DOUBLE)
        |         ELSE 0.25 * value + 0.75 * CAST(0.0 AS DOUBLE) END,
        |    -- anchor types fix the recursion's column types: a DECIMAL
        |    -- literal product here would round b_c to scale 3 every step
        |    CASE WHEN value IS NULL THEN CAST(1.0 AS DOUBLE)
        |         ELSE 0.75 * CAST(1.0 AS DOUBLE) END,
        |    value
        |  FROM evr WHERE rn = 1
        |  UNION ALL
        |  SELECT e.user_id, e.bkt, e.rn,
        |    CASE WHEN e.value IS NULL THEN summ.a_c
        |         ELSE 0.25 * e.value + 0.75 * summ.a_c END,
        |    CASE WHEN e.value IS NULL THEN summ.b_c ELSE 0.75 * summ.b_c END,
        |    CASE WHEN e.value IS NULL THEN summ.s_c
        |         WHEN summ.s_c IS NULL THEN e.value
        |         ELSE 0.25 * e.value + 0.75 * summ.s_c END
        |  FROM summ JOIN evr e ON e.user_id = summ.user_id
        |    AND e.bkt = summ.bkt AND e.rn = summ.rn + 1
        |), segf AS (
        |  SELECT user_id, bkt, a_c, b_c, s_c,
        |    row_number() OVER (PARTITION BY user_id ORDER BY bkt) AS sn
        |  FROM (SELECT *, row_number() OVER (PARTITION BY user_id, bkt
        |                                     ORDER BY rn DESC) AS rr
        |        FROM summ)
        |  WHERE rr = 1
        |), carry(user_id, bkt, sn, cin, prev) AS (
        |  SELECT user_id, bkt, sn, CAST(NULL AS DOUBLE), s_c
        |  FROM segf WHERE sn = 1
        |  UNION ALL
        |  SELECT s.user_id, s.bkt, s.sn, carry.prev,
        |    CASE WHEN carry.prev IS NULL THEN s.s_c
        |         ELSE s.b_c * carry.prev + s.a_c END
        |  FROM carry JOIN segf s ON s.user_id = carry.user_id
        |    AND s.sn = carry.sn + 1
        |), rec(user_id, event_id, value, bkt, rn, ewma) AS (
        |  SELECT e.user_id, e.event_id, e.value, e.bkt, e.rn,
        |    CASE WHEN e.value IS NULL THEN c.cin
        |         WHEN c.cin IS NULL THEN e.value
        |         ELSE 0.25 * e.value + 0.75 * c.cin END
        |  FROM evr e JOIN carry c ON c.user_id = e.user_id AND c.bkt = e.bkt
        |  WHERE e.rn = 1
        |  UNION ALL
        |  SELECT e.user_id, e.event_id, e.value, e.bkt, e.rn,
        |    CASE WHEN e.value IS NULL THEN rec.ewma
        |         WHEN rec.ewma IS NULL THEN e.value
        |         ELSE 0.25 * e.value + 0.75 * rec.ewma END
        |  FROM rec JOIN evr e ON e.user_id = rec.user_id
        |    AND e.bkt = rec.bkt AND e.rn = rec.rn + 1
        |)
        |SELECT user_id, event_id, value, ewma
        |FROM rec""".stripMargin,

    // DuckDB's native ASOF join replays the forward match (the single
    // inequality flipped to <=); tolerance as a post-CASE null-out is
    // equivalent because ASOF already picked the MINIMAL gap — if it
    // exceeds the bound, no other row qualifies either. Right side
    // deduped to one row per (user, ts) in both engines.
    "q170_asof_sql_fwd" ->
      """WITH v AS (
        |  SELECT event_id, user_id, epoch_us(ts) AS ts_us
        |  FROM events WHERE event_type = 'view'
        |), p AS (
        |  SELECT user_id, epoch_us(ts) AS p_ts_us, min(event_id) AS p_id
        |  FROM events WHERE event_type = 'purchase' GROUP BY 1, 2
        |)
        |SELECT v.event_id, v.user_id, v.ts_us,
        |  CASE WHEN p.p_ts_us - v.ts_us <= 86400000000 THEN p.p_id END AS p_id,
        |  CASE WHEN p.p_ts_us - v.ts_us <= 86400000000 THEN p.p_ts_us END AS p_ts_us
        |FROM v ASOF LEFT JOIN p
        |  ON v.user_id = p.user_id AND v.ts_us <= p.p_ts_us""".stripMargin,
    "q171_range_sql" ->
      """WITH v AS (
        |  SELECT event_id AS view_id, user_id, epoch_us(ts) AS v_us
        |  FROM events WHERE event_type = 'view'
        |), p AS (
        |  SELECT event_id AS p_id, user_id, epoch_us(ts) AS start_us,
        |    epoch_us(ts) + 7200000000 AS end_us
        |  FROM events WHERE event_type = 'purchase'
        |)
        |SELECT v.user_id, view_id, v_us, p_id, start_us, end_us
        |FROM v JOIN p ON v.user_id = p.user_id
        |  AND v.v_us BETWEEN p.start_us AND p.end_us""".stripMargin,

    // composite-key ASOF: DuckDB carries the extra equality key directly
    // in the ASOF ON clause; backward match is the >= inequality
    "q173_asof_sql_multikey" ->
      """WITH p AS (
        |  SELECT event_id, user_id, CAST(CAST(ts AS DATE) AS VARCHAR) AS day,
        |    epoch_us(ts) AS ts_us
        |  FROM events WHERE event_type = 'purchase'
        |), v AS (
        |  SELECT user_id, CAST(CAST(ts AS DATE) AS VARCHAR) AS day,
        |    epoch_us(ts) AS v_ts_us, min(event_id) AS v_id
        |  FROM events WHERE event_type = 'view' GROUP BY 1, 2, 3
        |)
        |SELECT p.event_id, p.user_id, p.day, p.ts_us, v.v_ts_us, v.v_id
        |FROM p ASOF LEFT JOIN v
        |  ON p.user_id = v.user_id AND p.day = v.day AND p.ts_us >= v.v_ts_us""".stripMargin,
    // trailing-window interval join: clicks within each purchase's
    // trailing 30 minutes, same user — the exact bounds intervalJoin
    // declares (inclusive both ends)
    "q175_interval_join" ->
      """WITH c AS (
        |  SELECT user_id, event_id AS click_id, ts AS c_ts
        |  FROM events WHERE event_type = 'click'
        |), p AS (
        |  SELECT user_id, event_id AS p_id, ts AS p_ts
        |  FROM events WHERE event_type = 'purchase'
        |)
        |SELECT c.user_id, click_id, epoch_us(c_ts) AS c_us,
        |  p_id, epoch_us(p_ts) AS p_us
        |FROM c JOIN p ON c.user_id = p.user_id
        |  AND c.c_ts >= p.p_ts - INTERVAL 30 MINUTE
        |  AND c.c_ts <= p.p_ts""".stripMargin,

    "q174_range_sql_multikey" ->
      """WITH v AS (
        |  SELECT event_id AS view_id, user_id,
        |    CAST(CAST(ts AS DATE) AS VARCHAR) AS day, epoch_us(ts) AS v_us
        |  FROM events WHERE event_type = 'view'
        |), p AS (
        |  SELECT event_id AS p_id, user_id,
        |    CAST(CAST(ts AS DATE) AS VARCHAR) AS day,
        |    epoch_us(ts) AS start_us, epoch_us(ts) + 7200000000 AS end_us
        |  FROM events WHERE event_type = 'purchase'
        |)
        |SELECT v.user_id, v.day, view_id, v_us, p_id, start_us, end_us
        |FROM v JOIN p ON v.user_id = p.user_id AND v.day = p.day
        |  AND v.v_us BETWEEN p.start_us AND p.end_us""".stripMargin,

    // plain sequential recurrence (batch-mode state fn sees each key's
    // full history in one sorted pass), ordered by (ms, event_id) — the
    // streaming operator's Timestamp state folds at millisecond
    // granularity with the tie id breaking sub-ms ties
    // same recurrence and ordering as q172 — the batch-degenerate path
    // of the r14 ordered-mode smoother computes the identical fold
    "q176_ewma_ordered" ->
      """WITH RECURSIVE ev AS (
        |  SELECT user_id, event_id, value,
        |    row_number() OVER (PARTITION BY user_id
        |      ORDER BY epoch_us(ts) // 1000, event_id) AS rn
        |  FROM events
        |), rec(user_id, event_id, value, rn, ewma) AS (
        |  SELECT user_id, event_id, value, rn, value FROM ev WHERE rn = 1
        |  UNION ALL
        |  SELECT ev.user_id, ev.event_id, ev.value, ev.rn,
        |    CASE WHEN ev.value IS NULL THEN rec.ewma
        |         WHEN rec.ewma IS NULL THEN ev.value
        |         ELSE 0.25 * ev.value + 0.75 * rec.ewma END
        |  FROM rec JOIN ev ON ev.user_id = rec.user_id AND ev.rn = rec.rn + 1
        |)
        |SELECT user_id, event_id, value, ewma
        |FROM rec""".stripMargin,

    "q172_ewma_stream" ->
      """WITH RECURSIVE ev AS (
        |  SELECT user_id, event_id, value,
        |    row_number() OVER (PARTITION BY user_id
        |      ORDER BY epoch_us(ts) // 1000, event_id) AS rn
        |  FROM events
        |), rec(user_id, event_id, value, rn, ewma) AS (
        |  SELECT user_id, event_id, value, rn, value FROM ev WHERE rn = 1
        |  UNION ALL
        |  SELECT ev.user_id, ev.event_id, ev.value, ev.rn,
        |    CASE WHEN ev.value IS NULL THEN rec.ewma
        |         WHEN rec.ewma IS NULL THEN ev.value
        |         ELSE 0.25 * ev.value + 0.75 * rec.ewma END
        |  FROM rec JOIN ev ON ev.user_id = rec.user_id AND ev.rn = rec.rn + 1
        |)
        |SELECT user_id, event_id, value, ewma
        |FROM rec""".stripMargin,

    // q178: the q127 segmented replay run for BOTH smoothers (x and x²)
    // in ONE shared recursion — same span/bucket/rn frame, six summary
    // columns instead of three — then the same lag/count window scoring
    // the engine computes: v = q − m² clamped at 0 via CASE (NOT
    // greatest: Spark's greatest skips nulls, DuckDB's doesn't — CASE
    // propagates null identically), z gated on non-null value, a prior
    // mean, >= 2 prior non-null observations, and strictly positive
    // prior variance. No rounding — every double is bit-pinned.
    "q178_anomaly" ->
      """WITH RECURSIVE base AS (
        |  SELECT user_id, event_id, value, value * value AS v2,
        |    epoch_us(ts) AS o
        |  FROM events
        |), span AS (
        |  SELECT user_id, min(o) AS omin, max(o) AS omax,
        |    least(1024, (count(*) + 8191) // 8192) AS bk
        |  FROM base GROUP BY 1
        |), evr AS (
        |  SELECT b.user_id, b.event_id, b.value, b.v2, b.o,
        |    ((b.o - s.omin) // ((s.omax - s.omin + s.bk) // s.bk)) AS bkt,
        |    row_number() OVER (
        |      PARTITION BY b.user_id,
        |        ((b.o - s.omin) // ((s.omax - s.omin + s.bk) // s.bk))
        |      ORDER BY b.o, b.event_id) AS rn
        |  FROM base b JOIN span s USING (user_id)
        |), summ(user_id, bkt, rn, a1, b1, s1, a2, b2, s2) AS (
        |  SELECT user_id, bkt, rn,
        |    CASE WHEN value IS NULL THEN CAST(0.0 AS DOUBLE)
        |         ELSE 0.25 * value + 0.75 * CAST(0.0 AS DOUBLE) END,
        |    CASE WHEN value IS NULL THEN CAST(1.0 AS DOUBLE)
        |         ELSE 0.75 * CAST(1.0 AS DOUBLE) END,
        |    value,
        |    CASE WHEN v2 IS NULL THEN CAST(0.0 AS DOUBLE)
        |         ELSE 0.25 * v2 + 0.75 * CAST(0.0 AS DOUBLE) END,
        |    CASE WHEN v2 IS NULL THEN CAST(1.0 AS DOUBLE)
        |         ELSE 0.75 * CAST(1.0 AS DOUBLE) END,
        |    v2
        |  FROM evr WHERE rn = 1
        |  UNION ALL
        |  SELECT e.user_id, e.bkt, e.rn,
        |    CASE WHEN e.value IS NULL THEN summ.a1
        |         ELSE 0.25 * e.value + 0.75 * summ.a1 END,
        |    CASE WHEN e.value IS NULL THEN summ.b1 ELSE 0.75 * summ.b1 END,
        |    CASE WHEN e.value IS NULL THEN summ.s1
        |         WHEN summ.s1 IS NULL THEN e.value
        |         ELSE 0.25 * e.value + 0.75 * summ.s1 END,
        |    CASE WHEN e.v2 IS NULL THEN summ.a2
        |         ELSE 0.25 * e.v2 + 0.75 * summ.a2 END,
        |    CASE WHEN e.v2 IS NULL THEN summ.b2 ELSE 0.75 * summ.b2 END,
        |    CASE WHEN e.v2 IS NULL THEN summ.s2
        |         WHEN summ.s2 IS NULL THEN e.v2
        |         ELSE 0.25 * e.v2 + 0.75 * summ.s2 END
        |  FROM summ JOIN evr e ON e.user_id = summ.user_id
        |    AND e.bkt = summ.bkt AND e.rn = summ.rn + 1
        |), segf AS (
        |  SELECT user_id, bkt, a1, b1, s1, a2, b2, s2,
        |    row_number() OVER (PARTITION BY user_id ORDER BY bkt) AS sn
        |  FROM (SELECT *, row_number() OVER (PARTITION BY user_id, bkt
        |                                     ORDER BY rn DESC) AS rr
        |        FROM summ)
        |  WHERE rr = 1
        |), carry(user_id, bkt, sn, cin1, prev1, cin2, prev2) AS (
        |  SELECT user_id, bkt, sn, CAST(NULL AS DOUBLE), s1,
        |    CAST(NULL AS DOUBLE), s2
        |  FROM segf WHERE sn = 1
        |  UNION ALL
        |  SELECT s.user_id, s.bkt, s.sn, carry.prev1,
        |    CASE WHEN carry.prev1 IS NULL THEN s.s1
        |         ELSE s.b1 * carry.prev1 + s.a1 END,
        |    carry.prev2,
        |    CASE WHEN carry.prev2 IS NULL THEN s.s2
        |         ELSE s.b2 * carry.prev2 + s.a2 END
        |  FROM carry JOIN segf s ON s.user_id = carry.user_id
        |    AND s.sn = carry.sn + 1
        |), rec(user_id, event_id, value, bkt, rn, m, q) AS (
        |  SELECT e.user_id, e.event_id, e.value, e.bkt, e.rn,
        |    CASE WHEN e.value IS NULL THEN c.cin1
        |         WHEN c.cin1 IS NULL THEN e.value
        |         ELSE 0.25 * e.value + 0.75 * c.cin1 END,
        |    CASE WHEN e.v2 IS NULL THEN c.cin2
        |         WHEN c.cin2 IS NULL THEN e.v2
        |         ELSE 0.25 * e.v2 + 0.75 * c.cin2 END
        |  FROM evr e JOIN carry c ON c.user_id = e.user_id AND c.bkt = e.bkt
        |  WHERE e.rn = 1
        |  UNION ALL
        |  SELECT e.user_id, e.event_id, e.value, e.bkt, e.rn,
        |    CASE WHEN e.value IS NULL THEN rec.m
        |         WHEN rec.m IS NULL THEN e.value
        |         ELSE 0.25 * e.value + 0.75 * rec.m END,
        |    CASE WHEN e.v2 IS NULL THEN rec.q
        |         WHEN rec.q IS NULL THEN e.v2
        |         ELSE 0.25 * e.v2 + 0.75 * rec.q END
        |  FROM rec JOIN evr e ON e.user_id = rec.user_id
        |    AND e.bkt = rec.bkt AND e.rn = rec.rn + 1
        |), scored AS (
        |  SELECT user_id, event_id, value, m, q,
        |    lag(m) OVER w AS mp,
        |    lag(q) OVER w AS qp,
        |    count(value) OVER (PARTITION BY user_id ORDER BY bkt, rn
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS np
        |  FROM rec
        |  WINDOW w AS (PARTITION BY user_id ORDER BY bkt, rn)
        |), final AS (
        |  SELECT user_id, event_id, value, m AS mean,
        |    CASE WHEN (q - m * m) < 0 THEN 0.0 ELSE q - m * m END AS variance,
        |    CASE WHEN value IS NOT NULL AND mp IS NOT NULL AND np >= 2
        |           AND (CASE WHEN (qp - mp * mp) < 0 THEN 0.0
        |                     ELSE qp - mp * mp END) > 0
        |         THEN (value - mp) /
        |           sqrt(CASE WHEN (qp - mp * mp) < 0 THEN 0.0
        |                     ELSE qp - mp * mp END)
        |    END AS z
        |  FROM scored
        |)
        |SELECT user_id, event_id, value, mean, variance, z,
        |  CASE WHEN z IS NOT NULL AND abs(z) > 3.0 THEN 1 ELSE 0 END
        |    AS is_anomaly
        |FROM final""".stripMargin,

    // q181: the q176-style sequential replay (keys are single-segment at
    // test SFs, where the segmented plan IS the sequential fold) at the
    // stream's MILLISECOND granularity, carrying the (m, q) pair, then
    // the same window scoring as q178
    "q181_anomaly_stream" ->
      """WITH RECURSIVE ev AS (
        |  SELECT user_id, event_id, value, value * value AS v2,
        |    row_number() OVER (PARTITION BY user_id
        |      ORDER BY epoch_us(ts) // 1000, event_id) AS rn
        |  FROM events
        |), rec(user_id, event_id, value, rn, m, q) AS (
        |  SELECT user_id, event_id, value, rn, value, v2 FROM ev WHERE rn = 1
        |  UNION ALL
        |  SELECT ev.user_id, ev.event_id, ev.value, ev.rn,
        |    CASE WHEN ev.value IS NULL THEN rec.m
        |         WHEN rec.m IS NULL THEN ev.value
        |         ELSE 0.25 * ev.value + 0.75 * rec.m END,
        |    CASE WHEN ev.v2 IS NULL THEN rec.q
        |         WHEN rec.q IS NULL THEN ev.v2
        |         ELSE 0.25 * ev.v2 + 0.75 * rec.q END
        |  FROM rec JOIN ev ON ev.user_id = rec.user_id
        |    AND ev.rn = rec.rn + 1
        |), scored AS (
        |  SELECT user_id, event_id, value, m, q,
        |    lag(m) OVER w AS mp,
        |    lag(q) OVER w AS qp,
        |    count(value) OVER (PARTITION BY user_id ORDER BY rn
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS np
        |  FROM rec
        |  WINDOW w AS (PARTITION BY user_id ORDER BY rn)
        |), final AS (
        |  SELECT user_id, event_id, value, m AS mean,
        |    CASE WHEN (q - m * m) < 0 THEN 0.0 ELSE q - m * m END AS variance,
        |    CASE WHEN value IS NOT NULL AND mp IS NOT NULL AND np >= 2
        |           AND (CASE WHEN (qp - mp * mp) < 0 THEN 0.0
        |                     ELSE qp - mp * mp END) > 0
        |         THEN (value - mp) /
        |           sqrt(CASE WHEN (qp - mp * mp) < 0 THEN 0.0
        |                     ELSE qp - mp * mp END)
        |    END AS z
        |  FROM scored
        |)
        |SELECT user_id, event_id, value, mean, variance, z,
        |  CASE WHEN z IS NOT NULL AND abs(z) > 3.0 THEN 1 ELSE 0 END
        |    AS is_anomaly
        |FROM final""".stripMargin,

    "q79_rolling_features" ->
      """WITH ev AS (
        |  SELECT event_id, user_id, epoch_us(ts) AS ts_us, value FROM events
        |)
        |SELECT event_id, user_id, ts_us, value,
        |  round(lag(value, 1) OVER w, 6) AS lag1,
        |  round(value - lag(value, 1) OVER w, 6) AS delta,
        |  CAST(count(value) OVER t AS BIGINT) AS roll_n,
        |  round(avg(value) OVER t, 6) AS roll_mean,
        |  round(min(value) OVER t, 6) AS roll_min,
        |  round(max(value) OVER t, 6) AS roll_max,
        |  round(sum(value) OVER t, 6) AS roll_sum
        |FROM ev
        |WINDOW
        |  w AS (PARTITION BY user_id ORDER BY ts_us, event_id),
        |  t AS (PARTITION BY user_id ORDER BY ts_us, event_id
        |        ROWS BETWEEN 5 PRECEDING AND 1 PRECEDING)""".stripMargin,
    "q90_paths" ->
      """WITH s AS (
        |  SELECT event_type AS e1,
        |    lead(event_type, 1) OVER w AS e2,
        |    lead(event_type, 2) OVER w AS e3
        |  FROM events
        |  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
        |)
        |SELECT e1, e2, e3, count(*) AS n FROM s
        |WHERE e2 IS NOT NULL AND e3 IS NOT NULL
        |GROUP BY 1, 2, 3
        |ORDER BY n DESC, e1, e2, e3
        |LIMIT 20""".stripMargin,
    // terminal observation per day replayed with a (ts, event_id) DESC
    // rank; grid via generate_series; LOCF via last_value IGNORE NULLS
    "q130_resample_locf" ->
      """WITH e AS (
        |  SELECT user_id, epoch_us(ts) AS ts_us, value, event_id
        |  FROM events WHERE value IS NOT NULL
        |), t AS (
        |  SELECT user_id, ts_us // 86400000000 AS tick, value,
        |    row_number() OVER (PARTITION BY user_id, ts_us // 86400000000
        |                       ORDER BY ts_us DESC, event_id DESC) AS rn
        |  FROM e
        |), term AS (SELECT user_id, tick, value FROM t WHERE rn = 1),
        |span AS (
        |  SELECT user_id, min(tick) AS t0, max(tick) AS t1 FROM term GROUP BY 1
        |), grid AS (
        |  SELECT user_id, unnest(generate_series(t0, t1)) AS tick FROM span
        |), f AS (
        |  SELECT g.user_id, g.tick,
        |    last_value(term.value IGNORE NULLS) OVER (
        |      PARTITION BY g.user_id ORDER BY g.tick
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS value
        |  FROM grid g
        |  LEFT JOIN term ON g.user_id = term.user_id AND g.tick = term.tick
        |)
        |SELECT user_id, tick, round(value, 6) AS value FROM f""".stripMargin,
    // nearest = reconcile DuckDB's two native ASOF directions row-wise
    // with the same gap/tolerance/tie rules as the operator
    "q134_asof_nearest" ->
      """WITH e AS (
        |  SELECT user_id, epoch_us(ts) AS ts_us, event_id, event_type
        |  FROM events
        |), l AS (
        |  SELECT user_id, ts_us, event_id FROM e WHERE event_type = 'click'
        |), r AS (
        |  SELECT user_id, ts_us AS r_ts, min(event_id) AS r_id
        |  FROM e WHERE event_type = 'purchase' GROUP BY 1, 2
        |), b AS (
        |  SELECT l.user_id, l.event_id, l.ts_us, r.r_ts AS b_ts, r.r_id AS b_id
        |  FROM l ASOF LEFT JOIN r
        |    ON l.user_id = r.user_id AND l.ts_us >= r.r_ts
        |), f AS (
        |  SELECT l.user_id, l.event_id, l.ts_us, r.r_ts AS f_ts, r.r_id AS f_id
        |  FROM l ASOF LEFT JOIN r
        |    ON l.user_id = r.user_id AND l.ts_us <= r.r_ts
        |), m AS (
        |  SELECT b.user_id, b.event_id, b.ts_us,
        |    (b_ts IS NOT NULL AND b.ts_us - b_ts <= 21600000000) AS ok_b,
        |    (f_ts IS NOT NULL AND f_ts - b.ts_us <= 21600000000) AS ok_f,
        |    b.ts_us - b_ts AS gap_b, f_ts - b.ts_us AS gap_f,
        |    b_ts, b_id, f_ts, f_id
        |  FROM b JOIN f USING (user_id, event_id, ts_us)
        |)
        |SELECT user_id, event_id, ts_us,
        |  CASE WHEN ok_b AND (NOT ok_f OR gap_b <= gap_f) THEN b_id
        |       WHEN ok_f THEN f_id END AS r_id,
        |  CASE WHEN ok_b AND (NOT ok_f OR gap_b <= gap_f) THEN b_ts
        |       WHEN ok_f THEN f_ts END AS r_ts
        |FROM m""".stripMargin,
    // identical gaps-and-islands window replay; touching intervals merge
    // (strict > in the new-island test)
    "q135_interval_coverage" ->
      """WITH iv AS (
        |  SELECT user_id, epoch_us(ts) AS s, epoch_us(ts) + 1800000000 AS e
        |  FROM events
        |), m AS (
        |  SELECT user_id, s, e,
        |    max(e) OVER (PARTITION BY user_id ORDER BY s, e
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS pm
        |  FROM iv
        |), fl AS (
        |  SELECT user_id, s, e,
        |    CASE WHEN pm IS NULL OR s > pm THEN 1 ELSE 0 END AS nw
        |  FROM m
        |), isl AS (
        |  SELECT user_id, s, e,
        |    sum(nw) OVER (PARTITION BY user_id ORDER BY s, e
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS island
        |  FROM fl
        |), seg AS (
        |  SELECT user_id, island, min(s) AS i_s, max(e) AS i_e
        |  FROM isl GROUP BY 1, 2
        |)
        |SELECT user_id, CAST(sum(i_e - i_s) AS BIGINT) AS covered,
        |  count(*) AS n_islands,
        |  min(i_s) AS first_start, max(i_e) AS last_end
        |FROM seg GROUP BY 1""".stripMargin,
    // identical closed-form OLS arithmetic from the same 5 sums
    "q148_trend" ->
      """WITH ev AS (
        |  SELECT user_id, epoch_us(ts) // 86400000000 AS day, value
        |  FROM events WHERE value IS NOT NULL
        |), d0 AS (SELECT user_id, min(day) AS d0 FROM ev GROUP BY 1),
        |xy AS (
        |  SELECT ev.user_id, CAST(day - d0 AS DOUBLE) AS x, value AS y
        |  FROM ev JOIN d0 USING (user_id)
        |), agg AS (
        |  SELECT user_id, CAST(count(*) AS DOUBLE) AS n,
        |    sum(x) AS sx, sum(y) AS sy,
        |    sum(x * x) AS sxx, sum(x * y) AS sxy
        |  FROM xy GROUP BY 1
        |)
        |SELECT user_id, CAST(n AS BIGINT) AS n,
        |  round((n * sxy - sx * sy) / (n * sxx - sx * sx), 6) AS slope
        |FROM agg WHERE n * sxx - sx * sx > 0""".stripMargin,
    // DuckDB's native ASOF gives the backward match; the tolerance and
    // the unattributed bucket replay in the CASE
    "q159_attribution" ->
      """WITH e AS (
        |  SELECT user_id, epoch_us(ts) AS ts_us, event_id, event_type, value
        |  FROM events
        |), p AS (
        |  SELECT user_id, ts_us, value FROM e WHERE event_type = 'purchase'
        |), c AS (
        |  SELECT user_id, ts_us AS c_ts, min(event_id) AS c_id
        |  FROM e WHERE event_type = 'click' GROUP BY 1, 2
        |), j AS (
        |  SELECT p.user_id, p.ts_us, p.value, c.c_ts
        |  FROM p ASOF LEFT JOIN c
        |    ON p.user_id = c.user_id AND p.ts_us >= c.c_ts
        |)
        |SELECT CASE WHEN c_ts IS NOT NULL AND ts_us - c_ts <= 86400000000
        |         THEN c_ts // 86400000000 ELSE -1 END AS attr_day,
        |  count(*) AS n_purchases,
        |  round(sum(coalesce(value, 0.0)), 6) AS revenue
        |FROM j GROUP BY 1""".stripMargin,
    // q186: same md5 coin per (event_id, replicate), the Poisson(1)
    // thresholds as the SAME integer literals (Bootstrap.PoissonThresholds
    // — never recomputed via exp/factorial, which drifts a ulp across
    // libms), replicate means, quantile_cont percentile interval
    "q186_bootstrap_ci" -> {
      val wTerms = graft.stats.Bootstrap.PoissonThresholds
        .map(t => s"(CASE WHEN u >= $t THEN 1 ELSE 0 END)").mkString(" + ")
      s"""WITH ev AS (
        |  SELECT event_type, event_id, CAST(value AS DOUBLE) AS x
        |  FROM events WHERE value IS NOT NULL
        |), reps AS (SELECT CAST(r AS INT) AS r FROM range(0, 32) t(r)),
        |wu AS (
        |  SELECT event_type, x, r,
        |    ('0x' || substring(md5('boot:' || event_id || '|' || r), 1, 8))::BIGINT AS u
        |  FROM ev CROSS JOIN reps
        |), wts AS (
        |  SELECT event_type, x, r, $wTerms AS w
        |  FROM wu
        |), m AS (
        |  SELECT event_type, r, sum(w * x) / CAST(sum(w) AS DOUBLE) AS mr
        |  FROM wts GROUP BY 1, 2 HAVING sum(w) > 0
        |), pt AS (
        |  SELECT event_type, count(*) AS n,
        |    sum(x) / CAST(count(*) AS DOUBLE) AS mean
        |  FROM ev GROUP BY 1
        |), ci AS (
        |  SELECT event_type, quantile_cont(mr, 0.025) AS lo,
        |    quantile_cont(mr, 0.975) AS hi
        |  FROM m GROUP BY 1
        |)
        |SELECT pt.event_type, pt.n, round(pt.mean, 6) AS mean,
        |  round(ci.lo, 6) AS ci_lo, round(ci.hi, 6) AS ci_hi
        |FROM pt LEFT JOIN ci USING (event_type)""".stripMargin
    },

    // q190: same md5 coin per (rid, replicate), same Poisson thresholds;
    // both sums reweighted by the one per-row weight, ratio per replicate,
    // quantile_cont percentile interval
    "q190_bootstrap_ratio" -> {
      val wTerms = graft.stats.Bootstrap.PoissonThresholds
        .map(t => s"(CASE WHEN u >= $t THEN 1 ELSE 0 END)").mkString(" + ")
      s"""WITH li AS (
        |  SELECT l_returnflag AS g,
        |    l_extendedprice * (1.0 - l_discount) AS p,
        |    CAST(l_quantity AS DOUBLE) AS q,
        |    CAST(l_orderkey AS VARCHAR) || ':' || CAST(l_linenumber AS VARCHAR) AS rid
        |  FROM lineitem
        |), reps AS (SELECT CAST(r AS INT) AS r FROM range(0, 32) t(r)),
        |wu AS (
        |  SELECT g, p, q, r,
        |    ('0x' || substring(md5('boot:' || rid || '|' || r), 1, 8))::BIGINT AS u
        |  FROM li CROSS JOIN reps
        |), wts AS (
        |  SELECT g, p, q, r, $wTerms AS w
        |  FROM wu
        |), m AS (
        |  SELECT g, r, sum(w * p) / sum(w * q) AS rr
        |  FROM wts GROUP BY 1, 2 HAVING sum(w * q) <> 0
        |), pt AS (
        |  SELECT g, count(*) AS n, sum(p) / sum(q) AS ratio FROM li GROUP BY 1
        |), ci AS (
        |  SELECT g, quantile_cont(rr, 0.025) AS lo,
        |    quantile_cont(rr, 0.975) AS hi
        |  FROM m GROUP BY 1
        |)
        |SELECT pt.g AS l_returnflag, pt.n, round(pt.ratio, 6) AS ratio,
        |  round(ci.lo, 6) AS ci_lo, round(ci.hi, 6) AS ci_hi
        |FROM pt LEFT JOIN ci USING (g)""".stripMargin
    },

    // q192: no replay needed — the engine's answer is exact, so the
    // oracle is the reference implementation itself (quantile_disc is
    // the same ceil(q·n) type-1 convention, pinned empirically)
    "q192_exact_quantiles" ->
      """WITH v AS (SELECT l_extendedprice AS x FROM lineitem)
        |SELECT CAST(0.5 AS DOUBLE) AS q, quantile_disc(x, 0.5) AS value FROM v
        |UNION ALL SELECT CAST(0.9 AS DOUBLE), quantile_disc(x, 0.9) FROM v
        |UNION ALL SELECT CAST(0.99 AS DOUBLE), quantile_disc(x, 0.99) FROM v
        |UNION ALL SELECT CAST(0.999 AS DOUBLE), quantile_disc(x, 0.999) FROM v""".stripMargin,

    // same md5 coin, margins, and 2x2 chi2 formula
    "q160_ab_test" ->
      """WITH u AS (SELECT DISTINCT user_id FROM events),
        |ua AS (
        |  SELECT user_id,
        |    CASE WHEN ('0x' || substring(md5('ab:' || CAST(user_id AS VARCHAR)), 1, 8))::BIGINT
        |           % 2 = 0
        |      THEN 'A' ELSE 'B' END AS arm
        |  FROM u
        |), cv AS (
        |  SELECT DISTINCT user_id FROM events
        |  WHERE event_type = 'purchase' AND value >= 150.0
        |), cells AS (
        |  SELECT arm, count(*) AS n,
        |    sum(CASE WHEN cv.user_id IS NOT NULL THEN 1 ELSE 0 END) AS n_conv
        |  FROM ua LEFT JOIN cv ON ua.user_id = cv.user_id
        |  GROUP BY 1
        |), tot AS (
        |  SELECT CAST(sum(n) AS DOUBLE) AS tn, CAST(sum(n_conv) AS DOUBLE) AS tc
        |  FROM cells
        |), terms AS (
        |  SELECT arm, n, n_conv,
        |    CAST(n AS DOUBLE) * tc / tn AS e1,
        |    CAST(n AS DOUBLE) * (tn - tc) / tn AS e0
        |  FROM cells, tot
        |), chi AS (
        |  SELECT round(sum((n_conv - e1) * (n_conv - e1) / e1
        |    + ((n - n_conv) - e0) * ((n - n_conv) - e0) / e0), 6) AS chi2
        |  FROM terms
        |)
        |SELECT arm, n, CAST(n_conv AS BIGINT) AS n_conv,
        |  round(CAST(n_conv AS DOUBLE) / n, 9) AS conv_rate,
        |  (SELECT chi2 FROM chi) AS chi2
        |FROM terms""".stripMargin,
    "q158_weekday_profile" ->
      """WITH e AS (
        |  SELECT CAST((epoch_us(ts) // 86400000000 + 4) % 7 AS INT) AS dow,
        |    value
        |  FROM events
        |), tot AS (SELECT CAST(count(*) AS DOUBLE) AS tot FROM e)
        |SELECT dow, count(*) AS n,
        |  round(avg(value), 6) AS avg_value,
        |  round(CAST(count(*) AS DOUBLE) / tot, 9) AS share
        |FROM e, tot GROUP BY dow, tot""".stripMargin,
    // identical per-day means, lag self-join, and Pearson sums
    "q156_acf" ->
      """WITH series AS (
        |  SELECT epoch_us(ts) // 86400000000 AS day, avg(value) AS m
        |  FROM events WHERE value IS NOT NULL GROUP BY 1
        |), lags AS (SELECT unnest(range(0, 8)) AS lag),
        |pairs AS (
        |  SELECT l.lag, a.m AS ma, b.m AS mb
        |  FROM series a CROSS JOIN lags l
        |  JOIN series b ON b.day = a.day + l.lag
        |), agg AS (
        |  SELECT lag, CAST(count(*) AS DOUBLE) AS n,
        |    sum(ma) AS sa, sum(mb) AS sb,
        |    sum(ma * ma) AS saa, sum(mb * mb) AS sbb,
        |    sum(ma * mb) AS sab
        |  FROM pairs GROUP BY 1
        |)
        |SELECT lag, CAST(n AS BIGINT) AS n,
        |  round((n * sab - sa * sb) / sqrt((n * saa - sa * sa)
        |    * (n * sbb - sb * sb)), 6) AS acf
        |FROM agg""".stripMargin,
    // identical pairwise slopes + interpolated median
    "q154_theilsen" ->
      """WITH ev AS (
        |  SELECT user_id, CAST(epoch_us(ts) // 86400000000 AS DOUBLE) AS x,
        |    value AS y
        |  FROM events WHERE value IS NOT NULL
        |), s AS (
        |  SELECT a.user_id, (b.y - a.y) / (b.x - a.x) AS slope
        |  FROM ev a JOIN ev b ON a.user_id = b.user_id AND a.x < b.x
        |)
        |SELECT user_id, count(*) AS n_pairs,
        |  round(quantile_cont(slope, 0.5), 6) AS ts_slope
        |FROM s GROUP BY 1""".stripMargin,
    // same midranks from an ordered-window cumulative
    "q151_mannwhitney" ->
      """WITH ev AS (
        |  SELECT event_type, value FROM events
        |  WHERE value IS NOT NULL AND event_type IN ('click', 'view')
        |), byv AS (
        |  SELECT value,
        |    sum(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END) AS c1,
        |    sum(CASE WHEN event_type = 'view' THEN 1 ELSE 0 END) AS c2,
        |    count(*) AS cnt
        |  FROM ev GROUP BY 1
        |), r AS (
        |  SELECT value, c1, c2,
        |    CAST(coalesce(sum(cnt) OVER (ORDER BY value
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS DOUBLE)
        |      + CAST(cnt + 1 AS DOUBLE) / 2.0 AS midrank
        |  FROM byv
        |), agg AS (
        |  SELECT CAST(sum(c1) AS DOUBLE) AS n1, CAST(sum(c2) AS DOUBLE) AS n2,
        |    sum(CAST(c1 AS DOUBLE) * midrank) AS r1
        |  FROM r
        |)
        |SELECT r1 - n1 * (n1 + 1.0) / 2.0 AS u1,
        |  CAST(n1 AS BIGINT) AS n1, CAST(n2 AS BIGINT) AS n2,
        |  round(2.0 * (r1 - n1 * (n1 + 1.0) / 2.0)
        |    / (CAST(n1 AS BIGINT) * CAST(n2 AS BIGINT)) - 1.0, 6)
        |    AS rank_biserial
        |FROM agg""".stripMargin,
    // identical midrank construction + closed-form Pearson on the ranks
    "q152_spearman" ->
      """WITH ev AS (
        |  SELECT epoch_us(ts) // 86400000000 AS day, value
        |  FROM events WHERE value IS NOT NULL
        |), bd AS (SELECT day, count(*) AS cnt FROM ev GROUP BY 1),
        |rd AS (
        |  SELECT day,
        |    CAST(coalesce(sum(cnt) OVER (ORDER BY day
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS DOUBLE)
        |      + CAST(cnt + 1 AS DOUBLE) / 2.0 AS r_day
        |  FROM bd
        |), bv AS (SELECT value, count(*) AS cnt FROM ev GROUP BY 1),
        |rv AS (
        |  SELECT value,
        |    CAST(coalesce(sum(cnt) OVER (ORDER BY value
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS DOUBLE)
        |      + CAST(cnt + 1 AS DOUBLE) / 2.0 AS r_value
        |  FROM bv
        |), ranked AS (
        |  SELECT r_day, r_value FROM ev JOIN rd USING (day) JOIN rv USING (value)
        |), agg AS (
        |  SELECT CAST(count(*) AS DOUBLE) AS n,
        |    sum(r_day) AS sx, sum(r_value) AS sy,
        |    sum(r_day * r_day) AS sxx, sum(r_value * r_value) AS syy,
        |    sum(r_day * r_value) AS sxy
        |  FROM ranked
        |)
        |SELECT CAST(n AS BIGINT) AS n,
        |  round((n * sxy - sx * sy) / sqrt((n * sxx - sx * sx)
        |    * (n * syy - sy * sy)), 6) AS rho
        |FROM agg""".stripMargin,
    // the oracle may use the single ordered window the Spark side avoids
    "q150_ks_test" ->
      """WITH ev AS (
        |  SELECT event_type, value FROM events
        |  WHERE value IS NOT NULL AND event_type IN ('click', 'view')
        |), byv AS (
        |  SELECT value,
        |    sum(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END) AS c1,
        |    sum(CASE WHEN event_type = 'view' THEN 1 ELSE 0 END) AS c2
        |  FROM ev GROUP BY 1
        |), cum AS (
        |  SELECT value,
        |    CAST(sum(c1) OVER (ORDER BY value) AS DOUBLE) AS f1,
        |    CAST(sum(c2) OVER (ORDER BY value) AS DOUBLE) AS f2
        |  FROM byv
        |), tot AS (
        |  SELECT CAST(sum(c1) AS DOUBLE) AS n1, CAST(sum(c2) AS DOUBLE) AS n2
        |  FROM byv
        |), d AS (
        |  SELECT value, abs(f1 / n1 - f2 / n2) AS dv FROM cum, tot
        |)
        |SELECT dv AS d_stat, value AS at_value,
        |  (SELECT CAST(n1 AS BIGINT) FROM tot) AS n1,
        |  (SELECT CAST(n2 AS BIGINT) FROM tot) AS n2
        |FROM d ORDER BY dv DESC, value DESC LIMIT 1""".stripMargin,
    // the product-limit estimator replayed with correlated subqueries
    // over the tiny distinct-time frame (same exp-of-summed-logs form)
    "q147_survival" ->
      """WITH days AS (
        |  SELECT user_id, epoch_us(ts) // 86400000000 AS day FROM events
        |), span AS (
        |  SELECT user_id, min(day) AS d0, max(day) AS d1 FROM days GROUP BY 1
        |), h AS (SELECT max(day) AS h FROM days),
        |subj AS (
        |  SELECT d1 - d0 AS t, (d1 < h - 2) AS e FROM span, h
        |), byt AS (
        |  SELECT t, sum(CASE WHEN e THEN 1 ELSE 0 END) AS d,
        |    count(*) AS leave
        |  FROM subj GROUP BY 1
        |), tot AS (SELECT count(*) AS n FROM subj),
        |risk AS (
        |  SELECT b.t, b.d,
        |    n - coalesce((SELECT sum(leave) FROM byt x WHERE x.t < b.t), 0)
        |      AS n_risk
        |  FROM byt b, tot WHERE b.d > 0
        |), terms AS (
        |  SELECT t,
        |    CASE WHEN d < n_risk
        |      THEN ln(1.0 - CAST(d AS DOUBLE) / CAST(n_risk AS DOUBLE))
        |      ELSE 0.0 END AS lg,
        |    CASE WHEN d = n_risk THEN 1 ELSE 0 END AS z
        |  FROM risk
        |)
        |SELECT r.t, CAST(r.n_risk AS BIGINT) AS n_risk,
        |  CAST(r.d AS BIGINT) AS d,
        |  round(CASE
        |    WHEN (SELECT max(z) FROM terms WHERE terms.t <= r.t) = 1 THEN 0.0
        |    ELSE exp((SELECT sum(lg) FROM terms WHERE terms.t <= r.t))
        |    END, 6) AS survival
        |FROM risk r""".stripMargin,
    // q57's sequential-matching CTE chain reused; deltas are integer µs,
    // so avg is exact and quantile_cont matches Spark's percentile
    "q142_funnel_latency" ->
      """WITH e AS (
        |  SELECT user_id, event_type, epoch_us(ts) AS tu FROM events
        |), s0 AS (
        |  SELECT user_id, min(CASE WHEN event_type = 'signup' THEN tu END) AS t0
        |  FROM e GROUP BY 1 HAVING t0 IS NOT NULL
        |), s1 AS (
        |  SELECT e.user_id, min(t0) AS t0,
        |    min(CASE WHEN event_type = 'view' AND tu > t0 THEN tu END) AS t1
        |  FROM e JOIN s0 USING (user_id) GROUP BY e.user_id
        |), s2 AS (
        |  SELECT e.user_id, min(t0) AS t0, min(t1) AS t1,
        |    min(CASE WHEN event_type = 'click' AND tu > t1 THEN tu END) AS t2
        |  FROM e JOIN s1 USING (user_id) GROUP BY e.user_id
        |), s3 AS (
        |  SELECT e.user_id, min(t0) AS t0, min(t1) AS t1, min(t2) AS t2,
        |    min(CASE WHEN event_type = 'purchase' AND tu > t2 THEN tu END) AS t3
        |  FROM e JOIN s2 USING (user_id) GROUP BY e.user_id
        |), d AS (
        |  SELECT 'signup_to_view' AS step, t1 - t0 AS delta FROM s3
        |  WHERE t1 IS NOT NULL
        |  UNION ALL
        |  SELECT 'view_to_click', t2 - t1 FROM s3 WHERE t2 IS NOT NULL
        |  UNION ALL
        |  SELECT 'click_to_purchase', t3 - t2 FROM s3 WHERE t3 IS NOT NULL
        |)
        |SELECT step, count(*) AS n,
        |  round(quantile_cont(delta, 0.5), 6) AS p50,
        |  round(quantile_cont(delta, 0.9), 6) AS p90,
        |  round(avg(delta), 6) AS avg_delta
        |FROM d GROUP BY step""".stripMargin,
    // every window's CMS buckets recomputed DIRECTLY from the rows (q74
    // bucket scheme); empty probe buckets coalesce to 0
    "q155_sliding_cms" ->
      """WITH e AS (
        |  SELECT epoch_us(ts) // 86400000000 AS day,
        |    CAST(user_id AS VARCHAR) AS u
        |  FROM events
        |), dd AS (SELECT DISTINCT day FROM e),
        |wins AS (
        |  SELECT DISTINCT day + o AS win FROM dd, range(0, 7) t(o)
        |  WHERE day + o <= (SELECT max(day) FROM dd)
        |), nd AS (
        |  SELECT w.win, count(*) AS n_days
        |  FROM wins w JOIN dd ON dd.day BETWEEN w.win - 6 AND w.win
        |  GROUP BY 1
        |), wd AS (
        |  SELECT w.win, e.u FROM wins w
        |  JOIN e ON e.day BETWEEN w.win - 6 AND w.win
        |), b AS (
        |  SELECT win, j,
        |    ('0x' || substr(md5(j::VARCHAR || ':' || u), 1, 14))::BIGINT % 1024
        |      AS bkt,
        |    count(*) AS c
        |  FROM wd CROSS JOIN range(0, 4) t(j) GROUP BY 1, 2, 3
        |), probes AS (
        |  SELECT unnest([15, 30, 45, 60, 75, 90, 105, 120, 135, 150])
        |    AS probe_user
        |), q AS (
        |  SELECT w2.win, probes.probe_user, r.j,
        |    ('0x' || substr(md5(r.j::VARCHAR || ':'
        |      || CAST(probe_user AS VARCHAR)), 1, 14))::BIGINT % 1024 AS pb
        |  FROM wins w2, probes, range(0, 4) r(j)
        |), est AS (
        |  SELECT q.win, q.probe_user, min(coalesce(b.c, 0)) AS est
        |  FROM q LEFT JOIN b
        |    ON b.win = q.win AND b.j = q.j AND b.bkt = q.pb
        |  GROUP BY 1, 2
        |)
        |SELECT est.win AS day, nd.n_days,
        |  CAST(probe_user AS BIGINT) AS probe_user,
        |  CAST(est AS BIGINT) AS est_events
        |FROM est JOIN nd ON nd.win = est.win""".stripMargin,
    // every window's HLL registers recomputed DIRECTLY from the rows
    // (same md5 register/rho scheme as the q122 replay) — equality with
    // the Spark side's merged day sketches pins the rollup identity
    "q137_sliding_distinct" ->
      """WITH e AS (
        |  SELECT epoch_us(ts) // 86400000000 AS day,
        |    CAST(user_id AS VARCHAR) AS u
        |  FROM events
        |), du AS (SELECT DISTINCT day, u FROM e),
        |wins AS (
        |  SELECT DISTINCT day + o AS win FROM du, range(0, 7) t(o)
        |  WHERE day + o <= (SELECT max(day) FROM du)
        |), wd AS (
        |  SELECT w.win, du.day, du.u
        |  FROM wins w JOIN du ON du.day BETWEEN w.win - 6 AND w.win
        |), nd AS (
        |  SELECT win, count(DISTINCT day) AS n_days FROM wd GROUP BY 1
        |), hd AS (
        |  SELECT DISTINCT win, ('0x' || substr(md5(u), 1, 14))::BIGINT AS hv
        |  FROM wd
        |), rr AS (
        |  SELECT win, hv >> 46 AS reg,
        |    CASE WHEN (hv & ((1::BIGINT << 46) - 1)) = 0 THEN 47
        |         ELSE 47 - length(format('{:b}', hv & ((1::BIGINT << 46) - 1)))
        |         END AS rho
        |  FROM hd
        |), regs AS (
        |  SELECT win, reg, max(rho) AS mj FROM rr GROUP BY 1, 2
        |), st AS (
        |  SELECT win,
        |    sum(pow(2.0, -mj)) + (1024 - count(*)) AS harm,
        |    1024 - count(*) AS zero_regs
        |  FROM regs GROUP BY 1
        |)
        |SELECT st.win AS day, nd.n_days,
        |  round(CASE WHEN 0.7213 / (1.0 + 1.079 / 1024) * 1024 * 1024 / harm
        |              <= 2560.0 AND zero_regs > 0
        |    THEN 1024.0 * ln(1024.0 / zero_regs)
        |    ELSE 0.7213 / (1.0 + 1.079 / 1024) * 1024 * 1024 / harm
        |    END, 6) AS est_users
        |FROM st JOIN nd USING (win)""".stripMargin,

    // q196: identical moment algebra — per-arm sums, pooled theta/x-bar
    // from re-summing the arm rows, centered sums written EXACTLY as the
    // operator computes them (syy - sy*sy/n, not n*syy - sy*sy)
    "q196_cuped" ->
      """WITH ev AS (
        |  SELECT user_id, ts, value FROM events WHERE value IS NOT NULL
        |), units AS (
        |  SELECT user_id,
        |    sum(CASE WHEN ts < TIMESTAMP '2024-01-15' THEN value ELSE 0.0 END) AS x,
        |    sum(CASE WHEN ts >= TIMESTAMP '2024-01-15' THEN value ELSE 0.0 END) AS y,
        |    CASE WHEN ('0x' || substring(md5('ab:' || user_id), 1, 8))::BIGINT % 2 = 0
        |      THEN 'A' ELSE 'B' END AS variant
        |  FROM ev GROUP BY user_id
        |), arms AS (
        |  SELECT variant, count(*) AS n, sum(x) AS sx, sum(y) AS sy,
        |    sum(x * y) AS sxy, sum(x * x) AS sxx, sum(y * y) AS syy
        |  FROM units GROUP BY 1
        |), gmom AS (
        |  SELECT CASE WHEN gsxx - gsx * gsx / gn <> 0.0
        |           THEN (gsxy - gsx * gsy / gn) / (gsxx - gsx * gsx / gn)
        |           ELSE 0.0 END AS theta,
        |         gsx / gn AS xbar
        |  FROM (SELECT CAST(sum(n) AS DOUBLE) AS gn, sum(sx) AS gsx,
        |               sum(sy) AS gsy, sum(sxy) AS gsxy, sum(sxx) AS gsxx
        |        FROM arms)
        |), c AS (
        |  SELECT variant, n, CAST(n AS DOUBLE) AS nd, sx, sy, theta, xbar,
        |    syy - sy * sy / CAST(n AS DOUBLE) AS cyy,
        |    sxy - sx * sy / CAST(n AS DOUBLE) AS cxy,
        |    sxx - sx * sx / CAST(n AS DOUBLE) AS cxx
        |  FROM arms, gmom
        |)
        |SELECT variant, n,
        |  round(sy / nd, 6) AS mean_y,
        |  round((sy - theta * (sx - nd * xbar)) / nd, 6) AS mean_y_cuped,
        |  round(CASE WHEN n > 1 THEN cyy / (nd - 1) END, 4) AS var_y,
        |  round(CASE WHEN n > 1 THEN
        |    (cyy - 2.0 * theta * cxy + theta * theta * cxx) / (nd - 1) END, 4)
        |    AS var_y_cuped,
        |  round(theta, 9) AS theta
        |FROM c""".stripMargin,

    // q198: same md5 bucket coin, same leave-one-out fold — variance
    // written EXACTLY as the operator computes it ((B-1)/B * (s2 -
    // s1*s1/B)), clamped at zero before the sqrt
    "q198_jackknife" ->
      """WITH ev AS (
        |  SELECT event_type, user_id, value FROM events WHERE value IS NOT NULL
        |), b AS (
        |  SELECT event_type,
        |    ('0x' || substring(md5('jk:' || user_id), 1, 8))::BIGINT % 20 AS bkt,
        |    sum(value) AS bn, sum(1.0) AS bd
        |  FROM ev GROUP BY 1, 2
        |), t AS (
        |  SELECT event_type, sum(bn) AS tn, sum(bd) AS td, count(*) AS nb
        |  FROM b GROUP BY 1
        |), loo AS (
        |  SELECT b.event_type, (tn - bn) / (td - bd) AS theta_i, tn, td, nb
        |  FROM b JOIN t USING (event_type)
        |), agg AS (
        |  SELECT event_type, first(tn / td) AS theta, first(nb) AS n_buckets,
        |    sum(theta_i) AS s1, sum(theta_i * theta_i) AS s2
        |  FROM loo GROUP BY 1
        |), v AS (
        |  SELECT event_type, theta, n_buckets, CAST(n_buckets AS DOUBLE) AS bd2,
        |    (CAST(n_buckets AS DOUBLE) - 1) / CAST(n_buckets AS DOUBLE)
        |      * (s2 - s1 * s1 / CAST(n_buckets AS DOUBLE)) AS var_jack
        |  FROM agg
        |), se AS (
        |  SELECT event_type, theta, n_buckets,
        |    sqrt(greatest(var_jack, 0.0)) AS se_jack
        |  FROM v
        |)
        |SELECT event_type, round(theta, 6) AS theta,
        |  round(se_jack, 9) AS se_jack,
        |  round(theta - 1.959963984540054 * se_jack, 6) AS ci_lo,
        |  round(theta + 1.959963984540054 * se_jack, 6) AS ci_hi,
        |  n_buckets
        |FROM se""".stripMargin,

    // q199: ground-truth trailing window per observed day — the oracle
    // states the SPEC (count distinct users over day-6..day) rather than
    // replaying the fan-out, the strongest oracle form. Integer-only.
    "q199_sliding_distinct_exact" ->
      """WITH p AS (
        |  SELECT DISTINCT epoch_us(ts) // 86400000000 AS day, user_id
        |  FROM events
        |), d AS (SELECT DISTINCT day FROM p)
        |SELECT d.day AS day, count(DISTINCT p.user_id) AS n_active
        |FROM d JOIN p ON p.day BETWEEN d.day - 6 AND d.day
        |GROUP BY 1""".stripMargin,

    // q200: the minimax characterization, NOT a PAV replay — prefix sums
    // over the pooled distinct-x sequence, the O(n^2) (j,k) mean grid,
    // suffix-min along k per j, max per i. Agreement is a theorem
    // (Robertson-Wright-Dykstra), so a PAV implementation bug that still
    // produces a monotone fit would hash-mismatch here.
    "q200_isotonic" ->
      """WITH pts AS (
        |  SELECT round(value / 500.0, 3) AS x,
        |         CASE WHEN event_type = 'purchase' THEN 1.0 ELSE 0.0 END AS y
        |  FROM events WHERE value IS NOT NULL
        |), pooled AS (
        |  SELECT x, sum(y) AS sy, CAST(count(*) AS DOUBLE) AS w
        |  FROM pts GROUP BY 1
        |), ord AS (
        |  SELECT x, sy, w, row_number() OVER (ORDER BY x) AS rn FROM pooled
        |), c AS (
        |  SELECT rn, x, w,
        |    sum(sy) OVER (ORDER BY rn) AS csy,
        |    sum(w) OVER (ORDER BY rn) AS cw
        |  FROM ord
        |), grid AS (
        |  SELECT j.rn AS jn, k.rn AS kn,
        |    (k.csy - coalesce(jp.csy, 0.0)) / (k.cw - coalesce(jp.cw, 0.0)) AS m
        |  FROM c k JOIN c j ON j.rn <= k.rn
        |  LEFT JOIN c jp ON jp.rn = j.rn - 1
        |), sm AS (
        |  SELECT jn, kn, min(m) OVER (PARTITION BY jn ORDER BY kn DESC) AS smin
        |  FROM grid
        |), f AS (
        |  SELECT kn AS rn, max(smin) AS fitted FROM sm GROUP BY 1
        |)
        |SELECT o.x, round(f.fitted, 9) AS fitted, CAST(o.w AS BIGINT) AS w
        |FROM f JOIN ord o USING (rn)""".stripMargin,

    // q204: identical basket derivation and count ratios (ratios of
    // exact integers -> bit-identical divisions)
    "q204_basket_lift" ->
      """WITH b AS (
        |  SELECT DISTINCT user_id AS u, epoch_us(ts) // 86400000000 AS day,
        |         event_type AS et
        |  FROM events
        |), pairs AS (
        |  SELECT a.et AS et_a, b2.et AS et_b, count(*) AS n_ab
        |  FROM b a JOIN b b2 ON a.u = b2.u AND a.day = b2.day AND a.et < b2.et
        |  GROUP BY 1, 2
        |), singles AS (
        |  SELECT et, count(*) AS n1 FROM b GROUP BY 1
        |), nbt AS (
        |  SELECT count(*) AS nb FROM (SELECT DISTINCT u, day FROM b)
        |)
        |SELECT et_a, et_b, n_ab,
        |  round(CAST(n_ab AS DOUBLE) / nb, 6) AS support,
        |  round(CAST(n_ab AS DOUBLE) * nb / (sa.n1 * sb.n1), 6) AS lift,
        |  round(CAST(n_ab AS DOUBLE) / sa.n1, 6) AS conf_ab,
        |  round(CAST(n_ab AS DOUBLE) / sb.n1, 6) AS conf_ba
        |FROM pairs
        |JOIN singles sa ON sa.et = et_a
        |JOIN singles sb ON sb.et = et_b
        |CROSS JOIN nbt""".stripMargin,

    // q205: same ordered-fold windows (whole-partition sums under an
    // ORDER BY fold the sorted sequence in both engines), same 1e-6
    // pre-argmax rounding, earliest-day tie via the QUALIFY ordering
    "q205_changepoint" ->
      """WITH daily AS (
        |  SELECT event_type, epoch_us(ts) // 86400000000 AS day,
        |         round(sum(value), 6) AS x
        |  FROM events WHERE value IS NOT NULL GROUP BY 1, 2
        |), w AS (
        |  SELECT event_type, day, x,
        |    sum(x) OVER (PARTITION BY event_type ORDER BY day
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING) AS tot,
        |    count(*) OVER (PARTITION BY event_type) AS n,
        |    sum(x) OVER (PARTITION BY event_type ORDER BY day
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS pre,
        |    row_number() OVER (PARTITION BY event_type ORDER BY day) AS rn
        |  FROM daily
        |), s AS (
        |  SELECT event_type, day, rn, n,
        |    round(abs(pre - rn * (tot / n)), 6) AS st
        |  FROM w
        |)
        |SELECT event_type, day AS t_star, st AS cusum_max, CAST(n AS BIGINT) AS n
        |FROM s
        |QUALIFY row_number() OVER (PARTITION BY event_type
        |  ORDER BY st DESC, rn ASC) = 1""".stripMargin,

    // q208: plain row_number over the same (metric, user) total orders —
    // identical to the two-phase rank by construction; same integer
    // quintile formula
    "q208_rfm" ->
      """WITH base AS (
        |  SELECT user_id, epoch_us(ts) // 86400000000 AS day, value FROM events
        |), gmax AS (SELECT max(day) AS gmax FROM base),
        |u AS (
        |  SELECT user_id, max(day) AS umax, count(*) AS f,
        |         round(sum(coalesce(value, 0.0)), 6) AS m
        |  FROM base GROUP BY 1
        |), ur AS (
        |  SELECT user_id, gmax - umax AS r, f, m FROM u, gmax
        |), rk AS (
        |  SELECT user_id, r, f, m,
        |    row_number() OVER (ORDER BY r ASC, user_id) AS r_rnk,
        |    row_number() OVER (ORDER BY f DESC, user_id) AS f_rnk,
        |    row_number() OVER (ORDER BY m DESC, user_id) AS m_rnk
        |  FROM ur
        |), nt AS (SELECT count(*) AS nu FROM u)
        |SELECT user_id, r AS recency, f AS freq, m AS monetary,
        |  CAST((r_rnk - 1) * 5 // nu AS INT) + 1 AS r_score,
        |  CAST((f_rnk - 1) * 5 // nu AS INT) + 1 AS f_score,
        |  CAST((m_rnk - 1) * 5 // nu AS INT) + 1 AS m_score,
        |  CAST((r_rnk - 1) * 5 // nu AS INT) + 1 ||
        |    CAST((f_rnk - 1) * 5 // nu AS INT) + 1 ||
        |    CAST((m_rnk - 1) * 5 // nu AS INT) + 1 AS segment
        |FROM rk, nt""".stripMargin
  )
}
